"""Discriminators: volume-render D (with the viewpoint head doubling as the camera
pose estimator) and the full-resolution StyleGAN2 D.

Mirrors reference `project/models/stylesdf_model.py:1193-1617`.
"""

from __future__ import annotations

import math
import flax.linen as nn
import jax
import jax.numpy as jnp

from e3dge_tpu.models.encoders.fpn import TorchConv
from e3dge_tpu.models.layers import ConvLayer, EqualLinear
from e3dge_tpu.ops import fused_leaky_relu

VOLUME_D_CHANNELS = {2: 400, 4: 400, 8: 400, 16: 400, 32: 256, 64: 128, 128: 64}


def add_coords(x: jnp.ndarray) -> jnp.ndarray:
    """Concat normalized (y, x) coordinate channels (stylesdf_model.py:1238-1268)."""
    b, _, h, w = x.shape
    xx = jnp.linspace(-1.0, 1.0, w).reshape(1, 1, 1, w)
    yy = jnp.linspace(-1.0, 1.0, h).reshape(1, 1, h, 1)
    xx = jnp.broadcast_to(xx, (b, 1, h, w))
    yy = jnp.broadcast_to(yy, (b, 1, h, w))
    return jnp.concatenate([x, yy, xx], axis=1)


class VolumeDiscConv(nn.Module):
    """Plain conv + optional fused lrelu(scale=1) (stylesdf_model.py:1193-1235)."""

    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    activate: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = TorchConv(
            self.out_channels,
            self.kernel_size,
            stride=self.stride,
            padding=self.padding,
            use_bias=not self.activate,
            name="conv",
        )(x)
        if self.activate:
            in_ch = x.shape[1]
            bound = math.sqrt(1.0 / (in_ch * self.kernel_size**2))
            b = self.param(
                "act_bias",
                lambda key, shape: jax.random.uniform(key, shape, minval=-bound, maxval=bound),
                (self.out_channels,),
            )
            out = fused_leaky_relu(out, b, scale=1.0)
        return out


class CoordConvLayer(nn.Module):
    """CoordConv + fused lrelu(scale=1) (stylesdf_model.py:1302-1336)."""

    out_channel: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[1]
        padding = self.kernel_size // 2 if self.kernel_size > 2 else 0
        out = TorchConv(
            self.out_channel, self.kernel_size, padding=padding, use_bias=False, name="conv"
        )(add_coords(x))
        bound = math.sqrt(1.0 / (in_ch * self.kernel_size**2))
        b = self.param(
            "act_bias",
            lambda key, shape: jax.random.uniform(key, shape, minval=-bound, maxval=bound),
            (self.out_channel,),
        )
        return fused_leaky_relu(out, b, scale=1.0)


def avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    b, c, h, w = x.shape
    return x.reshape(b, c, h // 2, 2, w // 2, 2).mean(axis=(3, 5))


class VolumeRenderResBlock(nn.Module):
    """CoordConv resblock with avg-pool downsample (stylesdf_model.py:1339-1366)."""

    out_channel: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_channel = x.shape[1]
        out = CoordConvLayer(self.out_channel, name="conv1")(x)
        out = CoordConvLayer(self.out_channel, name="conv2")(out)
        out = avg_pool2(out)
        skip = avg_pool2(x)
        if self.out_channel != in_channel:
            skip = VolumeDiscConv(self.out_channel, 1, name="skip")(skip)
        return (out + skip) / math.sqrt(2.0)


class VolumeRenderDiscriminator(nn.Module):
    """Progressive CoordConv D over 64-res thumbs; dual heads: GAN logit + (azim,
    elev) regression — the viewpoint head is the pose estimator at inference
    (stylesdf_model.py:1369-1419, trainer.py:944-947)."""

    init_size: int = 64
    viewpoint_loss: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        channels = VOLUME_D_CHANNELS
        out = VolumeDiscConv(channels[self.init_size], 1, activate=True, name="convs_0")(x)
        log_size = int(math.log2(self.init_size))
        for n, i in enumerate(range(log_size - 1, 0, -1)):
            out = VolumeRenderResBlock(channels[2**i], name=f"convs_{n + 1}")(out)
        out = VolumeDiscConv(3 if self.viewpoint_loss else 1, 2, name="final_conv")(out)
        gan_preds = out[:, 0:1].reshape(-1, 1)
        viewpoints = out[:, 1:].reshape(-1, 2) if self.viewpoint_loss else None
        return gan_preds, viewpoints


class DiscResBlock(nn.Module):
    """StyleGAN2 D resblock (stylesdf_model.py:1514-1540)."""

    out_channel: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = ConvLayer(x.shape[1], 3, name="conv1")(x)
        out = ConvLayer(self.out_channel, 3, downsample=True, name="conv2")(out)
        skip = ConvLayer(self.out_channel, 1, downsample=True, use_bias=False, activate=False, name="skip")(x)
        return (out + skip) / math.sqrt(2.0)


class Discriminator(nn.Module):
    """Full-res StyleGAN2 D with minibatch stddev (stylesdf_model.py:1541-1617).

    `input_size` is the image resolution; `in_channels` 3, or 6 when the aligned
    residual is concatenated (reference --D_input_size / conditioned D options).
    """

    input_size: int = 1024
    channel_multiplier: int = 2
    channel_base: int = 512
    stddev_group: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cb, cm = self.channel_base, self.channel_multiplier
        channels = {
            4: cb, 8: cb, 16: cb, 32: cb,
            64: cb // 2 * cm, 128: cb // 4 * cm, 256: cb // 8 * cm,
            512: cb // 16 * cm, 1024: cb // 32 * cm,
        }
        log_size = int(math.log2(self.input_size))
        out = ConvLayer(channels[self.input_size], 1, name="convs_0")(x)
        for n, i in enumerate(range(log_size, 2, -1)):
            out = DiscResBlock(channels[2 ** (i - 1)], name=f"convs_{n + 1}")(out)

        # minibatch stddev (stylesdf_model.py:1598-1609)
        b, c, h, w = out.shape
        group = min(b, self.stddev_group)
        y = out.reshape(group, -1, 1, c, h, w)
        var = jnp.var(y, axis=0)
        stddev = jnp.sqrt(var + 1e-8)
        stddev = jnp.mean(stddev, axis=(2, 3, 4), keepdims=True).squeeze(2)
        stddev = jnp.tile(stddev, (group, 1, h, w))
        out = jnp.concatenate([out, stddev], axis=1)

        out = ConvLayer(channels[4], 3, name="final_conv")(out)
        out = out.reshape(b, -1)
        out = EqualLinear(channels[4], activation=True, name="final_linear_0")(out)
        out = EqualLinear(1, name="final_linear_1")(out)
        return out
