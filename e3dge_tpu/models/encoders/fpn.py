"""E0 — pSp-style FPN encoder over an IR-SE-50 backbone.

Mirrors the reference `HybridGradualStyleEncoder_V2`
(`project/models/encoders/fpn_encoders.py:266-432`) and its IR-SE building blocks
(`project/models/helper_modules/helpers.py:104-224`): taps c128@block2, c64@block6,
c32@block20, c16@block23, builds an FPN pyramid p32/p64/p128 via 1x1 lateral convs and
bilinear upsample-add, then predicts

  * 9 renderer W+ rows (first 6 "geo" from p32, last 3 "tex" from p32 or p64), 256-d
  * 10 decoder W+ rows from one GradualStyleBlock on p128 repeated (released
    `single_decoder_layer` config), 512-d

Outputs are *offsets* added to the mean latents by the runner (trainer.py:989-1015).

BatchNorm runs in the `batch_stats` collection; under a data-parallel mesh pass
`axis_name` so stats sync across replicas (replacing torch SyncBatchNorm).
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from e3dge_tpu.models.layers import EqualLinear
from e3dge_tpu.ops import interpolate_bilinear
from e3dge_tpu.utils.config import EncoderConfig


class BlockSpecIR(NamedTuple):
    in_channel: int
    depth: int
    stride: int


def get_blocks(num_layers: int) -> list[BlockSpecIR]:
    """IR-SE bottleneck layout (reference helpers.py:104-130), flattened."""
    table = {
        50: [(64, 64, 3), (64, 128, 4), (128, 256, 14), (256, 512, 3)],
        100: [(64, 64, 3), (64, 128, 13), (128, 256, 30), (256, 512, 3)],
        152: [(64, 64, 3), (64, 128, 8), (128, 256, 36), (256, 512, 3)],
    }
    blocks = []
    for in_ch, depth, num_units in table[num_layers]:
        blocks.append(BlockSpecIR(in_ch, depth, 2))
        blocks.extend(BlockSpecIR(depth, depth, 1) for _ in range(num_units - 1))
    return blocks


class PReLU(nn.Module):
    """Per-channel PReLU (torch init 0.25), channel axis 1 (NCHW)."""

    channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        a = self.param("alpha", nn.initializers.constant(0.25), (self.channels,))
        a = a.astype(x.dtype).reshape((1, -1) + (1,) * (x.ndim - 2))
        return jnp.where(x >= 0, x, a * x)


class TorchConv(nn.Module):
    """Conv2d on NCHW tensors (transposes around flax's NHWC conv)."""

    out_ch: int
    kernel: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = jnp.transpose(x, (0, 2, 3, 1))
        x = nn.Conv(
            self.out_ch,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            use_bias=self.use_bias,
            dtype=x.dtype,  # compute in the input dtype (f32 params cast at use)
            name="conv",
        )(x)
        return jnp.transpose(x, (0, 3, 1, 2))


class BatchNorm(nn.Module):
    """BatchNorm2d with cross-replica stat sync via axis_name. NCHW by default
    (transposes around flax's channels-last norm); `nhwc=True` skips the
    transposes for channels-last streams — params/stats are per-channel either
    way, so the flag never changes the checkpoint tree."""

    channels: int
    axis_name: str | None = None
    nhwc: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if not self.nhwc:
            x = jnp.transpose(x, (0, 2, 3, 1))
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            axis_name=self.axis_name if train else None,
            dtype=x.dtype,  # output dtype; statistics are still computed in f32
            name="bn",
        )(x)
        if not self.nhwc:
            x = jnp.transpose(x, (0, 3, 1, 2))
        return x


class SEModule(nn.Module):
    """Squeeze-and-excitation gate (helpers.py:133-160)."""

    channels: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = jnp.mean(x, axis=(2, 3), keepdims=True)  # [B, C, 1, 1]
        s = TorchConv(max(self.channels // self.reduction, 1), 1, use_bias=False, name="fc1")(s)
        s = jax.nn.relu(s)
        s = TorchConv(self.channels, 1, use_bias=False, name="fc2")(s)
        return x * jax.nn.sigmoid(s)


class BottleneckIRSE(nn.Module):
    """IR(-SE) residual unit (helpers.py:162-224)."""

    in_channel: int
    depth: int
    stride: int
    se: bool = True
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.in_channel == self.depth:
            # MaxPool2d(1, stride) == strided identity
            shortcut = x[:, :, :: self.stride, :: self.stride]
        else:
            shortcut = TorchConv(self.depth, 1, stride=self.stride, use_bias=False, name="shortcut_conv")(x)
            shortcut = BatchNorm(self.depth, self.axis_name, name="shortcut_bn")(shortcut, train)
        res = BatchNorm(self.in_channel, self.axis_name, name="bn1")(x, train)
        res = TorchConv(self.depth, 3, stride=1, padding=1, use_bias=False, name="conv1")(res)
        res = PReLU(self.depth, name="prelu")(res)
        res = TorchConv(self.depth, 3, stride=self.stride, padding=1, use_bias=False, name="conv2")(res)
        res = BatchNorm(self.depth, self.axis_name, name="bn2")(res, train)
        if self.se:
            res = SEModule(self.depth, name="se")(res)
        return res + shortcut


class GradualStyleBlock(nn.Module):
    """map2style: stride-2 convs to 1x1 + EqualLinear (helpers.py:472-497)."""

    out_c: int
    spatial: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import math

        num_pools = int(math.log2(self.spatial))
        for i in range(num_pools):
            x = TorchConv(self.out_c, 3, stride=2, padding=1, name=f"convs_{i}")(x)
            x = jnp.where(x >= 0, x, 0.01 * x)  # LeakyReLU default slope
        x = x.reshape(x.shape[0], self.out_c)
        return EqualLinear(self.out_c, name="linear")(x)


class HybridGradualStyleEncoderV2(nn.Module):
    """The released E0 (fpn_encoders.py:266-432)."""

    cfg: EncoderConfig
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False, return_featmap: bool = False):
        c = self.cfg
        # input stem: conv3x3 s1 + BN + PReLU (fpn_encoders.py:282-284)
        h = TorchConv(64, 3, stride=1, padding=1, use_bias=False, name="input_conv")(x)
        h = BatchNorm(64, self.axis_name, name="input_bn")(h, train)
        h = PReLU(64, name="input_prelu")(h)

        taps = {}
        for i, spec in enumerate(get_blocks(c.num_layers)):
            h = BottleneckIRSE(
                spec.in_channel,
                spec.depth,
                spec.stride,
                se=(c.mode == "ir_se"),
                axis_name=self.axis_name,
                name=f"body_{i}",
            )(h, train)
            if i == 2:
                taps["c128"] = h
            elif i == 6:
                taps["c64"] = h
            elif i == 20:
                taps["c32"] = h
            elif i == 23:
                taps["c16"] = h

        def upsample_add(a, b):
            return interpolate_bilinear(a, b.shape[2:], align_corners=True) + b

        # FPN pyramid (fpn_encoders.py:398-414). latlayer names follow the reference.
        p32 = upsample_add(taps["c16"], TorchConv(512, 1, name="latlayer256")(taps["c32"]))
        p64 = upsample_add(p32, TorchConv(512, 1, name="latlayer128")(taps["c64"]))

        latents = []
        for j in range(c.pigan_geo_layer):
            latents.append(
                GradualStyleBlock(c.style_dim, c.fpn_pigan_geo_layer_dim, name=f"styles_pigan_{j}")(p32)
            )
        for j in range(c.pigan_geo_layer, c.pigan_tex_layer):
            # tex styles read p64 ONLY when tex dim is literally 64 (reference
            # fpn_encoders.py:407 checks `== 64`); released tex dim is 128 -> p32
            src = p64 if c.fpn_pigan_tex_layer_dim == 64 else p32
            latents.append(
                GradualStyleBlock(c.style_dim, c.fpn_pigan_tex_layer_dim, name=f"styles_pigan_{j}")(src)
            )
        thumb_out = jnp.stack(latents, axis=1)  # [B, 9, 256]

        stylegan_out = None
        if c.full_pipeline:
            p128 = upsample_add(p64, TorchConv(512, 1, name="latlayer64")(taps["c128"]))
            # The reference V2 forward uses styles_stylegan[0] on p128 repeated
            # n_styles times REGARDLESS of single_decoder_layer (fpn_encoders.py:
            # 417-419 — when False, blocks 1..9 exist in the ckpt but are dead).
            # `single_decoder_layer` is therefore ckpt-layout only; the dead
            # blocks are dropped at ingestion (torch_ckpt ignores unused keys).
            s0 = GradualStyleBlock(c.decoder_style_dim, c.input_res // 2, name="styles_stylegan_0")(p128)
            stylegan_out = jnp.repeat(s0[:, None], c.n_styles_decoder, axis=1)

        if return_featmap:
            return {"pred_latents": [thumb_out, stylegan_out], "feat_maps": p64, "p32": p32}
        return [thumb_out, stylegan_out]
