"""StyleGAN2 / StyleSDF building blocks (flax.linen).

Functional equivalents of reference `project/models/stylesdf_model.py:30-584`. Parameter
layouts follow torch conventions ([out, in] linears, [out, in, kh, kw] convs) so the
checkpoint-ingestion converter is a mechanical rename.

TPU-first departures from the reference:
  * `ModulatedConv2d` replaces the CUDA-idiomatic batch->groups reshape trick
    (stylesdf_model.py:328-360) with the mathematically identical input-scale /
    output-scale formulation: one large batched conv on the MXU, no grouped conv.
  * upfirdn2d resampling lowers to a single dilated XLA conv (see ops/upfirdn2d.py).
  * fused bias+lrelu is a plain expression XLA fuses (see ops/fused_act.py).
  * mixed precision: every layer computes in its INPUT dtype (params are f32
    masters cast at use; demodulation statistics stay f32). Casting activations to
    bfloat16 at a pipeline boundary (config `dtype`, consumed in generator.py /
    e3dge.py) therefore switches whole submodules to bf16 — halving HBM traffic on
    the 1024^2 conv pyramid — while f32 inputs reproduce the old numerics exactly.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from e3dge_tpu.ops import (
    blur,
    conv2d_up_fused,
    conv_transpose2x_blur_phased,
    fuse_fir_upsample,
    fused_leaky_relu,
    make_kernel,
    upsample2x,
)


def _kaiming_normal_torch(key, shape, dtype=jnp.float32, a=0.2, gain_mul=1.0):
    """torch.nn.init.kaiming_normal_(a, fan_in, leaky_relu) on [out, in] weights."""
    fan_in = shape[1]
    gain = math.sqrt(2.0 / (1.0 + a * a))
    std = gain / math.sqrt(fan_in) * gain_mul
    return std * jax.random.normal(key, shape, dtype)


def pixel_norm(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """x * rsqrt(mean(x^2)) (reference PixelNorm, dim=1 on [B, C] inputs)."""
    return x * jax.lax.rsqrt(jnp.mean(x * x, axis=axis, keepdims=True) + 1e-8)


def conv2d_torch(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    stride: int = 1,
    padding: int = 0,
    groups: int = 1,
) -> jnp.ndarray:
    """F.conv2d semantics: NCHW input, [out, in/groups, kh, kw] weight (correlation)."""
    return jax.lax.conv_general_dilated(
        x,
        jnp.transpose(weight, (2, 3, 1, 0)),  # -> HWIO
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        feature_group_count=groups,
    )


def conv_transpose2d_torch(x: jnp.ndarray, weight: jnp.ndarray, stride: int = 2) -> jnp.ndarray:
    """F.conv_transpose2d(stride, padding=0): weight layout [in, out, kh, kw].

    Lowered as an lhs-dilated convolution with the spatially-flipped kernel — the form
    XLA maps directly onto the MXU.
    """
    k = weight.shape[-1]
    w = jnp.flip(weight, (-2, -1))  # conv_transpose convolves (no flip) => flip for correlation
    w = jnp.transpose(w, (2, 3, 0, 1))  # [kh, kw, in, out] = HWIO
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding=((k - 1, k - 1), (k - 1, k - 1)),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
    )


class EqualLinear(nn.Module):
    """Equalized-lr linear (reference stylesdf_model.py:210-249)."""

    out_dim: int
    bias: bool = True
    bias_init: float = 0.0
    lr_mul: float = 1.0
    activation: bool = False  # fused_lrelu when True
    zero_init: bool = False   # constant_init(val=0, bias=0) modulation heads

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_dim = x.shape[-1]
        weight = self.param(
            "weight",
            (nn.initializers.zeros if self.zero_init
             else lambda key, shape: jax.random.normal(key, shape) / self.lr_mul),
            (self.out_dim, in_dim),
        )
        scale = (1.0 / math.sqrt(in_dim)) * self.lr_mul
        out = x @ (weight * scale).astype(x.dtype).T
        if self.bias:
            b = self.param("bias", nn.initializers.constant(self.bias_init), (self.out_dim,))
            b = (b * self.lr_mul).astype(x.dtype)
            if self.activation:
                out = fused_leaky_relu(out, b)
            else:
                out = out + b
        elif self.activation:
            out = fused_leaky_relu(out, None)
        return out


class MappingLinear(nn.Module):
    """Kaiming-init mapping layer with scale-1 fused lrelu (stylesdf_model.py:40-82)."""

    out_dim: int
    activation: bool = True
    is_last: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_dim = x.shape[-1]
        gain_mul = 0.25 if self.is_last else 1.0
        weight = self.param(
            "weight",
            lambda key, shape: _kaiming_normal_torch(key, shape, gain_mul=gain_mul),
            (self.out_dim, in_dim),
        )
        bound = math.sqrt(1.0 / in_dim)
        b = self.param(
            "bias", lambda key, shape: jax.random.uniform(key, shape, minval=-bound, maxval=bound), (self.out_dim,)
        )
        weight = weight.astype(x.dtype)
        b = b.astype(x.dtype)
        if self.activation:
            return fused_leaky_relu(x @ weight.T, b, scale=1.0)
        return x @ weight.T + b


class EqualConv2d(nn.Module):
    """Equalized-lr conv (stylesdf_model.py:168-207). NCHW."""

    out_channel: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_channel = x.shape[1]
        weight = self.param(
            "weight",
            nn.initializers.normal(stddev=1.0),
            (self.out_channel, in_channel, self.kernel_size, self.kernel_size),
        )
        scale = 1.0 / math.sqrt(in_channel * self.kernel_size**2)
        out = conv2d_torch(x, (weight * scale).astype(x.dtype), stride=self.stride, padding=self.padding)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channel,))
            out = out + b.astype(x.dtype).reshape(1, -1, 1, 1)
        return out


class ModulatedConv2d(nn.Module):
    """StyleGAN2 modulated conv (stylesdf_model.py:263-362), TPU formulation.

    Per-sample weight W_b = scale * W * s_b (input-channel style) with optional
    demodulation d_b = rsqrt(sum W_b^2). Since conv is linear in input channels and
    demod scales output channels, this equals:
        y_b = d_b * conv(x_b * s_b, scale * W)
    i.e. one shared-weight batched conv — no grouped conv, MXU-friendly at 1024^2.
    """

    out_channel: int
    kernel_size: int
    demodulate: bool = True
    upsample: bool = False
    downsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x: jnp.ndarray, style: jnp.ndarray, phase: str | None = None) -> jnp.ndarray:
        """phase: None = standard full-res path. Phase-space modes for the
        decoder's s2d tail (ops/space_to_depth.py — same params, half-res
        tensors at 4x channels, no depthwise-blur/layout-copy tax):
          'enter'  — upsample conv, full-res in -> PHASE-SPACE out (blur folded
                     into the phased conv_transpose kernel, no interleave);
          'inside' — 3x3 stride-1 conv, phase in -> phase out;
          'rgb'    — 1x1 conv (ToRGB), phase in -> phase out."""
        batch, in_channel, height, width = x.shape
        k = self.kernel_size
        if phase in ("inside", "rgb"):
            in_channel = in_channel // 4
        weight = self.param(
            "weight", nn.initializers.normal(stddev=1.0), (1, self.out_channel, in_channel, k, k)
        )
        scale = 1.0 / math.sqrt(in_channel * k * k)
        s = EqualLinear(in_channel, bias_init=1.0, name="modulation")(style)  # [B, in]

        w = scale * weight  # [1, out, in, k, k] (f32 master)
        if self.demodulate:
            # demod statistics in f32 regardless of compute dtype (sum of many squares)
            wmod = w * s.astype(jnp.float32)[:, None, :, None, None]
            demod = jax.lax.rsqrt(jnp.sum(wmod * wmod, axis=(2, 3, 4)) + 1e-8)  # [B, out]
            demod = demod.astype(x.dtype)
        s_in = s.astype(x.dtype)
        if phase in ("inside", "rgb"):
            s_in = jnp.tile(s_in, (1, 4))  # phase-major channel order
        x = x * s_in[:, :, None, None]
        w = w.astype(x.dtype)

        if phase is not None:
            from e3dge_tpu.ops.space_to_depth import (
                conv1x1_phase_kernel,
                conv3x3_phase_kernel,
                conv_transpose2x_blur_phase_kernel,
            )

            if phase == "enter":
                assert self.upsample and k == 3
                kern = conv_transpose2x_blur_phase_kernel(w[0], make_kernel(self.blur_kernel))
                out = jax.lax.conv_general_dilated(
                    x, kern.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NCHW", "HWIO", "NCHW"),
                )
            elif phase == "inside":
                assert k == 3 and not self.upsample and not self.downsample
                out = conv2d_torch(x, conv3x3_phase_kernel(w[0]).astype(x.dtype), padding=1)
            else:  # 'rgb'
                assert k == 1
                out = conv2d_torch(x, conv1x1_phase_kernel(w[0]).astype(x.dtype))
            if self.demodulate:
                out = out * jnp.tile(demod, (1, 4))[:, :, None, None]
            return out

        kernel = make_kernel(self.blur_kernel)
        if self.upsample:
            # conv_transpose + FIR blur, two passes. Two mathematically-equal
            # single-pass forms were built, golden-tested, and MEASURED SLOWER on
            # v5e: (a) the 6x6 lhs-dilated fused kernel (conv2d_up_fused, 2x
            # slower — Mosaic does not phase-decompose it) and (b) manual phase
            # decomposition into a 4*O-channel stride-1 conv + depth-to-space
            # (conv_transpose2x_blur_phased, +1.9 ms e2e — the interleave copy
            # costs more than the VPU blur it removes). Keep the two-pass form.
            w_t = jnp.transpose(w[0], (1, 0, 2, 3))
            out = conv_transpose2d_torch(x, w_t, stride=2)
            if self.demodulate:
                out = out * demod[:, :, None, None]
            p = (len(self.blur_kernel) - 2) - (k - 1)
            out = blur(out, kernel, pad=((p + 1) // 2 + 1, p // 2 + 1), upsample_factor=2)
        elif self.downsample:
            p = (len(self.blur_kernel) - 2) + (k - 1)
            x = blur(x, kernel, pad=((p + 1) // 2, p // 2))
            out = conv2d_torch(x, w[0], stride=2, padding=0)
            if self.demodulate:
                out = out * demod[:, :, None, None]
        else:
            out = conv2d_torch(x, w[0], stride=1, padding=k // 2)
            if self.demodulate:
                out = out * demod[:, :, None, None]
        return out


class NoiseInjection(nn.Module):
    """Per-layer scaled noise (stylesdf_model.py:365-466; the geometry-aware
    mesh-projected noise variant lives in render/noise_projection.py)."""

    @nn.compact
    def __call__(
        self, image: jnp.ndarray, noise: jnp.ndarray | None = None, phase_channels: int | None = None
    ) -> jnp.ndarray:
        w = self.param("weight", nn.initializers.zeros, (1,))
        if phase_channels is not None:
            # phase-space image (s2d tail): noise is drawn/split at FULL res so
            # values match the standard path under the same rng stream
            from e3dge_tpu.ops.space_to_depth import s2d_noise

            if noise is None:
                b, _, h, width = image.shape
                key = self.make_rng("noise")
                noise = jax.random.normal(key, (b, 1, 2 * h, 2 * width), image.dtype)
            return image + w.astype(image.dtype) * s2d_noise(noise.astype(image.dtype), phase_channels)
        if noise is None:
            b, _, h, width = image.shape
            key = self.make_rng("noise")
            noise = jax.random.normal(key, (b, 1, h, width), image.dtype)
        return image + w.astype(image.dtype) * noise.astype(image.dtype)


class StyledConv(nn.Module):
    """ModulatedConv2d + noise + fused lrelu (stylesdf_model.py:469-507)."""

    out_channel: int
    kernel_size: int
    upsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        style: jnp.ndarray,
        noise: jnp.ndarray | None = None,
        phase: str | None = None,
    ) -> jnp.ndarray:
        out = ModulatedConv2d(
            self.out_channel,
            self.kernel_size,
            upsample=self.upsample,
            blur_kernel=self.blur_kernel,
            name="conv",
        )(x, style, phase=phase)
        if phase is not None:
            out = NoiseInjection(name="noise")(out, noise, phase_channels=self.out_channel)
            bias = self.param("bias", nn.initializers.zeros, (1, self.out_channel, 1, 1))
            b_ph = jnp.tile(bias[0, :, 0, 0], (4,)).reshape(1, -1, 1, 1)
            return fused_leaky_relu(out + b_ph.astype(out.dtype), None)
        out = NoiseInjection(name="noise")(out, noise)
        bias = self.param("bias", nn.initializers.zeros, (1, self.out_channel, 1, 1))
        return fused_leaky_relu(out + bias.astype(out.dtype), None)


class ToRGB(nn.Module):
    """1x1 mod conv (no demod) + upsampled skip (stylesdf_model.py:510-541)."""

    upsample: bool = True
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    out_channels: int = 3

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        style: jnp.ndarray,
        skip: jnp.ndarray | None = None,
        phase: bool = False,
    ) -> jnp.ndarray:
        """phase=True (s2d tail): x is phase-space; `skip` is FULL-res at the
        previous level's resolution and is upsampled directly INTO phase space
        (no zero-inserted 2x tensor); returns the phase-space rgb skip."""
        if phase:
            from e3dge_tpu.ops.space_to_depth import upsample2x_phases

            out = ModulatedConv2d(self.out_channels, 1, demodulate=False, name="conv")(
                x, style, phase="rgb"
            )
            bias = self.param("bias", nn.initializers.zeros, (1, self.out_channels, 1, 1))
            b_ph = jnp.tile(bias[0, :, 0, 0], (4,)).reshape(1, -1, 1, 1)
            out = out + b_ph.astype(out.dtype)
            if skip is not None:
                assert self.upsample
                out = out + upsample2x_phases(skip, np.asarray(make_kernel(self.blur_kernel)))
            return out
        out = ModulatedConv2d(self.out_channels, 1, demodulate=False, name="conv")(x, style)
        bias = self.param("bias", nn.initializers.zeros, (1, self.out_channels, 1, 1))
        out = out + bias.astype(out.dtype)
        if skip is not None:
            if self.upsample:
                skip = upsample2x(skip, make_kernel(self.blur_kernel))
            out = out + skip
        return out


class ConvLayer(nn.Module):
    """Discriminator conv block: optional blur-downsample + equalized conv + fused
    lrelu (stylesdf_model.py:544-584)."""

    out_channel: int
    kernel_size: int
    downsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    use_bias: bool = True
    activate: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.downsample:
            p = (len(self.blur_kernel) - 2) + (self.kernel_size - 1)
            x = blur(x, make_kernel(self.blur_kernel), pad=((p + 1) // 2, p // 2))
            stride, padding = 2, 0
        else:
            stride, padding = 1, self.kernel_size // 2
        out = EqualConv2d(
            self.out_channel,
            self.kernel_size,
            stride=stride,
            padding=padding,
            use_bias=self.use_bias and not self.activate,
            name="conv",
        )(x)
        if self.activate:
            if self.use_bias:
                b = self.param("bias", nn.initializers.zeros, (self.out_channel,))
                out = fused_leaky_relu(out, b.astype(out.dtype))
            else:
                out = fused_leaky_relu(out, None)
        return out
