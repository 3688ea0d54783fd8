"""Stacked-hourglass image filter — the E1 local feature extractor.

Mirrors the reference vendored PIFu `ConvBlock` / `HourGlass` / `HGFilter`
(`project/vendor/pifu/lib/net_util.py:399-453`, `lib/model/HGFilters.py:6-188`) with
the E3DGE configuration: num_stack=4, hourglass depth 2, group-norm(32), ave_pool
downsampling, 256 feature channels, `hourglass_dim` output channels per stack.

Layout: the EXTERNAL interface is NCHW (torch convention, matches ingestion and
every caller), but everything INSIDE runs NHWC — the TPU conv-native layout.
The r5 cycle xprof showed the previous per-op transpose pairs (TorchConv and
GroupNorm each wrapped NCHW<->NHWC) were NOT cancelled by XLA across the
pad/elementwise seams: 30 ms/step of pure data formatting inside `local.filter`
at the 336 ms stage-2.2 stack. NHWC-internal keeps exactly two transposes per
filter call (entry/exit). Param trees are unchanged: `ConvNHWC` uses the same
inner `nn.Conv` name ("conv") as `TorchConv`, and GroupNorm params are
layout-free, so torch ckpt ingestion and existing flax ckpts are untouched.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from e3dge_tpu.ops import interpolate_bicubic_nhwc


class ConvNHWC(nn.Module):
    """Conv2d on NHWC tensors with the same param tree as fpn.TorchConv (the
    inner flax conv is named "conv", kernel layout HWIO) — drop-in for modules
    that keep their own layout transposes at the boundary."""

    out_ch: int
    kernel: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(
            self.out_ch,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            use_bias=self.use_bias,
            dtype=x.dtype,  # compute in the input dtype (f32 params cast at use)
            name="conv",
        )(x)


def _group_norm(channels: int, name: str, dtype=None):
    # torch GroupNorm(32, C); for tiny test configs fall back to fewer groups.
    # dtype = output/compute dtype (statistics stay f32 inside flax).
    groups = 32 if channels % 32 == 0 and channels >= 32 else min(4, channels)
    return nn.GroupNorm(num_groups=groups, epsilon=1e-5, dtype=dtype, name=name)


class ConvBlock(nn.Module):
    """PIFu residual conv block: three 3x3 convs producing out/2 + out/4 + out/4
    channels, concatenated, plus (1x1-projected) shortcut (net_util.py:399-453).
    NHWC in/out."""

    out_planes: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_planes = x.shape[-1]
        o2, o4 = self.out_planes // 2, self.out_planes // 4

        def gn(h, name):
            return _group_norm(h.shape[-1], name, dtype=h.dtype)(h)

        out1 = ConvNHWC(o2, 3, padding=1, use_bias=False, name="conv1")(jax.nn.relu(gn(x, "bn1")))
        out2 = ConvNHWC(o4, 3, padding=1, use_bias=False, name="conv2")(jax.nn.relu(gn(out1, "bn2")))
        out3 = ConvNHWC(o4, 3, padding=1, use_bias=False, name="conv3")(jax.nn.relu(gn(out2, "bn3")))
        out = jnp.concatenate([out1, out2, out3], axis=-1)

        if in_planes != self.out_planes:
            residual = ConvNHWC(self.out_planes, 1, use_bias=False, name="downsample_conv")(
                jax.nn.relu(gn(x, "bn4"))
            )
        else:
            residual = x
        return out + residual


def _avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


class HourGlass(nn.Module):
    """Recursive hourglass (HGFilters.py:6-67), depth levels of pool/upsample.
    NHWC in/out."""

    depth: int
    features: int = 256

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        def recurse(level: int, inp: jnp.ndarray) -> jnp.ndarray:
            up1 = ConvBlock(self.features, name=f"b1_{level}")(inp)
            low1 = _avg_pool2(inp)
            low1 = ConvBlock(self.features, name=f"b2_{level}")(low1)
            if level > 1:
                low2 = recurse(level - 1, low1)
            else:
                low2 = ConvBlock(self.features, name=f"b2_plus_{level}")(low1)
            low3 = ConvBlock(self.features, name=f"b3_{level}")(low2)
            # bicubic align_corners=True, exactly the reference upsample
            # (HGFilters.py:58-61) — same separable two-matmul form as bilinear.
            up2 = interpolate_bicubic_nhwc(
                low3, (low3.shape[1] * 2, low3.shape[2] * 2), align_corners=True
            )
            return up1 + up2

        return recurse(self.depth, x)


class HGFilter(nn.Module):
    """Stacked hourglass filter (HGFilters.py:70-188), ave_pool stem variant.

    NCHW external interface: takes [B, C, H, W], returns the LAST stack's feature
    map [B, hourglass_dim, H/4, W/4] (the reference keeps only the final output at
    inference, HGPIFuNet.py:88-96). Set `nhwc_io=True` to skip the boundary
    transposes when the caller already holds NHWC (LocalFeatureNet.filter does).
    """

    num_stack: int = 4
    num_hourglass: int = 2
    hourglass_dim: int = 256
    nhwc_io: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_all_stacks: bool = False, nhwc_io: bool | None = None):
        nhwc = self.nhwc_io if nhwc_io is None else nhwc_io
        if not nhwc:
            x = jnp.transpose(x, (0, 2, 3, 1))

        h = ConvNHWC(64, 7, stride=2, padding=3, name="conv1")(x)
        h = _group_norm(64, "bn1", dtype=h.dtype)(h)
        h = jax.nn.relu(h)
        h = ConvBlock(128, name="conv2")(h)
        h = _avg_pool2(h)
        h = ConvBlock(128, name="conv3")(h)
        h = ConvBlock(256, name="conv4")(h)

        previous = h
        outputs = []
        for i in range(self.num_stack):
            hg = HourGlass(self.num_hourglass, 256, name=f"m{i}")(previous)
            ll = ConvBlock(256, name=f"top_m_{i}")(hg)
            ll = ConvNHWC(256, 1, name=f"conv_last{i}")(ll)
            ll = jax.nn.relu(_group_norm(256, f"bn_end{i}", dtype=ll.dtype)(ll))
            tmp_out = ConvNHWC(self.hourglass_dim, 1, name=f"l{i}")(ll)
            outputs.append(tmp_out)
            if i < self.num_stack - 1:
                ll2 = ConvNHWC(256, 1, name=f"bl{i}")(ll)
                tmp_out_ = ConvNHWC(256, 1, name=f"al{i}")(tmp_out)
                previous = previous + ll2 + tmp_out_

        if not nhwc:
            outputs = [jnp.transpose(o, (0, 3, 1, 2)) for o in outputs]
        if return_all_stacks:
            return outputs
        return outputs[-1]
