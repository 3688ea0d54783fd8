"""Alignment & fusion modules for the E1 local branch.

  * ResnetBlockFC        — pixelNeRF FC resblock (reference helper_modules/resnetfc.py)
  * Fuse_sft_MLP         — CodeFormer-style SFT fusion of 2D-aligned and 3D-projected
                           features (reference helper_modules/sft.py:84-109)
  * ResidualAligner(ADA) — 2D alignment U-net: cat(residual, upsampled thumb) 6ch ->
                           enc 16/32/48/64 bottleneck_IR -> dec with skips -> 3ch
                           aligned residual (reference alignment_old.py:316-398)
  * FuseSftBlock / ConvResBlock — conv variant of the SFT fusion (sft.py:18-80)
  * DemodulatedConv2d    — style-free demodulated conv (helpers.py:14-80)
  * AlignInpainterFusionBlock — visibility-lerp fusion ablation
                           (alignment_old.py:455-496)
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from e3dge_tpu.models.encoders.fpn import BatchNorm, PReLU, TorchConv
from e3dge_tpu.ops import interpolate_bilinear


class ResnetBlockFC(nn.Module):
    """relu->fc0->relu->fc1 + (shortcut) (resnetfc.py:6-59).

    zero_init replicates the modulation-head init of the released local net
    (HGPIFuGANNetResidualInputResnetFC.py:89-93): everything zero so the block is an
    exact no-op producer at the start of training.
    """

    size_out: int
    size_h: int | None = None
    zero_init: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray | tuple[jnp.ndarray, ...]) -> jnp.ndarray:
        # A tuple input is treated as the (unmaterialized) concat of its parts:
        # the input matmuls split by weight columns, so callers can pass e.g.
        # (hourglass_feats, pos_encoding) without building the [..., 301] tensor
        # (XLA materializes that concat once per consumer — ~1.2 ms/img at full
        # scale). Parameter shapes/layout are unchanged (torch-ingestion safe).
        parts = x if isinstance(x, tuple) else (x,)
        size_in = sum(p.shape[-1] for p in parts)
        size_h = self.size_h or min(size_in, self.size_out)

        def kaiming(key, shape):
            fan_in = shape[1]
            std = jnp.sqrt(2.0 / fan_in)
            return std * jax.random.normal(key, shape)

        w0_init = nn.initializers.zeros if self.zero_init else kaiming
        # like every layer in models/layers.py, compute in the INPUT dtype
        # (f32 master params cast at use): the bf16 serving fusion path stays
        # bf16 end-to-end, f32 training inputs reproduce the old numerics
        dt = parts[0].dtype
        w0 = self.param("fc_0_weight", w0_init, (size_h, size_in)).astype(dt)
        b0 = self.param("fc_0_bias", nn.initializers.zeros, (size_h,)).astype(dt)
        w1 = self.param("fc_1_weight", nn.initializers.zeros, (self.size_out, size_h)).astype(dt)
        b1 = self.param("fc_1_bias", nn.initializers.zeros, (self.size_out,)).astype(dt)

        def split_matmul(w, pre=None):
            acc, col = None, 0
            for p in parts:
                d = p.shape[-1]
                q = (pre(p) if pre else p) @ w[:, col : col + d].T
                acc = q if acc is None else acc + q
                col += d
            return acc

        net = split_matmul(w0, pre=jax.nn.relu) + b0
        dx = jax.nn.relu(net) @ w1.T + b1

        if size_in == self.size_out:
            xs = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
        else:
            ws_init = nn.initializers.zeros if self.zero_init else kaiming
            ws = self.param("shortcut_weight", ws_init, (self.size_out, size_in)).astype(dt)
            xs = split_matmul(ws)
        return xs + dx


class FuseSftMLP(nn.Module):
    """SFT fusion: dec + w * (dec*scale(enc') + shift(enc')) where
    enc' = ResnetBlockFC(cat(enc, dec)) (sft.py:84-109). Operates on last-axis
    feature vectors (per 3D sample point)."""

    out_ch: int = 256

    @nn.compact
    def __call__(self, enc_feat: jnp.ndarray, dec_feat: jnp.ndarray, w: float = 1.0) -> jnp.ndarray:
        h = ResnetBlockFC(self.out_ch, name="encode_enc")(
            jnp.concatenate([enc_feat, dec_feat], axis=-1)
        )

        def mlp(x, name):
            # dtype follows the input (f32 master params cast at use)
            x = nn.Dense(self.out_ch, dtype=x.dtype, name=f"{name}_0")(x)
            x = jnp.where(x >= 0, x, 0.2 * x)
            return nn.Dense(self.out_ch, dtype=x.dtype, name=f"{name}_2")(x)

        scale = mlp(h, "scale")
        shift = mlp(h, "shift")
        return dec_feat + w * (dec_feat * scale + shift)


class BottleneckIRPlain(nn.Module):
    """bottleneck_IR without SE, norm selectable (helpers.py:162-198)."""

    depth: int
    stride: int
    norm: str = "batch"  # 'batch' | 'none'
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_channel = x.shape[1]

        def maybe_norm(h, name):
            if self.norm == "batch":
                return BatchNorm(h.shape[1], self.axis_name, name=name)(h, train)
            return h

        if in_channel == self.depth:
            shortcut = x[:, :, :: self.stride, :: self.stride]
        else:
            shortcut = TorchConv(self.depth, 1, stride=self.stride, use_bias=False, name="shortcut_conv")(x)
            shortcut = maybe_norm(shortcut, "shortcut_bn")
        res = maybe_norm(x, "bn1")
        res = TorchConv(self.depth, 3, stride=1, padding=1, use_bias=False, name="conv1")(res)
        res = PReLU(self.depth, name="prelu")(res)
        res = TorchConv(self.depth, 3, stride=self.stride, padding=1, use_bias=False, name="conv2")(res)
        res = maybe_norm(res, "bn2")
        return res + shortcut


class ResidualEncoder(nn.Module):
    """HFGI-style consultation encoder (alignment_old.py:402-452): encodes the
    aligned residual into 64-res (scale, shift) conditions injected into the decoder
    feature pyramid (Decoder condition hook, stylesdf_model.py:777-778)."""

    cond_channels: int = 512
    cond_res: int = 64
    norm: str = "batch"
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        from e3dge_tpu.models.layers import EqualConv2d
        from e3dge_tpu.ops import interpolate_bilinear, scaled_leaky_relu

        h = TorchConv(32, 3, padding=1, use_bias=False, name="conv_layer1_conv")(x)
        if self.norm == "batch":
            h = BatchNorm(32, self.axis_name, name="conv_layer1_bn")(h, train)
        h = PReLU(32, name="conv_layer1_prelu")(h)
        for i, (depth, stride) in enumerate([(48, 2), (48, 1), (48, 1)]):
            h = BottleneckIRPlain(depth, stride, self.norm, self.axis_name, name=f"conv_layer2_{i}")(h, train)
        for i, (depth, stride) in enumerate([(64, 2), (64, 1), (64, 1)]):
            h = BottleneckIRPlain(depth, stride, self.norm, self.axis_name, name=f"conv_layer3_{i}")(h, train)

        def head(name):
            s = EqualConv2d(self.cond_channels, 3, padding=1, name=f"{name}_0")(h)
            s = scaled_leaky_relu(s)
            s = EqualConv2d(self.cond_channels, 3, padding=1, name=f"{name}_2")(s)
            return interpolate_bilinear(s, (self.cond_res, self.cond_res), align_corners=False)

        return head("condition_scale3"), head("condition_shift3")


class ResidualAligner(nn.Module):
    """ADA — occlusion-aware 2D residual alignment U-net (alignment_old.py:316-398).

    Input: cat(res_gt 3ch, upsampled query thumb 3ch) at 256^2; output: 3ch aligned
    residual at the input resolution.
    """

    norm: str = "batch"
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        res = x.shape[-1]

        def stage(h, chans, name):
            for i, (depth, stride) in enumerate(chans):
                h = BottleneckIRPlain(depth, stride, self.norm, self.axis_name, name=f"{name}_{i}")(h, train)
            return h

        feat1 = TorchConv(16, 3, padding=1, use_bias=False, name="conv_layer1_conv")(x)
        if self.norm == "batch":
            feat1 = BatchNorm(16, self.axis_name, name="conv_layer1_bn")(feat1, train)
        feat1 = PReLU(16, name="conv_layer1_prelu")(feat1)

        feat2 = stage(feat1, [(32, 2), (32, 1), (32, 1)], "conv_layer2")
        feat3 = stage(feat2, [(48, 2), (48, 1), (48, 1)], "conv_layer3")
        feat4 = stage(feat3, [(64, 2), (64, 1), (64, 1)], "conv_layer4")

        # decoder with skip concats; sizes are input-relative (reference hardcodes
        # 64/128/256 for a 256 input)
        feat4 = interpolate_bilinear(feat4, (res // 4, res // 4), align_corners=False)
        dfea1 = stage(jnp.concatenate([feat4, feat3], 1), [(64, 1), (32, 1), (32, 1)], "dconv_layer1")
        dfea1 = interpolate_bilinear(dfea1, (res // 2, res // 2), align_corners=False)
        dfea2 = stage(jnp.concatenate([dfea1, feat2], 1), [(32, 1), (16, 1), (16, 1)], "dconv_layer2")
        dfea2 = interpolate_bilinear(dfea2, (res, res), align_corners=False)
        dfea3 = stage(jnp.concatenate([dfea2, feat1], 1), [(16, 1), (3, 1), (3, 1)], "dconv_layer3")
        return dfea3


def feature_l2_norm(feature: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Channel-wise L2 normalization (reference FeatureL2Norm,
    alignment_old.py:65-79; Rocco et al. cnngeometric)."""
    norm = jnp.sqrt(jnp.sum(feature**2, axis=1, keepdims=True) + eps)
    return feature / norm


def correlation_volume(feature_a: jnp.ndarray, feature_b: jnp.ndarray) -> jnp.ndarray:
    """Dense correlation volume (reference CorrelationVolume,
    alignment_old.py:43-63): [B,C,H,W] x [B,C,H,W] -> [B, H*W, H, W] where
    out[b, qA, i, j] = <feature_A[b,:,col-major qA], feature_B[b,:,i,j]>."""
    b, c, h, w = feature_a.shape
    fa = jnp.transpose(feature_a, (0, 1, 3, 2)).reshape(b, c, h * w)   # col-major like the reference
    fb = jnp.transpose(feature_b.reshape(b, c, h * w), (0, 2, 1))      # [B, HW, C]
    corr = (fb @ fa).reshape(b, h, w, h * w)
    return jnp.transpose(corr, (0, 3, 1, 2))


class FeatureAligner(nn.Module):
    """Dense-correspondence ablation aligner (reference FeatureAligner,
    alignment_old.py:500-612; FeatureAlignerBig :613-722 is the widened variant —
    neither is used at runtime by the released runners). Encodes
    cat(residual, downsampled ref feats, depth, query thumb) contexts through a
    small U-net and returns a 32-ch aligned feature map at input resolution."""

    norm: str = "batch"
    axis_name: str | None = None
    context_dim: int = 8

    @nn.compact
    def __call__(
        self,
        residual_images: jnp.ndarray,            # [B, 3, H, W]
        que_depth: jnp.ndarray | None = None,    # [B, 1, H, W]
        ref_feats: jnp.ndarray | None = None,    # [B, C, H, W]
        que_thumb_images: jnp.ndarray | None = None,  # [B, 3, H, W]
        train: bool = False,
    ) -> jnp.ndarray:
        from e3dge_tpu.models.pifu.local_net import ContextConv
        from e3dge_tpu.ops import interpolate_bilinear

        d = self.context_dim
        parts = [ContextConv(d, name="residual_conv")(residual_images)]
        if ref_feats is not None:
            parts.append(TorchConv(d, 3, padding=1, use_bias=False, name="downsample_channel_conv")(ref_feats))
        if que_depth is not None:
            parts.append(ContextConv(d, name="depth_conv")(que_depth))
        if que_thumb_images is not None:
            parts.append(ContextConv(d, name="que_thumb_conv")(que_thumb_images))
        h = jnp.concatenate(parts, axis=1)
        res = h.shape[-1]

        feat1 = TorchConv(32, 3, padding=1, use_bias=False, name="conv_layer1_conv")(h)
        if self.norm == "batch":
            feat1 = BatchNorm(32, self.axis_name, name="conv_layer1_bn")(feat1, train)
        feat1 = PReLU(32, name="conv_layer1_prelu")(feat1)

        def stage(x, chans, name):
            for i, (depth, stride) in enumerate(chans):
                x = BottleneckIRPlain(depth, stride, self.norm, self.axis_name, name=f"{name}_{i}")(x, train)
            return x

        feat2 = stage(feat1, [(48, 2), (48, 1), (48, 1)], "conv_layer2")
        feat3 = stage(feat2, [(64, 2), (64, 1), (64, 1)], "conv_layer3")

        feat3 = interpolate_bilinear(feat3, (res // 2, res // 2), align_corners=False)
        dfea1 = stage(jnp.concatenate([feat3, feat2], 1), [(64, 1), (32, 1), (32, 1)], "dconv_layer1")
        dfea1 = interpolate_bilinear(dfea1, (res, res), align_corners=False)
        dfea2 = stage(jnp.concatenate([dfea1, feat1], 1), [(32, 1), (32, 1)], "dconv_layer2")
        return dfea2


class DemodulatedConv2d(nn.Module):
    """Style-free demodulated conv (reference helper_modules/helpers.py:14-80,
    the `--ada_norm_layer demodulate` option of the ADA aligner / DGC ablations).

    Without a per-sample style the demodulation factor is identical for every
    batch entry, so the reference's batch->groups grouped conv collapses to one
    shared-weight conv with demod-scaled output channels (MXU-friendly)."""

    out_channel: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from e3dge_tpu.models.layers import conv2d_torch

        in_channel = x.shape[1]
        weight = self.param(
            "weight",
            nn.initializers.normal(stddev=1.0),
            (1, self.out_channel, in_channel, self.kernel_size, self.kernel_size),
        )
        demod = jax.lax.rsqrt(jnp.sum(weight**2, axis=(2, 3, 4)) + 1e-8)  # [1, out]
        w = (weight[0] * demod[0][:, None, None, None]).astype(x.dtype)
        out = conv2d_torch(x, w, stride=self.stride, padding=self.padding)
        if self.use_bias:
            b = self.param("bias", nn.initializers.normal(stddev=1.0), (self.out_channel,))
            out = out + b.astype(out.dtype).reshape(1, -1, 1, 1)
        return out


class ConvResBlock(nn.Module):
    """CodeFormer conv ResBlock: GroupNorm(32) + swish + 3x3 convs + (1x1 shortcut)
    (reference helper_modules/sft.py:18-54)."""

    out_channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_channels = x.shape[1]

        def norm(h, name):
            c = h.shape[1]
            groups = 32 if c % 32 == 0 and c >= 32 else min(4, c)
            h = jnp.transpose(h, (0, 2, 3, 1))
            h = nn.GroupNorm(num_groups=groups, epsilon=1e-6, dtype=h.dtype, name=name)(h)
            return jnp.transpose(h, (0, 3, 1, 2))

        h = norm(x, "norm1")
        h = h * jax.nn.sigmoid(h)  # swish
        h = TorchConv(self.out_channels, 3, padding=1, name="conv1")(h)
        h = norm(h, "norm2")
        h = h * jax.nn.sigmoid(h)
        h = TorchConv(self.out_channels, 3, padding=1, name="conv2")(h)
        if in_channels != self.out_channels:
            x = TorchConv(self.out_channels, 1, name="conv_out")(x)
        return h + x


class FuseSftBlock(nn.Module):
    """Conv variant of the SFT fusion (reference Fuse_sft_block, sft.py:56-80;
    unused by the released runners — the MLP variant FuseSftMLP is the live one)."""

    out_ch: int

    @nn.compact
    def __call__(self, enc_feat: jnp.ndarray, dec_feat: jnp.ndarray, w: float = 1.0) -> jnp.ndarray:
        h = ConvResBlock(self.out_ch, name="encode_enc")(jnp.concatenate([enc_feat, dec_feat], axis=1))

        def branch(name):
            s = TorchConv(self.out_ch, 3, padding=1, name=f"{name}_0")(h)
            s = jnp.where(s >= 0, s, 0.2 * s)
            return TorchConv(self.out_ch, 3, padding=1, name=f"{name}_2")(s)

        scale = branch("scale")
        shift = branch("shift")
        return dec_feat + w * (dec_feat * scale + shift)


class ResidualConvBlock(nn.Module):
    """norm->relu->reflect-pad conv x2 + shortcut (reference helpers.py:318-397;
    instance norm = per-channel GroupNorm)."""

    dim_out: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim_in = x.shape[1]

        def inorm(h, name):
            c = h.shape[1]
            h = jnp.transpose(h, (0, 2, 3, 1))
            h = nn.GroupNorm(num_groups=c, epsilon=1e-5, dtype=h.dtype, name=name)(h)
            return jnp.transpose(h, (0, 3, 1, 2))

        def reflect_conv(h, name):
            h = jnp.pad(h, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="reflect")
            return TorchConv(self.dim_out, 3, use_bias=False, name=name)(h)

        h = reflect_conv(jax.nn.relu(inorm(x, "norm1")), "conv1")
        h = reflect_conv(jax.nn.relu(inorm(h, "norm2")), "conv2")
        if dim_in != self.dim_out:
            x = TorchConv(self.dim_out, 1, use_bias=False, name="short_cut")(x)
        return h + x


class AlignInpainterFusionBlock(nn.Module):
    """Visibility-mask lerp of 3D-projected vs inpainted 2D features + residual
    block (reference alignment_old.py:455-496; fusion ablation).

    proj_3dfeats / inpainted_2dfeats: [B, C, H, W]; visibility_mask broadcastable.
    reshape=True returns [B, H, W, 1, C] like the reference permute/unsqueeze."""

    @nn.compact
    def __call__(
        self,
        proj_3dfeats: jnp.ndarray,
        inpainted_2dfeats: jnp.ndarray,
        visibility_mask: jnp.ndarray,
        reshape: bool = True,
    ) -> jnp.ndarray:
        fused = visibility_mask * proj_3dfeats + (1.0 - visibility_mask) * inpainted_2dfeats
        fused = ResidualConvBlock(proj_3dfeats.shape[1], name="fusionBlock")(fused)
        if reshape:
            fused = jnp.transpose(fused, (0, 2, 3, 1))[:, :, :, None, :]
        return fused
