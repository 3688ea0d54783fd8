"""E1 local network: residual+depth hourglass filter, pixel-aligned query, and
zero-init SFT modulation head.

Mirrors the reference `HGPIFuNetGAN` / `HGPIFuNetGANResidualResnetFC`
(`project/vendor/pifu/lib/model/HGPIFuGANNet.py:18-436`,
`HGPIFuGANNetResidualInputResnetFC.py:19-104`):

  filter: residual RGB -> 32ch conv stack (InstanceNorm) (+ depth -> 32ch) -> concat
          -> stacked hourglass -> [B, hourglass_dim, H/4, W/4] feature map
  query:  project 3D points with uv calibs, y-flip to grid_sample convention,
          bilinear-sample features, depth-normalize z
  tex_modulations: 301-d (feats + 45 PE) -> zero-init ResnetBlockFC -> (alpha, beta)

The query is a pure gather+lerp (ops/grid_sample.py), differentiable to any order.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from e3dge_tpu.models.align import ResnetBlockFC
from e3dge_tpu.models.encoders.fpn import TorchConv
from e3dge_tpu.models.layers import EqualLinear
from e3dge_tpu.models.pifu.hourglass import HGFilter
from e3dge_tpu.ops import grid_sample, grid_sample_mm
from e3dge_tpu.render.camera import project_points
from e3dge_tpu.utils.config import PifuConfig


def _reflect_pad(x: jnp.ndarray, p: int, nhwc: bool = False) -> jnp.ndarray:
    if nhwc:
        return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
    return jnp.pad(x, ((0, 0), (0, 0), (p, p), (p, p)), mode="reflect")


class InstanceNorm(nn.Module):
    """InstanceNorm2d(affine=True, no running stats). NCHW by default; set
    `nhwc=True` for channels-last streams (params are per-channel vectors either
    way, so the flag changes layout only, never the checkpoint tree)."""

    channels: int
    nhwc: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # statistics in f32, output in the input dtype (same convention as
        # BatchNorm/GroupNorm here): the f32 affine params must not promote a
        # bf16 stream — this norm sits at the E1 filter entrance, and promoting
        # here silently ran the WHOLE hourglass in f32 under the bf16 stack
        spatial = (1, 2) if self.nhwc else (2, 3)
        cshape = (1, 1, 1, -1) if self.nhwc else (1, -1, 1, 1)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=spatial, keepdims=True)
        var = jnp.var(xf, axis=spatial, keepdims=True)
        h = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
        scale = self.param("scale", nn.initializers.ones, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        h = h * scale.reshape(cshape) + bias.reshape(cshape)
        return h.astype(x.dtype)


class ContextConv(nn.Module):
    """conv3x3(reflect) -> ResidualBlock -> conv1x1 — the residual/depth context
    encoders (HGPIFuGANNetResidualInputResnetFC.py:36-45, helpers.py:318-358).

    norm='in' is the released ResnetFC variant (InstanceNorm); norm='bn' is the
    HGPIFuNetGANResidual variant (helpers.py ResidualBlock default BatchNorm2d,
    HGPIFuGANNetResidualInput.py:37-48).

    `nhwc=True` runs channels-last end-to-end (same param tree: ConvNHWC shares
    TorchConv's inner "conv", norm params are per-channel vectors)."""

    dim: int = 32
    norm: str = "in"
    axis_name: str | None = None
    nhwc: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from e3dge_tpu.models.encoders.fpn import BatchNorm
        from e3dge_tpu.models.pifu.hourglass import ConvNHWC

        conv = ConvNHWC if self.nhwc else TorchConv

        def norm(h, name):
            if self.norm == "bn":
                return BatchNorm(self.dim, axis_name=self.axis_name, nhwc=self.nhwc, name=name)(
                    h, train=train
                )
            return InstanceNorm(self.dim, nhwc=self.nhwc, name=name)(h)

        def rpad(h):
            return _reflect_pad(h, 1, nhwc=self.nhwc)

        h = conv(self.dim, 3, padding=0, use_bias=False, name="conv_in")(rpad(x))
        # ResidualBlock: norm -> relu -> conv3x3(reflect) -> norm -> relu -> conv3x3
        r = norm(h, "rb_norm1")
        r = jax.nn.relu(r)
        r = conv(self.dim, 3, padding=0, use_bias=False, name="rb_conv1")(rpad(r))
        r = norm(r, "rb_norm2")
        r = jax.nn.relu(r)
        r = conv(self.dim, 3, padding=0, use_bias=False, name="rb_conv2")(rpad(r))
        h = h + r
        return conv(self.dim, 1, use_bias=False, name="conv_out")(h)


def depth_normalize(z: jnp.ndarray, load_size: int = 256, z_size: float = 1.12) -> jnp.ndarray:
    """z_feat = z * (loadSize/2) / z_size (reference DepthNormalizer.py:4-17,
    released flags --loadSize 256 --z_size 1.12)."""
    return z * (load_size // 2) / z_size


def points_in_image(points: jnp.ndarray, calibs: jnp.ndarray) -> jnp.ndarray:
    """in_img bounds mask of query_features WITHOUT the feature gather
    (HGPIFuGANNet.py:107-115 computes both; callers that only consume the mask —
    the cross-view visibility test, e3dge.que_render_given_ref step 3 — skip the
    [N, C] row-gather pass entirely). Bit-identical to query_features()['in_img']
    (the y flip does not change the symmetric bounds test).

    points [B, 3, N] world space, calibs [B, 4, 4] -> bool [B, N]."""
    xyz = project_points(points, calibs)
    u, v = xyz[:, 0], xyz[:, 1]
    return (u >= -1.0) & (u <= 1.0) & (v >= -1.0) & (v <= 1.0)


def query_features(
    im_feat: jnp.ndarray,   # [B, C, Hf, Wf]
    points: jnp.ndarray,    # [B, 3, N] world space
    calibs: jnp.ndarray,    # [B, 4, 4]
    load_size: int = 256,
    z_size: float = 1.12,
    sample_mode: str = "gather",
) -> dict[str, jnp.ndarray]:
    """Pixel-aligned feature lookup (HGPIFuGANNet.py:85-211, return_feat_only path).

    sample_mode picks the bilinear-sampling lowering (same semantics either way):
      "gather" — channels-last row gathers (ops/grid_sample.grid_sample);
      "mm"     — dense one-hot sampling-matrix matmul (grid_sample_mm): the
                 backward becomes a matmul instead of a scatter-add;
      "auto"   — "mm" iff the feature map is bf16 AND the point count is large
                 enough to amortize the dense form (N >= 4·Hf·Wf). f32 paths
                 keep the gather: measured v5e at the cycle shape (r5), f32 mm
                 loses forward-only (36.9 vs 28.5 ms) and only wins when
                 differentiated (fwd+bwd 37.0 vs 49.5 ms) — auto cannot see
                 differentiation, so f32 training opts in via "mm" explicitly.

    Returns feats [B, C, N], z_condition [B, 1, N], proj_xy [B, 2, N],
    depth [B, 1, N], in_img [B, N].
    """
    xyz = project_points(points, calibs)  # (u, v, depth), +v up
    # flip y to grid_sample convention (left-top = (-1, -1)): HGPIFuGANNet.py:114-115
    xy = jnp.stack([xyz[:, 0], -xyz[:, 1]], axis=1)  # [B, 2, N]
    z = xyz[:, 2:3]

    in_img = (
        (xy[:, 0] >= -1.0) & (xy[:, 0] <= 1.0) & (xy[:, 1] >= -1.0) & (xy[:, 1] <= 1.0)
    )

    grid = jnp.transpose(xy, (0, 2, 1))[:, :, None, :]  # [B, N, 1, 2]
    if sample_mode == "auto":
        _, _, hf, wf = im_feat.shape
        large_n = points.shape[-1] >= 4 * hf * wf
        sample_mode = "mm" if (im_feat.dtype == jnp.bfloat16 and large_n) else "gather"
    sample = grid_sample_mm if sample_mode == "mm" else grid_sample
    feats = sample(im_feat, grid)[..., 0]  # [B, C, N]
    z_feat = depth_normalize(z, load_size, z_size)
    return {"feats": feats, "z_condition": z_feat, "proj_xy": xy, "depth": z, "in_img": in_img}


class SurfaceClassifier(nn.Module):
    """Per-point SDF MLP with input skip connections (reference
    vendor/pifu/lib/model/SurfaceClassifier.py:6-68: conv1d stack
    [257, 1024, 512, 256, 128, 1]; layers 2..4 concat the input features).
    Used by stage-1 netLocal 3D-supervised pretraining (HGPIFuGANNet.get_error)."""

    filter_channels: tuple[int, ...] = (1024, 512, 256, 128, 1)

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> jnp.ndarray:
        """[..., C_in] point features (hourglass feats + z condition) -> [..., 1]."""
        y = feats
        for i, ch in enumerate(self.filter_channels):
            inp = y if i == 0 else jnp.concatenate([y, feats], axis=-1)
            y = nn.Dense(ch, name=f"conv{i}")(inp)
            if i != len(self.filter_channels) - 1:
                y = jnp.where(y >= 0, y, 0.01 * y)  # leaky relu
        return y


class LocalFeatureNet(nn.Module):
    """netLocal. variant='resnetfc' is the released `HGPIFuNetGANResidualResnetFC`
    (InstanceNorm context convs + zero-init ResnetBlockFC tex head); variant='bn'
    is `HGPIFuNetGANResidual` (BatchNorm context convs + zero-init EqualLinear tex
    head, HGPIFuGANNetResidualInput.py:19-103 — the stage2.2.sh netLocal_type)."""

    cfg: PifuConfig
    modulation_width: int = 256      # SIREN hidden width the SFT modulates
    local_feats_dim: int = 256 + 45  # hourglass feats + PE dims
    enable_geo_modulations: bool = False   # L_pred_geo_modulations ablation
    enable_surface_classifier: bool = False  # stage-1 netLocal pretraining head
    variant: str = "resnetfc"        # "resnetfc" | "bn"
    axis_name: str | None = None     # SyncBN axis for the 'bn' variant

    def setup(self):
        c = self.cfg
        norm = "bn" if self.variant == "bn" else "in"
        # the whole filter path runs NHWC internally (conv-native TPU layout):
        # one transpose in, one out, instead of a pair around every conv/norm
        self.residual_conv = ContextConv(
            32, norm=norm, axis_name=self.axis_name, nhwc=True, name="residual_conv"
        )
        if "depth" in c.residual_context_feats:
            self.depth_conv = ContextConv(
                32, norm=norm, axis_name=self.axis_name, nhwc=True, name="depth_conv"
            )
        self.image_filter = HGFilter(
            num_stack=c.num_stack,
            num_hourglass=c.num_hourglass,
            hourglass_dim=c.hourglass_dim,
            nhwc_io=True,
            name="image_filter",
        )
        # zero-init: modulations are an exact no-op at init
        if self.variant == "bn":
            self.tex_modulation_head = EqualLinear(
                self.modulation_width * 2, zero_init=True, name="local_feat_to_tex_modulations"
            )
        else:
            self.tex_modulation_head = ResnetBlockFC(
                self.modulation_width * 2, zero_init=True, name="local_feat_to_tex_modulations"
            )
        if self.enable_geo_modulations:
            # ablation path (reference L_pred_geo_modulations): zero-init EqualLinear
            # 256 -> 2*256 geo SFT (HGPIFuGANNet.py:67-72,
            # HGPIFuGANNetResidualInputResnetFC.py:81-84)
            self.geo_modulation_head = EqualLinear(
                self.modulation_width * 2, zero_init=True, name="local_feat_to_geo_modulations"
            )
        if self.enable_surface_classifier:
            self.surface_classifier = SurfaceClassifier(name="surface_classifier")

    def filter(
        self, residual_images: jnp.ndarray, depth_feat: jnp.ndarray | None = None, train: bool = False
    ) -> jnp.ndarray:
        """[B, 3, H, W] residual (+ [B, 1, H, W] depth) -> hourglass feature map
        [B, hourglass_dim, H/4, W/4]. NCHW at the boundary (matches every caller
        and the query's gather layout); NHWC inside — the r5 cycle xprof showed
        the old per-op transpose pairs cost ~30 ms/step of pure data formatting."""
        x = jnp.transpose(residual_images, (0, 2, 3, 1))
        feats = self.residual_conv(x, train=train)
        if depth_feat is not None:
            d = jnp.transpose(depth_feat, (0, 2, 3, 1))
            feats = jnp.concatenate([feats, self.depth_conv(d, train=train)], axis=-1)
        out = self.image_filter(feats)
        return jnp.transpose(out, (0, 3, 1, 2))

    def query(
        self,
        im_feat: jnp.ndarray,
        points: jnp.ndarray,
        calibs: jnp.ndarray,
        sample_mode: str | None = None,
    ) -> dict:
        return query_features(
            im_feat, points, calibs, self.cfg.load_size, self.cfg.z_size,
            sample_mode=sample_mode or self.cfg.query_sample_mode,
        )

    def query_pair(
        self, feat_a: jnp.ndarray, feat_b: jnp.ndarray, points: jnp.ndarray, calibs: jnp.ndarray
    ) -> dict:
        """One fused pixel-aligned lookup for two feature volumes sharing the SAME
        projection (same points, same calibs — the same-view serving case): a
        single channel-concat gather instead of two row-gather passes. Bit-exact
        vs two query() calls (identical indices and lerp weights; the gather is
        the TPU slow path, halving passes is the win). Returns the query dict
        with feats_a/feats_b split back out."""
        ca = feat_a.shape[1]
        q = query_features(
            jnp.concatenate([feat_a, feat_b.astype(feat_a.dtype)], axis=1),
            points, calibs, self.cfg.load_size, self.cfg.z_size,
            sample_mode=self.cfg.query_sample_mode,
        )
        q["feats_a"] = q["feats"][:, :ca]
        q["feats_b"] = q["feats"][:, ca:]
        return q

    def tex_modulations(self, local_feats: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """[..., local_feats_dim] -> (alpha, beta) each [..., modulation_width]."""
        m = self.tex_modulation_head(local_feats)
        return m[..., : self.modulation_width], m[..., self.modulation_width :]

    def geo_modulations(self, local_feats: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        m = self.geo_modulation_head(local_feats)
        return m[..., : self.modulation_width], m[..., self.modulation_width :]

    def predict_sdf(self, im_feat: jnp.ndarray, points: jnp.ndarray, calibs: jnp.ndarray) -> jnp.ndarray:
        """Stage-1 netLocal pretraining: pixel-aligned feats + z condition ->
        SurfaceClassifier SDF, masked to in-image points (HGPIFuGANNet.py:153-196).
        Returns [B, N, 1]."""
        q = self.query(im_feat, points, calibs)
        feats = jnp.concatenate([q["feats"], q["z_condition"]], axis=1)  # [B, C+1, N]
        pred = self.surface_classifier(jnp.transpose(feats, (0, 2, 1)))  # [B, N, 1]
        return pred * q["in_img"][..., None].astype(pred.dtype)

    def __call__(self, residual_images, depth_feat, points, calibs):
        """Convenience end-to-end pass (used for init/shape checks). Touches the
        modulation head so `init` materializes all params."""
        im_feat = self.filter(residual_images, depth_feat)
        out = self.query(im_feat, points, calibs)
        dummy = jnp.zeros(out["feats"].shape[:1] + (self.local_feats_dim,))
        self.tex_modulations(dummy)
        if self.enable_geo_modulations:
            self.geo_modulations(dummy)
        if self.enable_surface_classifier:
            self.predict_sdf(im_feat, points, calibs)
        return out
