"""FiLM-modulated SIREN MLP — the G0 radiance/SDF field.

Mirrors the reference `LinearLayer` / `FiLMSiren` / `SirenGenerator`
(`project/utils/volume_renderer.py:42-264`): an 8-layer sin-activated MLP whose
per-layer frequency (gamma) and phase (beta) are predicted from W+ style rows,
with SDF, view-conditioned feature, and RGB heads.

TPU notes: every layer is a dense matmul over the flattened ray-sample axis — ideal MXU
shape (N x 256 x 256). The reference's memory sub-batching (`volume_renderer.py:122-128`)
and 50k-point chunk loops (`:1083-1112`) are deliberately absent: XLA tiles the sample
axis, and the renderer can wrap the field in `jax.checkpoint` when HBM-bound.
"""

from __future__ import annotations

import math
import flax.linen as nn
import jax
import jax.numpy as jnp

from e3dge_tpu.ops.fast_math import fast_sin


class SirenLinear(nn.Module):
    """SIREN linear with frequency-aware init (reference LinearLayer,
    volume_renderer.py:42-80). forward: std_init * (x W^T + b) + bias_init."""

    out_dim: int
    bias_init: float = 0.0
    std_init: float = 1.0
    freq_init: bool = False
    is_first: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_dim = x.shape[-1]

        def w_init(key, shape):
            if self.is_first:
                lim = 1.0 / in_dim
                return jax.random.uniform(key, shape, minval=-lim, maxval=lim)
            if self.freq_init:
                lim = math.sqrt(6.0 / in_dim) / 25.0
                return jax.random.uniform(key, shape, minval=-lim, maxval=lim)
            # 0.25 * kaiming_normal(a=0.2, fan_in, leaky_relu)
            gain = math.sqrt(2.0 / (1.0 + 0.04))
            std = 0.25 * gain / math.sqrt(in_dim)
            return std * jax.random.normal(key, shape)

        weight = self.param("weight", w_init, (self.out_dim, in_dim))
        bound = math.sqrt(1.0 / in_dim)
        bias = self.param(
            "bias", lambda key, shape: jax.random.uniform(key, shape, minval=-bound, maxval=bound), (self.out_dim,)
        )
        # layers follow their input dtype (f32 master params cast at use) — the
        # renderer's field_dtype boundary switches the whole field to bf16
        w = weight.astype(x.dtype)
        b = bias.astype(x.dtype)
        return self.std_init * (x @ w.T + b) + self.bias_init


class FiLMSiren(nn.Module):
    """sin(gamma(w) * (x W^T + b) + beta(w)) (reference volume_renderer.py:84-132).

    gamma head: bias_init=30, std_init=15; beta head: bias_init=0, std_init=0.25.
    """

    out_channel: int
    is_first: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, style: jnp.ndarray) -> jnp.ndarray:
        in_channel = x.shape[-1]

        def w_init(key, shape):
            if self.is_first:
                return jax.random.uniform(key, shape, minval=-1.0 / 3.0, maxval=1.0 / 3.0)
            lim = math.sqrt(6.0 / in_channel) / 25.0
            return jax.random.uniform(key, shape, minval=-lim, maxval=lim)

        weight = self.param("weight", w_init, (self.out_channel, in_channel))
        bound = math.sqrt(1.0 / in_channel)
        bias = self.param(
            "bias", lambda key, shape: jax.random.uniform(key, shape, minval=-bound, maxval=bound), (self.out_channel,)
        )
        style = style.astype(x.dtype)  # FiLM heads follow the field dtype
        gamma = SirenLinear(self.out_channel, bias_init=30.0, std_init=15.0, name="gamma")(style)
        beta = SirenLinear(self.out_channel, bias_init=0.0, std_init=0.25, name="beta")(style)
        # broadcast [B, C] FiLM params over intermediate (spatial/sample) axes
        bshape = (style.shape[0],) + (1,) * (x.ndim - 2) + (self.out_channel,)
        out = x @ weight.astype(x.dtype).T + bias.astype(x.dtype)
        arg = gamma.reshape(bshape) * out + beta.reshape(bshape)
        # bf16 (serving) field: polynomial sin fuses into the matmul epilogue —
        # the field is otherwise sine-transcendental-bound on the VPU
        # (ops/fast_math.py). f32 keeps jnp.sin: XLA's fused cos VJP beats the
        # polynomial's in the training backward (343 -> 388 ms/step measured),
        # and goldens stay bit-stable.
        return fast_sin(arg) if arg.dtype == jnp.bfloat16 else jnp.sin(arg)


class SirenGenerator(nn.Module):
    """8x FiLMSiren backbone + SDF / view-feature / RGB heads
    (reference volume_renderer.py:136-264).

    Style handling: styles [B, D+1, style_dim] uses row i for backbone layer i and the
    last row for the view-conditioned layer; [B, style_dim] broadcasts one w everywhere.
    Local SFT fusion: `conditions=(alpha, beta)` modulates the texture branch input as
    (alpha+1)*h + beta before the view layer (volume_renderer.py:217-220).
    """

    depth: int = 8
    width: int = 256
    style_dim: int = 256
    input_ch_views: int = 3
    output_features: bool = True

    def setup(self):
        self.pts_linears = [
            FiLMSiren(self.width, is_first=(i == 0), name=f"pts_linears_{i}") for i in range(self.depth)
        ]
        self.views_linears = FiLMSiren(self.width, name="views_linears")
        self.rgb_linear = SirenLinear(3, freq_init=True, name="rgb_linear")
        self.sigma_linear = SirenLinear(1, freq_init=True, name="sigma_linear")

    def _style_row(self, styles: jnp.ndarray, i: int) -> jnp.ndarray:
        return styles[:, i] if styles.ndim == 3 else styles

    def backbone(self, pts: jnp.ndarray, styles: jnp.ndarray) -> jnp.ndarray:
        """[B, ..., 3] points -> [B, ..., W] features (forward_generator)."""
        h = pts
        for i, layer in enumerate(self.pts_linears):
            h = layer(h, self._style_row(styles, i))
        return h

    def geo_head(
        self, h: jnp.ndarray, conditions: tuple[jnp.ndarray, jnp.ndarray] | None = None
    ) -> jnp.ndarray:
        """SDF head; optional local geo SFT modulation (reference
        L_pred_geo_modulations path, volume_renderer.py:393-398: geometry uses
        'global_local' strategy with (alpha+1)*h + beta before the sigma linear)."""
        if conditions is not None:
            alpha, beta = conditions
            h = (alpha.astype(h.dtype) + 1.0) * h + beta.astype(h.dtype)
        return self.sigma_linear(h)

    def tex_head(
        self,
        h: jnp.ndarray,
        views: jnp.ndarray,
        styles: jnp.ndarray,
        conditions: tuple[jnp.ndarray, jnp.ndarray] | None = None,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(rgb, features). conditions = (alpha, beta) local SFT modulation."""
        if conditions is not None:
            alpha, beta = conditions
            h = (alpha.astype(h.dtype) + 1.0) * h + beta.astype(h.dtype)
        h = jnp.concatenate([h, views.astype(h.dtype)], axis=-1)
        view_style = styles[:, -1] if styles.ndim == 3 else styles
        features = self.views_linears(h, view_style)
        rgb = self.rgb_linear(features)
        return rgb, features

    def __call__(
        self,
        pts: jnp.ndarray,
        views: jnp.ndarray,
        styles: jnp.ndarray,
        conditions: tuple[jnp.ndarray, jnp.ndarray] | None = None,
    ) -> jnp.ndarray:
        """Full field query -> concat([rgb 3, sdf 1, features W]) like the reference
        `raw` layout (volume_renderer.py:240-264)."""
        h = self.backbone(pts, styles)
        sdf = self.geo_head(h)
        rgb, features = self.tex_head(h, views, styles, conditions)
        out = jnp.concatenate([rgb, sdf], axis=-1)
        if self.output_features:
            out = jnp.concatenate([out, features], axis=-1)
        return out

    def forward_ddf(
        self,
        pts: jnp.ndarray,
        views: jnp.ndarray,
        styles: jnp.ndarray,
        feat_layer: int = -1,
        multi_layer: bool = False,
    ) -> dict[str, jnp.ndarray]:
        """SirenGeneratorDDF ablation (reference volume_renderer.py:561-632): also
        return intermediate backbone-layer features — the feat_layer'th layer, all
        layers >= feat_layer when multi_layer, or the final view features when
        feat_layer == -1. Returns {'out': [..., 4], 'feats': [..., k*W]}."""
        h = pts
        feats = []
        for i, layer in enumerate(self.pts_linears):
            h = layer(h, self._style_row(styles, i))
            if (multi_layer and feat_layer <= i) or (not multi_layer and feat_layer == i):
                feats.append(h)
        sdf = self.geo_head(h)
        rgb, out_features = self.tex_head(h, views, styles)
        if feat_layer == -1 or multi_layer:
            feats.append(out_features)
        return {
            "out": jnp.concatenate([rgb, sdf], axis=-1),
            "feats": jnp.concatenate(feats, axis=-1) if feats
            else jnp.zeros(h.shape[:-1] + (0,), h.dtype),
        }
