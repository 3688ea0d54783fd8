"""Full StyleSDF generator: mapping + volume renderer (G0) + decoder (G1).

Mirrors the reference `Generator` / `G_pred_latents`
(`project/models/stylesdf_model.py:800-1189`). `__call__` takes W+ latents predicted by
the encoder (`input_is_latent=True`, the E3DGE hot path) or z codes through the 3-layer
mapping net, renders the 64-res thumb + feature map, and optionally runs the decoder.

The renderer is frozen in E3DGE training; freezing is expressed functionally by
`jax.lax.stop_gradient` on renderer params at the train-step level (instead of torch's
`set_grad_enabled(False)`, stylesdf_model.py:959).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from e3dge_tpu.models.decoder import Decoder
from e3dge_tpu.models.layers import MappingLinear
from e3dge_tpu.models.volume_renderer import VolumeFeatureRenderer
from e3dge_tpu.render.camera import CameraParams
from e3dge_tpu.utils.config import E3DGEConfig


class RendererMapping(nn.Module):
    """3x MappingLinear z->w (stylesdf_model.py:823-830)."""

    style_dim: int = 256

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        h = z
        for i in range(3):
            h = MappingLinear(self.style_dim, name=f"style_{i}")(h)
        return h


class Generator(nn.Module):
    cfg: E3DGEConfig
    full_pipeline: bool = True

    def setup(self):
        c = self.cfg
        self.style = RendererMapping(c.renderer.style_dim, name="style")
        self.renderer = VolumeFeatureRenderer(
            c.renderer, camera_dist_radius=c.camera.dist_radius, name="renderer"
        )
        self.renderer_n_latent = c.renderer.depth + 1  # 9
        if self.full_pipeline:
            self.decoder = Decoder(c.decoder, name="decoder")

    # -- latent utilities ------------------------------------------------------

    def mapping(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.style(z)

    def mean_latent(self, key: jax.Array, n_latent: int = 10000):
        """[renderer w mean [1, 256], decoder w mean [1, 512]]
        (stylesdf_model.py:854-864)."""
        z = jax.random.normal(key, (n_latent, self.cfg.renderer.style_dim))
        renderer_w = self.style(z)
        renderer_mean = jnp.mean(renderer_w, axis=0, keepdims=True)
        decoder_mean = self.decoder.mean_latent(renderer_w) if self.full_pipeline else None
        return renderer_mean, decoder_mean

    # -- forward ---------------------------------------------------------------

    def __call__(
        self,
        styles: Sequence[jnp.ndarray],
        camera: CameraParams,
        key: jax.Array | None = None,
        input_is_latent: bool = False,
        truncation: float = 1.0,
        truncation_latent: tuple | None = None,
        conditions: tuple[jnp.ndarray, jnp.ndarray] | None = None,
        local_conditions: tuple[jnp.ndarray, jnp.ndarray] | None = None,
        renderer_only: bool = False,
        train: bool = False,
        noise: Sequence | None = None,
        z_vals: jnp.ndarray | None = None,
        no_force_stop: bool = False,
        return_raw_h: bool = False,
        field_dtype: str | None = None,
    ) -> dict[str, Any]:
        """E3DGE generator forward (G_pred_latents.forward, stylesdf_model.py:1034-1172).

        Args:
          styles: [renderer_latent, decoder_latent] when input_is_latent (W+ from the
            encoder: [B,9,256] and [B,10,512]); [z] otherwise.
          conditions: HFGI decoder feature conditions (alpha, beta) at 64 res.
          local_conditions: per-sample SIREN SFT modulations from the E1 branch.
          renderer_only: skip the decoder (thumb-only paths, mesh/sampling).

        Returns `render_out` dict with gen_thumb_imgs, features, ..., plus `styles`
        (renderer W+) and, with the decoder, `gen_imgs` / `decoder_latent`.
        """
        if self.full_pipeline and input_is_latent:
            encoder_latent, decoder_latent = styles[0], styles[1] if len(styles) > 1 else None
        else:
            encoder_latent, decoder_latent = styles[0], None

        if not input_is_latent:
            encoder_latent = self.style(encoder_latent)
        if truncation < 1.0 and truncation_latent is not None:
            encoder_latent = truncation_latent[0] + truncation * (encoder_latent - truncation_latent[0])

        render_out = self.renderer(
            camera,
            encoder_latent,
            key=key,
            conditions=local_conditions,
            train=train,
            z_vals=z_vals,
            no_force_stop=no_force_stop,
            return_raw_h=return_raw_h,
            field_dtype=field_dtype,
        )
        render_out["styles"] = encoder_latent
        if renderer_only or not self.full_pipeline:
            render_out["gen_imgs"] = None
            return render_out
        return self._decode_into(
            render_out, encoder_latent, decoder_latent, truncation, truncation_latent,
            input_is_latent, noise, conditions, train=train,
        )

    def _decode_into(
        self,
        render_out: dict[str, Any],
        encoder_latent: jnp.ndarray,
        decoder_latent: jnp.ndarray | None,
        truncation: float = 1.0,
        truncation_latent: tuple | None = None,
        input_is_latent: bool = True,
        noise: Sequence | None = None,
        conditions: tuple[jnp.ndarray, jnp.ndarray] | None = None,
        train: bool = False,
    ) -> dict[str, Any]:
        dec_styles = [encoder_latent] if decoder_latent is None else [decoder_latent]
        dec_trunc = truncation_latent[1] if (truncation < 1.0 and truncation_latent is not None) else None
        # decoder pyramid runs in the configured compute dtype (layers follow the
        # input dtype); renderer features are the only activation carrier to cast
        dec_in = render_out["features"].astype(jnp.dtype(self.cfg.dtype))
        gen_imgs, out_latent = self.decoder(
            dec_in,
            dec_styles,
            truncation=truncation,
            truncation_latent=dec_trunc,
            input_is_latent=input_is_latent,
            noise=noise,
            conditions=conditions,
            return_latents=True,
            train=train,
        )
        render_out["gen_imgs"] = gen_imgs.astype(jnp.float32)
        render_out["decoder_latent"] = out_latent
        return render_out

    def render_cached(
        self,
        styles: Sequence[jnp.ndarray],
        cached: dict[str, Any],
        local_conditions: tuple[jnp.ndarray, jnp.ndarray] | None,
        conditions: tuple[jnp.ndarray, jnp.ndarray] | None = None,
        noise: Sequence | None = None,
    ) -> dict[str, Any]:
        """Same-view conditioned re-render reusing the cached SIREN backbone
        (VolumeFeatureRenderer.render_from_backbone) + decoder. styles = W+ pair."""
        encoder_latent = styles[0]
        decoder_latent = styles[1] if len(styles) > 1 else None
        render_out = self.renderer.render_from_backbone(cached, encoder_latent, local_conditions)
        render_out["styles"] = encoder_latent
        if not self.full_pipeline:
            render_out["gen_imgs"] = None
            return render_out
        return self._decode_into(render_out, encoder_latent, decoder_latent, noise=noise, conditions=conditions)

    # -- aux passes used by runners ---------------------------------------------

    def render_sdf_grid(self, camera: CameraParams, styles: jnp.ndarray) -> jnp.ndarray:
        return self.renderer.render_sdf_grid(camera, styles)

    def query_sdf(self, pts: jnp.ndarray, styles: jnp.ndarray) -> jnp.ndarray:
        return self.renderer.query_sdf(pts, styles)
