"""G1 — StyleGAN2-style 2D upsampler: 64-res feature map -> full-res image.

Mirrors the reference `Decoder` (`project/models/stylesdf_model.py:587-797`):
5-layer mapping (renderer-w 256 -> decoder-w 512), StyledConv pyramid from the
renderer's 256-ch 64x64 feature map up to `size` with ToRGB skip accumulation,
n_latent = 2*(log2(size)-log2(in_res)) + 2 = 10 W+ rows at 1024.

The HFGI-style condition hook (out*(1+alpha)+beta at layer `condition_layer`, reference
stylesdf_model.py:777-778) is kept with identical indexing semantics.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from e3dge_tpu.models.layers import EqualLinear, StyledConv, ToRGB, pixel_norm
from e3dge_tpu.utils.config import DecoderConfig


class DecoderMapping(nn.Module):
    """PixelNorm + 5x EqualLinear(fused lrelu, lr_mul) (stylesdf_model.py:596-611)."""

    style_dim: int  # output dim (2x renderer style_dim)
    lr_mul: float = 0.01

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        h = pixel_norm(z)
        for i in range(5):
            h = EqualLinear(
                self.style_dim, lr_mul=self.lr_mul, activation=True, name=f"style_{i}"
            )(h)
        return h


class Decoder(nn.Module):
    cfg: DecoderConfig
    # reference: `if i == 7 - 1` (stylesdf_model.py:777). NOTE the hook is DEAD
    # upstream (bug-compatibly replicated here): the loop counter only takes
    # odd values (i += 2 from 1, :792), so i == 6 never fires — and no
    # reference trainer ever passes `conditions` anyway. Golden-proven
    # (tests/test_golden_oracle.py::test_decoder_condition_hook_dead). Set an
    # odd layer index explicitly to actually inject HFGI conditions.
    condition_layer: int = 6

    @property
    def n_latent(self) -> int:
        return self.cfg.n_latent

    def setup(self):
        c = self.cfg
        channels = c.channels()
        self.log_size = int(math.log2(c.size))
        self.log_in_size = int(math.log2(c.in_res))
        self.num_layers = (self.log_size - self.log_in_size) * 2 + 1

        self.style = DecoderMapping(c.style_dim, c.lr_mapping, name="style")
        self.conv1 = StyledConv(channels[c.in_res], 3, name="conv1")
        self.to_rgb1 = ToRGB(upsample=False, name="to_rgb1")

        convs = []
        to_rgbs = []
        in_ch = channels[c.in_res]
        for li, i in enumerate(range(self.log_in_size + 1, self.log_size + 1)):
            out_ch = channels[2**i]
            convs.append(StyledConv(out_ch, 3, upsample=True, name=f"convs_{2 * li}"))
            convs.append(StyledConv(out_ch, 3, name=f"convs_{2 * li + 1}"))
            to_rgbs.append(ToRGB(name=f"to_rgbs_{li}"))
            in_ch = out_ch
        self.convs = convs
        self.to_rgbs = to_rgbs

    def mean_latent(self, renderer_latent: jnp.ndarray) -> jnp.ndarray:
        """mean decoder-w over a batch of renderer-w (stylesdf_model.py:684-687)."""
        return jnp.mean(self.style(renderer_latent), axis=0, keepdims=True)

    def _expand_styles(
        self,
        styles: Sequence[jnp.ndarray],
        inject_index: int | None,
        truncation: float,
        truncation_latent: jnp.ndarray | None,
        input_is_latent: bool,
    ) -> jnp.ndarray:
        """list of z/w/W+ -> [B, n_latent, style_dim] (styles_and_noise_forward,
        stylesdf_model.py:692-740). Style mixing requires a static inject_index."""
        if not input_is_latent:
            styles = [self.style(s) for s in styles]
        if truncation < 1:
            assert truncation_latent is not None
            styles = [truncation_latent + truncation * (s - truncation_latent) for s in styles]
        if len(styles) < 2:
            s = styles[0]
            if s.ndim < 3:
                latent = jnp.repeat(s[:, None], self.n_latent, axis=1)
            else:
                latent = s
        else:
            assert inject_index is not None, "style mixing needs a static inject_index"
            l1 = jnp.repeat(styles[0][:, None], inject_index, axis=1)
            l2 = jnp.repeat(styles[1][:, None], self.n_latent - inject_index, axis=1)
            latent = jnp.concatenate([l1, l2], axis=1)
        return latent

    def __call__(
        self,
        features: jnp.ndarray,                       # [B, C, in_res, in_res]
        styles: Sequence[jnp.ndarray] | jnp.ndarray,  # list of z/w or [B, n_latent, D]
        rgbd_in: jnp.ndarray | None = None,
        inject_index: int | None = None,
        truncation: float = 1.0,
        truncation_latent: jnp.ndarray | None = None,
        input_is_latent: bool = False,
        noise: Sequence[jnp.ndarray | None] | None = None,
        conditions: tuple[jnp.ndarray, jnp.ndarray] | None = None,
        return_latents: bool = False,
        train: bool = False,
    ):
        if isinstance(styles, jnp.ndarray):
            styles = [styles]
        latent = self._expand_styles(styles, inject_index, truncation, truncation_latent, input_is_latent)
        if noise is None:
            noise = [None] * self.num_layers

        out = self.conv1(features, latent[:, 0], noise=noise[0])
        skip = self.to_rgb1(out, latent[:, 1], skip=rgbd_in)

        # forward-only callers get the eval threshold (see DecoderConfig notes;
        # both thresholds are exact — the phase path is a re-bracketing)
        s2d_min = self.cfg.s2d_min_res if train else (
            getattr(self.cfg, "s2d_min_res_eval", 0) or self.cfg.s2d_min_res
        )
        i = 1
        res = self.cfg.in_res
        for conv1, conv2, noise1, noise2, to_rgb in zip(
            self.convs[::2], self.convs[1::2], noise[1::2], noise[2::2], self.to_rgbs
        ):
            res *= 2
            if i == self.condition_layer and conditions is not None:
                out = out * (1.0 + conditions[0]) + conditions[1]
            if s2d_min and res >= s2d_min:
                # phase-space level (s2d tail): upsample conv ENTERS phase space
                # (blur folded, no interleave), the 3x3 conv and ToRGB stay in
                # it; `skip` is full-res from the previous level and upsamples
                # directly into phase space. Between consecutive s2d levels the
                # conv output is re-interleaved (cheap vs the layout-copy tax
                # it avoids — see ops/space_to_depth.py).
                out_ph = conv1(out, latent[:, i], noise=noise1, phase="enter")
                out_ph = conv2(out_ph, latent[:, i + 1], noise=noise2, phase="inside")
                skip_ph = to_rgb(out_ph, latent[:, i + 2], skip=skip, phase=True)
                from e3dge_tpu.ops.space_to_depth import d2s, d2s_mxu

                # context-dependent d2s: serving wants the one-hot conv form;
                # under autodiff the reshape form's backward fuses away and wins
                # (measured, see ops/space_to_depth.d2s_mxu docstring)
                d2s_impl = d2s if train else d2s_mxu
                out = d2s_impl(out_ph) if res < self.cfg.size else None
                skip = d2s_impl(skip_ph)
            else:
                out = conv1(out, latent[:, i], noise=noise1)
                out = conv2(out, latent[:, i + 1], noise=noise2)
                skip = to_rgb(out, latent[:, i + 2], skip=skip)
            i += 2

        if return_latents:
            return skip, latent
        return skip, None
