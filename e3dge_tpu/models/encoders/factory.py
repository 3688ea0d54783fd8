"""Encoder factory (reference `set_encoder`, encoders/__init__.py:6-40).

Released/default: HybridGradualStyleEncoder_V2 (IR-SE-50 FPN). Legacy variants kept
for config parity:
  * VolumeRenderDiscriminatorEncoder — D-backbone thumb encoder predicting renderer
    W+ offsets only (reference stylesdf_model.py:1422-1458)
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp

from e3dge_tpu.models.discriminator import VOLUME_D_CHANNELS, VolumeDiscConv, VolumeRenderResBlock
from e3dge_tpu.models.encoders.fpn import HybridGradualStyleEncoderV2
from e3dge_tpu.models.encoders.variants import Encoder4EditingHybrid, HybridBackboneEncoder
from e3dge_tpu.utils.config import EncoderConfig


class VolumeRenderDiscriminatorEncoder(nn.Module):
    """CoordConv D backbone as a thumb-image encoder: predicts [B, 9, 256] renderer
    W+ offsets (reference VolumeRenderDiscriminatorEncoder; decoder W+ is None)."""

    cfg: EncoderConfig
    init_size: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False, return_featmap: bool = False):
        c = self.cfg
        out = VolumeDiscConv(VOLUME_D_CHANNELS[self.init_size], 1, activate=True, name="convs_0")(x)
        log_size = int(math.log2(self.init_size))
        for n, i in enumerate(range(log_size - 1, 0, -1)):
            out = VolumeRenderResBlock(VOLUME_D_CHANNELS[2**i], name=f"convs_{n + 1}")(out)
        out = VolumeDiscConv(c.n_styles_pigan * c.style_dim, 2, name="final_conv")(out)
        thumb_out = out.reshape(x.shape[0], c.n_styles_pigan, c.style_dim)
        if return_featmap:
            return {"pred_latents": [thumb_out, None], "feat_maps": None, "p32": None}
        return [thumb_out, None]


class VolumeStyleEncoder(nn.Module):
    """Legacy joint encoder (reference stylesdf_model.py:1461-1510): volume-D
    CoordConv backbone over the 64-res thumb predicting BOTH renderer W+ (9x256)
    and decoder W+ (10x512) offsets."""

    cfg: EncoderConfig
    init_size: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False, return_featmap: bool = False):
        c = self.cfg
        out = VolumeDiscConv(VOLUME_D_CHANNELS[self.init_size], 1, activate=True, name="convs_0")(x)
        log_size = int(math.log2(self.init_size))
        for n, i in enumerate(range(log_size - 1, 0, -1)):
            out = VolumeRenderResBlock(VOLUME_D_CHANNELS[2**i], name=f"convs_{n + 1}")(out)
        n_out = c.n_styles_pigan * c.style_dim + c.n_styles_decoder * c.decoder_style_dim
        out = VolumeDiscConv(n_out, 2, name="final_conv")(out)
        out = out.reshape(x.shape[0], -1)
        split = c.n_styles_pigan * c.style_dim
        thumb = out[:, :split].reshape(-1, c.n_styles_pigan, c.style_dim)
        dec = out[:, split:].reshape(-1, c.n_styles_decoder, c.decoder_style_dim)
        if return_featmap:
            return {"pred_latents": [thumb, dec], "feat_maps": None, "p32": None}
        return [thumb, dec]


ENCODERS = {
    "HybridGradualStyleEncoder_V2": HybridGradualStyleEncoderV2,
    "VolumeRenderDiscriminatorEncoder": VolumeRenderDiscriminatorEncoder,
    "HybridBackboneEncoder": HybridBackboneEncoder,
    "Encoder4Editing": Encoder4EditingHybrid,
    "VolumeStyleEncoder": VolumeStyleEncoder,
}


def set_encoder(encoder_type: str, cfg: EncoderConfig, **kwargs) -> nn.Module:
    if encoder_type not in ENCODERS:
        raise KeyError(f"unknown encoder_type {encoder_type}; have {list(ENCODERS)}")
    return ENCODERS[encoder_type](cfg, **kwargs)
