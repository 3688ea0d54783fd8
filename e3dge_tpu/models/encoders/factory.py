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
from e3dge_tpu.models.encoders.variants import (
    BackboneEncoderRenderer,
    Encoder4EditingHybrid,
    HybridBackboneEncoder,
)
from e3dge_tpu.utils.config import EncoderConfig


class VolumeRenderDiscriminatorEncoder(nn.Module):
    """CoordConv D backbone as a thumb-image encoder (reference
    stylesdf_model.py:1422-1459, the factory's 'VolumeRenderDiscriminator'
    encoder_type): the volume-D trunk + its gan/viewpoint `final_conv` PLUS a
    separate kernel-2 `wplus_latents_pred_conv` head off the pre-final 2x2
    features predicting [B, 9, 256] renderer W+ offsets (decoder W+ is None).
    The param tree matches the reference ckpt layout — final_conv is kept even
    though the encode path ignores its gan logit (its viewpoint half serves
    `pred_viewpoints=True`, :1437-1447). Golden-pinned."""

    cfg: EncoderConfig
    init_size: int = 64

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        return_featmap: bool = False,
        pred_viewpoints: bool = False,
    ):
        c = self.cfg
        out = VolumeDiscConv(VOLUME_D_CHANNELS[self.init_size], 1, activate=True, name="convs_0")(x)
        log_size = int(math.log2(self.init_size))
        for n, i in enumerate(range(log_size - 1, 0, -1)):
            out = VolumeRenderResBlock(VOLUME_D_CHANNELS[2**i], name=f"convs_{n + 1}")(out)
        gan_out = VolumeDiscConv(3, 2, name="final_conv")(out)  # [B, 3, 1, 1]
        if pred_viewpoints:
            return gan_out[:, 1:].reshape(-1, 2)
        w = VolumeDiscConv(c.n_styles_pigan * c.style_dim, 2, name="wplus_latents_pred_conv")(out)
        thumb_out = w.reshape(x.shape[0], c.n_styles_pigan, c.style_dim)
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


def _sg2_channels(channel_multiplier: int) -> dict[int, int]:
    """StyleGAN2-D channel table (reference stylesdf_model.py:1630-1641)."""
    return {
        4: 512, 8: 512, 16: 512, 32: 512,
        64: 256 * channel_multiplier, 128: 128 * channel_multiplier,
        256: 64 * channel_multiplier, 512: 32 * channel_multiplier,
        1024: 16 * channel_multiplier,
    }


class _SG2Trunk(nn.Module):
    """StyleGAN2-D conv trunk down to 4x4 (the `self.convs` of the reference
    Discriminator subclasses, stylesdf_model.py:1541-1596)."""

    input_size: int = 256
    channel_multiplier: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from e3dge_tpu.models.discriminator import DiscResBlock
        from e3dge_tpu.models.layers import ConvLayer

        channels = _sg2_channels(self.channel_multiplier)
        out = ConvLayer(channels[self.input_size], 1, name="convs_0")(x)
        log_size = int(math.log2(self.input_size))
        for n, i in enumerate(range(log_size, 2, -1)):
            out = DiscResBlock(channels[2 ** (i - 1)], name=f"convs_{n + 1}")(out)
        return out  # [B, 512, 4, 4]


class StyleGANEncoder(nn.Module):
    """Legacy D-backbone decoder-latent encoder (reference stylesdf_model.py:
    1620-1679): SG2-D trunk + minibatch stddev + final conv + 2-layer EqualLinear
    head -> [B, 2*n_latent, 512] decoder W+ codes. Dormant alt-config
    (OldEncoder path, encoders/__init__.py:29-33)."""

    cfg: EncoderConfig
    input_size: int = 256
    channel_multiplier: int = 2
    stddev_group: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False, return_featmap: bool = False):
        from e3dge_tpu.models.layers import ConvLayer, EqualLinear

        c = self.cfg
        style_dim = c.decoder_style_dim
        out = _SG2Trunk(self.input_size, self.channel_multiplier, name="trunk")(x)

        # minibatch stddev (stylesdf_model.py:1655-1668)
        b, ch, h, w = out.shape
        group = min(b, self.stddev_group)
        if b % group != 0:
            group = 3 if b % 3 == 0 else (2 if b % 2 == 0 else 1)
        y = out.reshape(group, -1, 1, ch, h, w)
        stddev = jnp.sqrt(jnp.var(y, axis=0) + 1e-8)
        stddev = jnp.mean(stddev, axis=(2, 3, 4), keepdims=True).squeeze(2)
        stddev = jnp.tile(stddev, (group, 1, h, w))
        out = jnp.concatenate([out, stddev], axis=1)

        out = ConvLayer(512, 3, name="final_conv")(out)
        out = out.reshape(b, -1)
        out = EqualLinear(512, activation=True, name="final_linear_0")(out)
        out = EqualLinear(style_dim * c.n_styles_decoder * 2, name="final_linear_1")(out)
        dec = out.reshape(b, -1, style_dim)
        if return_featmap:
            return {"pred_latents": [None, dec], "feat_maps": None, "p32": None}
        return [None, dec]


class DEncoder(nn.Module):
    """Legacy D-backbone joint encoder (reference stylesdf_model.py:1682-1739):
    SG2-D trunk + two 3x3 conv heads on the 4x4 map -> renderer W+ (n_pigan x 256)
    and decoder W+ (n_dec x 512). The reference's forward references an undefined
    `wplus_latents_pred_conv` (dead/broken alt-config); this is the working intent
    of its declared `renderer_latents_conv` / `stylegan_latents_conv` heads."""

    cfg: EncoderConfig
    input_size: int = 256
    channel_multiplier: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False, return_featmap: bool = False):
        from e3dge_tpu.models.layers import ConvLayer

        c = self.cfg
        out = _SG2Trunk(self.input_size, self.channel_multiplier, name="trunk")(x)
        b = out.shape[0]
        rend = ConvLayer(c.style_dim * c.n_styles_pigan, 3, downsample=True,
                         name="renderer_latents_conv")(out)
        dec = ConvLayer(c.decoder_style_dim * c.n_styles_decoder, 3, downsample=True,
                        name="stylegan_latents_conv")(out)
        rend = jnp.mean(rend, axis=(2, 3)).reshape(b, c.n_styles_pigan, c.style_dim)
        dec = jnp.mean(dec, axis=(2, 3)).reshape(b, c.n_styles_decoder, c.decoder_style_dim)
        if return_featmap:
            return {"pred_latents": [rend, dec], "feat_maps": None, "p32": None}
        return [rend, dec]


class FullEncoder(nn.Module):
    """Legacy composition (reference stylesdf_model.py:1742-1762): a thumb-image
    renderer-latent encoder + a full-image decoder-latent encoder."""

    cfg: EncoderConfig
    input_size: int = 256
    channel_multiplier: int = 2

    def setup(self):
        self.renderer_encoder = VolumeRenderDiscriminatorEncoder(self.cfg, name="renderer_encoder")
        self.stylegan_encoder = StyleGANEncoder(
            self.cfg, input_size=self.input_size, channel_multiplier=self.channel_multiplier,
            name="stylegan_encoder",
        )

    def __call__(self, imgs: jnp.ndarray, thumb_imgs: jnp.ndarray | None = None,
                 train: bool = False, return_featmap: bool = False):
        if thumb_imgs is None:
            from e3dge_tpu.models.e3dge import adaptive_avg_pool

            thumb_imgs = adaptive_avg_pool(imgs, 64)
        rend, _ = self.renderer_encoder(thumb_imgs)
        _, dec = self.stylegan_encoder(imgs)
        if return_featmap:
            return {"pred_latents": [rend, dec], "feat_maps": None, "p32": None}
        return [rend, dec]


ENCODERS = {
    "HybridGradualStyleEncoder_V2": HybridGradualStyleEncoderV2,
    "VolumeRenderDiscriminatorEncoder": VolumeRenderDiscriminatorEncoder,
    "HybridBackboneEncoder": HybridBackboneEncoder,
    "BackboneEncoderRenderer": BackboneEncoderRenderer,
    "Encoder4Editing": Encoder4EditingHybrid,
    # reference factory name (encoders/__init__.py:25-28) for options_compat
    "Encoder4EditingHybridBaseline": Encoder4EditingHybrid,
    "VolumeStyleEncoder": VolumeStyleEncoder,
    "StyleGANEncoder": StyleGANEncoder,
    "DEncoder": DEncoder,
    "FullEncoder": FullEncoder,
}


def set_encoder(encoder_type: str, cfg: EncoderConfig, **kwargs) -> nn.Module:
    if encoder_type not in ENCODERS:
        raise KeyError(f"unknown encoder_type {encoder_type}; have {list(ENCODERS)}")
    return ENCODERS[encoder_type](cfg, **kwargs)
