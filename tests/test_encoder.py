"""Tests for the E0 FPN encoder and discriminators."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from e3dge_tpu.models.discriminator import Discriminator, VolumeRenderDiscriminator
from e3dge_tpu.models.encoders.fpn import HybridGradualStyleEncoderV2, get_blocks
from e3dge_tpu.utils.config import tiny_test_config


def test_get_blocks_layout():
    blocks = get_blocks(50)
    assert len(blocks) == 3 + 4 + 14 + 3  # == 24 units
    # taps used by the FPN sit at the group boundaries (fpn_encoders.py:384-391)
    assert blocks[2].depth == 64 and blocks[6].depth == 128
    assert blocks[20].depth == 256 and blocks[23].depth == 512
    # strides: 2 at each group start
    assert [b.stride for b in blocks[:4]] == [2, 1, 1, 2]


def test_encoder_outputs():
    cfg = tiny_test_config()
    model = HybridGradualStyleEncoderV2(cfg.encoder)
    x = jax.random.normal(jax.random.key(0), (2, 3, cfg.encoder.input_res, cfg.encoder.input_res))
    v = model.init(jax.random.key(1), x)
    thumb, stylegan = model.apply(v, x)
    assert thumb.shape == (2, cfg.encoder.n_styles_pigan, cfg.encoder.style_dim)
    assert stylegan.shape == (2, cfg.encoder.n_styles_decoder, cfg.encoder.decoder_style_dim)
    # single_decoder_layer: all 10 decoder rows identical
    np.testing.assert_allclose(np.asarray(stylegan[:, 0]), np.asarray(stylegan[:, 5]))

    out = model.apply(v, x, return_featmap=True)
    assert out["feat_maps"].shape[1] == 512  # p64 pyramid channels
    assert out["p32"].shape[1] == 512


def test_encoder_train_mode_updates_batch_stats():
    cfg = tiny_test_config()
    model = HybridGradualStyleEncoderV2(cfg.encoder)
    x = jax.random.normal(jax.random.key(0), (2, 3, cfg.encoder.input_res, cfg.encoder.input_res))
    v = model.init(jax.random.key(1), x)
    _, mut = model.apply(v, x, train=True, mutable=["batch_stats"])
    assert "batch_stats" in mut


def test_volume_discriminator_pose_head():
    model = VolumeRenderDiscriminator(init_size=8)
    x = jax.random.normal(jax.random.key(0), (2, 3, 8, 8))
    v = model.init(jax.random.key(1), x)
    gan, view = model.apply(v, x)
    assert gan.shape == (2, 1)
    assert view.shape == (2, 2)  # (azim, elev) regression = pose estimator


@pytest.mark.slow
def test_legacy_dbackbone_encoders():
    """StyleGANEncoder / DEncoder / FullEncoder (reference stylesdf_model.py:
    1620-1762 legacy alt-configs) produce the W+ shapes the runners expect."""
    import jax
    import jax.numpy as jnp

    from e3dge_tpu.models.encoders.factory import DEncoder, FullEncoder, StyleGANEncoder, set_encoder
    from e3dge_tpu.utils.config import tiny_test_config

    cfg = tiny_test_config().encoder
    x = jnp.zeros((2, 3, 32, 32))

    enc = StyleGANEncoder(cfg, input_size=32, channel_multiplier=1)
    v = enc.init(jax.random.key(0), x)
    none_r, dec = enc.apply(v, x)
    assert none_r is None
    assert dec.shape == (2, 2 * cfg.n_styles_decoder, cfg.decoder_style_dim)

    enc2 = DEncoder(cfg, input_size=32, channel_multiplier=1)
    v2 = enc2.init(jax.random.key(0), x)
    rend, dec = enc2.apply(v2, x)
    assert rend.shape == (2, cfg.n_styles_pigan, cfg.style_dim)
    assert dec.shape == (2, cfg.n_styles_decoder, cfg.decoder_style_dim)

    # FullEncoder composes thumb + full-image encoders; also reachable by factory name
    full = set_encoder("FullEncoder", cfg, input_size=32, channel_multiplier=1)
    assert isinstance(full, FullEncoder)
    thumb = jnp.zeros((2, 3, 64, 64))
    v3 = full.init(jax.random.key(0), x, thumb)
    rend, dec = full.apply(v3, x, thumb)
    assert rend.shape == (2, cfg.n_styles_pigan, cfg.style_dim)
    assert dec.shape[0] == 2 and dec.shape[2] == cfg.decoder_style_dim


def test_full_discriminator():
    model = Discriminator(input_size=32, channel_base=32, channel_multiplier=1)
    x = jax.random.normal(jax.random.key(0), (4, 3, 32, 32))
    v = model.init(jax.random.key(1), x)
    out = model.apply(v, x)
    assert out.shape == (4, 1)
    assert np.isfinite(np.asarray(out)).all()
