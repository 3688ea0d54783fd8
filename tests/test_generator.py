"""Tests for the StyleGAN2 decoder, modulated conv, and full generator assembly."""

import jax
import jax.numpy as jnp
import numpy as np

from e3dge_tpu.models.decoder import Decoder
from e3dge_tpu.models.generator import Generator
from e3dge_tpu.models.layers import EqualLinear, ModulatedConv2d
from e3dge_tpu.render.camera import camera_params_from_angles
from e3dge_tpu.utils.config import tiny_test_config


def test_equal_linear_scale_semantics():
    model = EqualLinear(out_dim=8)
    x = jnp.ones((2, 4))
    v = model.init(jax.random.key(0), x)
    w = v["params"]["weight"]
    out = model.apply(v, x)
    want = x @ (np.asarray(w) / np.sqrt(4)).T  # scale = 1/sqrt(in_dim)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5)


def test_modulated_conv_demod_equivalence():
    """Input/output-scale formulation must equal explicit per-sample weights."""
    rng = np.random.RandomState(0)
    B, Cin, Cout, H, k = 2, 4, 6, 8, 3
    x = jnp.asarray(rng.randn(B, Cin, H, H).astype(np.float32))
    style = jnp.asarray(rng.randn(B, 5).astype(np.float32))
    model = ModulatedConv2d(Cout, k)
    v = model.init(jax.random.key(0), x, style)
    out = model.apply(v, x, style)

    # explicit per-sample grouped formulation (the reference's math)
    p = v["params"]
    w = np.asarray(p["weight"])  # [1, out, in, k, k]
    mod_w = np.asarray(p["modulation"]["weight"])
    mod_b = np.asarray(p["modulation"]["bias"])
    s = np.asarray(style) @ (mod_w / np.sqrt(5)).T + mod_b  # bias param is init'd to 1
    scale = 1.0 / np.sqrt(Cin * k * k)
    import torch

    wt = torch.from_numpy((scale * w * s[:, None, :, None, None]).astype(np.float32))
    demod = torch.rsqrt(wt.pow(2).sum([2, 3, 4]) + 1e-8)
    wt = wt * demod.reshape(B, Cout, 1, 1, 1)
    xt = torch.from_numpy(np.asarray(x)).reshape(1, B * Cin, H, H)
    want = torch.nn.functional.conv2d(
        xt, wt.reshape(B * Cout, Cin, k, k), padding=k // 2, groups=B
    ).reshape(B, Cout, H, H).numpy()
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-4, atol=2e-5)


def test_decoder_shapes_and_n_latent():
    cfg = tiny_test_config()
    model = Decoder(cfg.decoder)
    B = 2
    feats = jax.random.normal(jax.random.key(0), (B, cfg.decoder.in_channels, 8, 8))
    wplus = jax.random.normal(jax.random.key(1), (B, cfg.decoder.n_latent, cfg.decoder.style_dim))
    assert cfg.decoder.n_latent == (5 - 3) * 2 + 2  # 32 from 8 -> 6 latents
    v = model.init({"params": jax.random.key(2), "noise": jax.random.key(3)}, feats, wplus, input_is_latent=True)
    img, _ = model.apply(v, feats, wplus, input_is_latent=True, rngs={"noise": jax.random.key(4)})
    assert img.shape == (B, 3, 32, 32)
    assert np.isfinite(np.asarray(img)).all()


def test_decoder_z_input_and_truncation():
    cfg = tiny_test_config()
    model = Decoder(cfg.decoder)
    z = jax.random.normal(jax.random.key(0), (2, cfg.renderer.style_dim))
    feats = jax.random.normal(jax.random.key(1), (2, cfg.decoder.in_channels, 8, 8))
    v = model.init({"params": jax.random.key(2), "noise": jax.random.key(3)}, feats, [z])
    img, _ = model.apply(v, feats, [z], rngs={"noise": jax.random.key(4)})
    assert img.shape == (2, 3, 32, 32)
    # truncation toward a mean latent changes the output smoothly
    mean = jnp.zeros((1, cfg.decoder.style_dim))
    img_t, _ = model.apply(
        v, feats, [z], truncation=0.5, truncation_latent=mean, rngs={"noise": jax.random.key(4)}
    )
    assert not np.allclose(np.asarray(img), np.asarray(img_t))


def test_generator_full_pipeline():
    cfg = tiny_test_config()
    model = Generator(cfg)
    B = 2
    cam = camera_params_from_angles(jnp.asarray([0.1, -0.1]), jnp.asarray([0.0, 0.05]), cfg.renderer.out_im_res)
    w_renderer = jax.random.normal(jax.random.key(0), (B, cfg.renderer.depth + 1, cfg.renderer.style_dim))
    w_decoder = jax.random.normal(jax.random.key(1), (B, cfg.decoder.n_latent, cfg.decoder.style_dim))
    v = model.init(
        {"params": jax.random.key(2), "noise": jax.random.key(3)},
        [w_renderer, w_decoder],
        cam,
        input_is_latent=True,
    )
    out = model.apply(
        v, [w_renderer, w_decoder], cam, input_is_latent=True, rngs={"noise": jax.random.key(4)}
    )
    assert out["gen_imgs"].shape == (B, 3, cfg.decoder.size, cfg.decoder.size)
    assert out["gen_thumb_imgs"].shape == (B, 3, cfg.renderer.out_im_res, cfg.renderer.out_im_res)
    assert np.isfinite(np.asarray(out["gen_imgs"])).all()


def test_generator_z_space_and_mean_latent():
    cfg = tiny_test_config()
    model = Generator(cfg)
    cam = camera_params_from_angles(jnp.asarray([0.0]), jnp.asarray([0.0]), cfg.renderer.out_im_res)
    z = jax.random.normal(jax.random.key(0), (1, cfg.renderer.style_dim))
    v = model.init({"params": jax.random.key(1), "noise": jax.random.key(2)}, [z], cam)
    out = model.apply(v, [z], cam, rngs={"noise": jax.random.key(3)})
    assert out["gen_imgs"].shape == (1, 3, cfg.decoder.size, cfg.decoder.size)

    r_mean, d_mean = model.apply(v, jax.random.key(5), 64, method=Generator.mean_latent)
    assert r_mean.shape == (1, cfg.renderer.style_dim)
    assert d_mean.shape == (1, cfg.decoder.style_dim)
