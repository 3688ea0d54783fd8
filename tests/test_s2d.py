"""Phase-space (space-to-depth) op parity vs the standard full-res forms.

Every phase kernel is assembled from unchanged torch-layout weights, so outputs
must match the standard path to float-reassociation tolerance. These primitives
back the decoder's s2d tail (ops/space_to_depth.py docstring has the xprof
rationale)."""

import jax
import jax.numpy as jnp
import numpy as np

from e3dge_tpu.models.layers import conv2d_torch, conv_transpose2d_torch
from e3dge_tpu.ops.space_to_depth import (
    conv1x1_phase_kernel,
    conv3x3_phase_kernel,
    conv_transpose2x_blur_phase_kernel,
    d2s,
    s2d,
    s2d_noise,
    upsample2x_phases,
)
from e3dge_tpu.ops.upfirdn2d import blur, make_kernel, upsample2x

FIR = make_kernel([1, 3, 3, 1])


def test_s2d_roundtrip_and_order():
    x = jnp.arange(2 * 3 * 8 * 8, dtype=jnp.float32).reshape(2, 3, 8, 8)
    ph = s2d(x)
    assert ph.shape == (2, 12, 4, 4)
    np.testing.assert_array_equal(np.asarray(d2s(ph)), np.asarray(x))
    # phase-major order: channel (2a+b)*C + c holds pixel (2i+a, 2j+b)
    np.testing.assert_array_equal(np.asarray(ph[0, 1 * 3 + 2, 1, 1]), np.asarray(x[0, 2, 2, 3]))


def test_d2s_mxu_bit_exact():
    from e3dge_tpu.ops.space_to_depth import d2s_mxu

    key = jax.random.key(3)
    for dtype in (jnp.float32, jnp.bfloat16):
        ph = jax.random.normal(key, (2, 12, 4, 4), jnp.float32).astype(dtype)
        np.testing.assert_array_equal(
            np.asarray(d2s_mxu(ph), np.float32), np.asarray(d2s(ph), np.float32)
        )
    # gradient matches the reshape reference exactly (one-hot conv transpose)
    ph = jax.random.normal(key, (1, 8, 4, 4), jnp.float32)
    g_fast = jax.grad(lambda z: jnp.sum(jnp.sin(d2s_mxu(z))))(ph)
    g_ref = jax.grad(lambda z: jnp.sum(jnp.sin(d2s(z))))(ph)
    np.testing.assert_array_equal(np.asarray(g_fast), np.asarray(g_ref))


def test_s2d_strided_bit_exact():
    from e3dge_tpu.ops.space_to_depth import s2d_strided

    key = jax.random.key(5)
    for c in (1, 3):
        x = jax.random.normal(key, (2, c, 8, 6), jnp.float32)
        np.testing.assert_array_equal(np.asarray(s2d_strided(x)), np.asarray(s2d(x)))
        xb = x.astype(jnp.bfloat16)
        np.testing.assert_array_equal(
            np.asarray(s2d_strided(xb), np.float32), np.asarray(s2d(xb), np.float32)
        )


def test_conv3x3_phase_matches_full_res():
    o, i = 5, 4
    w = jax.random.normal(jax.random.key(0), (o, i, 3, 3))
    x = jax.random.normal(jax.random.key(1), (2, i, 16, 16))
    want = conv2d_torch(x, w, padding=1)
    got = d2s(conv2d_torch(s2d(x), conv3x3_phase_kernel(w), padding=1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_conv1x1_phase_matches_full_res():
    w = jax.random.normal(jax.random.key(0), (3, 6, 1, 1))
    x = jax.random.normal(jax.random.key(1), (2, 6, 8, 8))
    want = conv2d_torch(x, w)
    got = d2s(conv2d_torch(s2d(x), conv1x1_phase_kernel(w)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_conv_transpose_blur_phase_kernel():
    o, i = 4, 6
    w = jax.random.normal(jax.random.key(0), (o, i, 3, 3))  # [out, in, k, k]
    x = jax.random.normal(jax.random.key(1), (2, i, 8, 8))
    # standard path (ModulatedConv2d upsample branch, demod aside)
    w_t = jnp.transpose(w, (1, 0, 2, 3))
    ref = blur(conv_transpose2d_torch(x, w_t, stride=2), FIR, pad=(1, 1), upsample_factor=2)
    kern = conv_transpose2x_blur_phase_kernel(w, FIR)
    got_ph = jax.lax.conv_general_dilated(
        x, kern, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NCHW", "HWIO", "NCHW")
    )
    np.testing.assert_allclose(np.asarray(d2s(got_ph)), np.asarray(ref), atol=1e-4)


def test_upsample2x_phases():
    x = jax.random.normal(jax.random.key(2), (2, 3, 8, 8))
    want = s2d(upsample2x(x, FIR))
    got = upsample2x_phases(x, np.asarray(FIR))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_decoder_s2d_tail_matches_standard():
    """Full Decoder: s2d_min_res routes the top pyramid levels through phase
    space; outputs must match the standard path (same params, same rng noise
    stream) to reassociation tolerance."""
    import dataclasses

    from e3dge_tpu.models.decoder import Decoder
    from e3dge_tpu.utils.config import DecoderConfig

    cfg = DecoderConfig(size=64, style_dim=32, channel_base=32, channel_multiplier=1, in_res=8, in_channels=16)
    feats = jax.random.normal(jax.random.key(1), (2, 16, 8, 8))
    styles = 0.2 * jax.random.normal(jax.random.key(2), (2, cfg.n_latent, 32))

    dec = Decoder(cfg)
    v = dec.init({"params": jax.random.key(0), "noise": jax.random.key(3)}, feats, styles, input_is_latent=True)
    want, _ = dec.apply(v, feats, styles, input_is_latent=True, rngs={"noise": jax.random.key(4)})

    dec_ph = Decoder(dataclasses.replace(cfg, s2d_min_res=32))  # last 2 levels phased
    got, _ = dec_ph.apply(v, feats, styles, input_is_latent=True, rngs={"noise": jax.random.key(4)})
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)

    # the forward-only eval threshold (s2d_min_res_eval) is a pure re-bracketing
    # too: train calls keep s2d_min_res, eval calls use the eval threshold
    dec_ev = Decoder(dataclasses.replace(cfg, s2d_min_res=64, s2d_min_res_eval=32))
    got_ev, _ = dec_ev.apply(v, feats, styles, input_is_latent=True, rngs={"noise": jax.random.key(4)})
    np.testing.assert_allclose(np.asarray(got_ev), np.asarray(want), atol=2e-4)
    got_tr, _ = dec_ev.apply(v, feats, styles, input_is_latent=True, train=True, rngs={"noise": jax.random.key(4)})
    np.testing.assert_allclose(np.asarray(got_tr), np.asarray(want), atol=2e-4)


def test_s2d_noise_alignment():
    noise = jax.random.normal(jax.random.key(3), (2, 1, 8, 8))
    c = 5
    ph = s2d_noise(noise, c)
    assert ph.shape == (2, 4 * c, 4, 4)
    img_ph = s2d(jnp.zeros((2, c, 8, 8)))
    # adding phase noise then d2s == adding full-res noise broadcast over C
    full = d2s(img_ph + ph)
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(jnp.zeros((2, c, 8, 8)) + noise), atol=1e-6
    )
