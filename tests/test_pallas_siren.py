"""Parity test: fused Pallas SIREN kernel vs the flax SirenGenerator (interpret mode
on CPU; the same kernel compiles via Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from e3dge_tpu.models.siren import SirenGenerator
from e3dge_tpu.ops.pallas.siren_kernel import film_vectors, pack_siren_params, siren_query_fused


def test_fused_kernel_matches_flax():
    depth, width, style_dim = 3, 128, 16
    model = SirenGenerator(depth=depth, width=width, style_dim=style_dim)
    n = 300  # non-multiple of tile to exercise padding
    pts = jax.random.normal(jax.random.key(0), (1, n, 3))
    dirs = jax.random.normal(jax.random.key(1), (1, n, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    styles = jax.random.normal(jax.random.key(2), (1, depth + 1, style_dim))
    v = model.init(jax.random.key(3), pts, dirs, styles)

    want = model.apply(v, pts, dirs, styles)  # [1, n, 3+1+width]

    params = v["params"]
    pack = pack_siren_params(params, depth=depth, width=width)
    gamma, beta = film_vectors(params, styles[0], depth=depth)
    # precision="highest": bit-close to the flax formulation
    feat, rgb_sdf = siren_query_fused(
        pts[0], dirs[0], pack, gamma, beta, depth=depth, width=width, tile=128, precision="highest"
    )
    np.testing.assert_allclose(np.asarray(rgb_sdf[:, :3]), np.asarray(want[0, :, :3]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(rgb_sdf[:, 3]), np.asarray(want[0, :, 3]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(feat), np.asarray(want[0, :, 4:]), atol=2e-5)

    # default precision='high' (3-pass bf16): near-f32 on TPU; on the CPU
    # interpreter HIGH falls back to exact, so just bound it loosely here
    feat_b, rgb_sdf_b = siren_query_fused(
        pts[0], dirs[0], pack, gamma, beta, depth=depth, width=width, tile=128
    )
    np.testing.assert_allclose(np.asarray(feat_b), np.asarray(want[0, :, 4:]), atol=0.05)

    # 'serving' (bf16 matmuls + fast_sin) vs the flax field run in bf16 — the
    # SAME numerics class (FiLMSiren picks fast_sin for bf16 args); elementwise
    # equality vs f32 is impossible here because the FiLM gain (~30) amplifies
    # bf16 rounding into sin phase error, so bound the MEAN error like
    # tests/test_precision.py does for the XLA bf16 field.
    want16 = model.apply(
        v, pts.astype(jnp.bfloat16), dirs.astype(jnp.bfloat16), styles.astype(jnp.bfloat16)
    ).astype(jnp.float32)
    feat_s, rgb_sdf_s = siren_query_fused(
        pts[0], dirs[0], pack, gamma, beta, depth=depth, width=width, tile=128,
        precision="serving",
    )
    err = np.abs(np.asarray(feat_s) - np.asarray(want16[0, :, 4:]))
    assert err.mean() < 0.05, f"serving kernel drifted from the bf16 flax field: {err.mean():.4f}"


def test_fused_kernel_with_sft_conditions():
    depth, width, style_dim = 2, 128, 8
    model = SirenGenerator(depth=depth, width=width, style_dim=style_dim)
    n = 128
    pts = jax.random.normal(jax.random.key(0), (1, n, 3))
    dirs = jnp.zeros((1, n, 3))
    styles = jax.random.normal(jax.random.key(2), (1, depth + 1, style_dim))
    v = model.init(jax.random.key(3), pts, dirs, styles)
    alpha = 0.1 * jax.random.normal(jax.random.key(4), (1, n, width))
    lbeta = 0.1 * jax.random.normal(jax.random.key(5), (1, n, width))

    want = model.apply(v, pts, dirs, styles, (alpha, lbeta))

    pack = pack_siren_params(v["params"], depth=depth, width=width)
    gamma, beta = film_vectors(v["params"], styles[0], depth=depth)
    feat, rgb_sdf = siren_query_fused(
        pts[0], dirs[0], pack, gamma, beta, alpha[0], lbeta[0], depth=depth, width=width, tile=128, precision="highest"
    )
    # NOTE: conditions modulate the TEX branch only; sdf comes from unmodulated h in
    # the flax model. The kernel modulates before BOTH heads read h — so compare sdf
    # against the unconditioned reference.
    want_plain = model.apply(v, pts, dirs, styles)
    np.testing.assert_allclose(np.asarray(rgb_sdf[:, :3]), np.asarray(want[0, :, :3]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(feat), np.asarray(want[0, :, 4:]), atol=2e-5)
