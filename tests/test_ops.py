"""Golden tests for the L0 numeric primitives.

upfirdn2d is checked against an independent numpy step-by-step model; grid_sample is
checked against torch.nn.functional.grid_sample (CPU), which defines the semantics the
reference relies on (`op/grid_sample_gradfix.py`: bilinear, zeros, align_corners=False).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e3dge_tpu.ops import (
    downsample2x,
    fused_leaky_relu,
    grid_sample,
    interpolate_bilinear,
    make_kernel,
    pos_encoding,
    upfirdn2d,
    upsample2x,
)
from e3dge_tpu.ops.upfirdn2d import upfirdn2d_ref


@pytest.mark.parametrize(
    "up,down,pad",
    [
        (1, 1, (1, 1)),
        (2, 1, (2, 1)),
        (1, 2, (1, 1)),
        (2, 2, (3, 2)),
        (1, 1, (0, 0)),
        (1, 1, (-1, 2)),  # negative pad = crop
    ],
)
def test_upfirdn2d_matches_numpy_golden(up, down, pad):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 9, 11).astype(np.float32)
    k = np.asarray(make_kernel([1, 3, 3, 1]))
    want = upfirdn2d_ref(x, k, up=up, down=down, pad=pad)
    got = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(k), up=up, down=down, pad=pad))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_upfirdn2d_asymmetric_factors():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 2, 6, 5).astype(np.float32)
    k = rng.rand(3, 4).astype(np.float32)
    want = upfirdn2d_ref(x, k, up=(2, 1), down=(1, 2), pad=(1, 2, 2, 1))
    got = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(k), up=(2, 1), down=(1, 2), pad=(1, 2, 2, 1)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_up_down_roundtrip_shapes():
    x = jnp.ones((1, 4, 16, 16))
    k = make_kernel([1, 3, 3, 1])
    up = upsample2x(x, k)
    assert up.shape == (1, 4, 32, 32)
    down = downsample2x(up, k)
    assert down.shape == (1, 4, 16, 16)
    # DC gain 1: constant input stays (approximately) constant away from borders.
    np.testing.assert_allclose(np.asarray(up)[0, 0, 8:24, 8:24], 1.0, rtol=1e-5)


def test_grid_sample_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(2)
    x = rng.randn(2, 3, 7, 9).astype(np.float32)
    grid = (rng.rand(2, 5, 6, 2).astype(np.float32) * 2.4) - 1.2  # include out-of-range
    want = torch.nn.functional.grid_sample(
        torch.from_numpy(x),
        torch.from_numpy(grid),
        mode="bilinear",
        padding_mode="zeros",
        align_corners=False,
    ).numpy()
    got = np.asarray(grid_sample(jnp.asarray(x), jnp.asarray(grid)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_grid_sample_mm_matches_gather():
    # one-hot sampling-matrix matmul form (MXU lowering of the pixel-aligned
    # query; backward is a matmul instead of a scatter-add): same zeros-padding
    # align_corners=False semantics as grid_sample, tolerance-equal values and
    # feature-map gradients. Chunking (chunk < N) must not change anything.
    from e3dge_tpu.ops import grid_sample_mm

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 3, 7, 9).astype(np.float32))
    grid = jnp.asarray((rng.rand(2, 50, 1, 2).astype(np.float32) * 2.4) - 1.2)

    want = np.asarray(grid_sample(x, grid))
    got = np.asarray(grid_sample_mm(x, grid))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    got_chunked = np.asarray(grid_sample_mm(x, grid, chunk=16))
    np.testing.assert_allclose(got_chunked, want, rtol=1e-4, atol=1e-5)

    # gradient wrt the FEATURE MAP (the cycle step's trained tensor): the mm
    # backward M^T @ ct must equal the gather form's scatter-add
    ct = jnp.asarray(rng.randn(2, 3, 50, 1).astype(np.float32))
    g_gather = jax.vjp(lambda q: grid_sample(q, grid), x)[1](ct)[0]
    g_mm = jax.vjp(lambda q: grid_sample_mm(q, grid, chunk=16), x)[1](ct)[0]
    np.testing.assert_allclose(np.asarray(g_mm), np.asarray(g_gather), rtol=1e-4, atol=1e-5)


def test_query_features_auto_mode_picks_mm_only_for_large_bf16():
    # "auto" must keep the exact gather for f32 maps and small point counts and
    # switch to the matmul form only for bf16 maps at N >= 4*Hf*Wf — where the
    # two forms are bf16-tolerance equal.
    from e3dge_tpu.models.pifu.local_net import query_features

    rng = np.random.RandomState(6)
    feat = jnp.asarray(rng.randn(1, 4, 4, 4).astype(np.float32))
    n = 4 * 16
    pts = jnp.asarray(rng.randn(1, 3, n).astype(np.float32) * 0.05)
    calibs = jnp.eye(4)[None]

    gather = query_features(feat, pts, calibs, sample_mode="gather")
    auto_f32 = query_features(feat, pts, calibs, sample_mode="auto")
    np.testing.assert_array_equal(np.asarray(auto_f32["feats"]), np.asarray(gather["feats"]))

    feat16 = feat.astype(jnp.bfloat16)
    auto_bf16 = query_features(feat16, pts, calibs, sample_mode="auto")
    mm_bf16 = query_features(feat16, pts, calibs, sample_mode="mm")
    np.testing.assert_array_equal(
        np.asarray(auto_bf16["feats"], np.float32), np.asarray(mm_bf16["feats"], np.float32)
    )
    np.testing.assert_allclose(
        np.asarray(auto_bf16["feats"], np.float32),
        np.asarray(gather["feats"]),
        atol=0.05,
    )


def test_grid_sample_higher_order_grads():
    # The whole reason grid_sample_gradfix exists in the reference: second-order
    # gradients through the sample op (eikonal-through-feature-lookup).
    x = jnp.arange(16.0).reshape(1, 1, 4, 4)

    def f(g):
        grid = g.reshape(1, 1, 1, 2)
        return grid_sample(x, grid).sum()

    g = jnp.asarray([0.1, 0.2])
    jax.grad(f)(g)  # first order
    hess = jax.hessian(f)(g)  # second order must not raise
    assert hess.shape == (2, 2)


def test_interpolate_bilinear_matches_torch_align_corners():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(3)
    x = rng.randn(1, 2, 5, 7).astype(np.float32)
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=(9, 13), mode="bilinear", align_corners=True
    ).numpy()
    got = np.asarray(interpolate_bilinear(jnp.asarray(x), (9, 13), align_corners=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_interpolate_bicubic_matches_torch():
    """Golden vs torch F.interpolate(mode='bicubic') — the reference hourglass
    upsample (HGFilters.py:58-61, align_corners=True, 2x), plus odd sizes and
    both align modes / downscale."""
    torch = pytest.importorskip("torch")
    from e3dge_tpu.ops import interpolate_bicubic

    rng = np.random.RandomState(5)
    for (h, w), (ho, wo), ac in [
        ((8, 8), (16, 16), True),    # the hourglass 2x case
        ((5, 7), (9, 13), True),
        ((5, 7), (9, 13), False),
        ((12, 10), (6, 5), True),    # downscale
    ]:
        x = rng.randn(2, 3, h, w).astype(np.float32)
        want = torch.nn.functional.interpolate(
            torch.from_numpy(x), size=(ho, wo), mode="bicubic", align_corners=ac
        ).numpy()
        got = np.asarray(interpolate_bicubic(jnp.asarray(x), (ho, wo), align_corners=ac))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5, err_msg=f"{(h,w)}->{(ho,wo)} ac={ac}")


def test_fused_leaky_relu_matches_definition():
    rng = np.random.RandomState(4)
    x = rng.randn(2, 5, 3, 3).astype(np.float32)
    b = rng.randn(5).astype(np.float32)
    got = np.asarray(fused_leaky_relu(jnp.asarray(x), jnp.asarray(b)))
    xb = x + b.reshape(1, 5, 1, 1)
    want = np.where(xb >= 0, xb, 0.2 * xb) * np.sqrt(2.0)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_pos_encoding_dims_and_values():
    x = jnp.asarray([[0.5, -0.25, 1.0]])
    out = pos_encoding(x, n_freqs=7)
    assert out.shape == (1, 45)  # 3 * (2*7 + 1), the reference's 45-dim PE
    np.testing.assert_allclose(np.asarray(out[0, :3]), np.asarray(x[0]))
    np.testing.assert_allclose(np.asarray(out[0, 3:6]), np.sin(np.asarray(x[0])), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out[0, 6:9]), np.cos(np.asarray(x[0])), rtol=1e-6)


def test_fused_fir_upsample_matches_two_pass():
    """conv_transpose(stride 2) + FIR blur == one lhs-dilated conv with the
    composed kernel (reference upsample ModulatedConv2d + Blur,
    stylesdf_model.py:328-344; fused form in ops/upfirdn2d.py)."""
    from e3dge_tpu.models.layers import conv_transpose2d_torch
    from e3dge_tpu.ops.upfirdn2d import blur, conv2d_up_fused, fuse_fir_upsample, make_kernel

    rng = np.random.RandomState(11)
    fir = make_kernel([1, 3, 3, 1])
    for k in (3, 1):
        x = jnp.asarray(rng.randn(2, 5, 8, 8).astype(np.float32))
        w = jnp.asarray(rng.randn(7, 5, k, k).astype(np.float32))  # [out, in, k, k]
        y = conv_transpose2d_torch(x, jnp.transpose(w, (1, 0, 2, 3)), stride=2)
        p = (4 - 2) - (k - 1)
        want = blur(y, fir, pad=((p + 1) // 2 + 1, p // 2 + 1), upsample_factor=2)
        g, pad = fuse_fir_upsample(w, fir, gain=4.0)
        got = conv2d_up_fused(x, g, pad)
        assert got.shape == want.shape == (2, 7, 16, 16)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_fast_sin_accuracy_and_dtype():
    """Polynomial sin (ops/fast_math.py): ~1e-6 accurate over the FiLM-SIREN
    argument range, preserves dtype, and differentiates."""
    from e3dge_tpu.ops.fast_math import fast_sin

    x = jnp.asarray(np.random.RandomState(5).uniform(-60, 60, (100000,)).astype(np.float32))
    err = np.abs(np.asarray(fast_sin(x)) - np.sin(np.asarray(x)))
    assert err.max() < 1e-5, err.max()
    xb = x.astype(jnp.bfloat16)
    out = fast_sin(xb)
    assert out.dtype == jnp.bfloat16
    # bf16 path stays within bf16 quantization of the true sine
    errb = np.abs(np.asarray(out, np.float32) - np.sin(np.asarray(xb, np.float32)))
    assert errb.max() < 1e-2
    g = jax.grad(lambda v: fast_sin(v).sum())(jnp.asarray([0.3, 2.0]))
    np.testing.assert_allclose(np.asarray(g), np.cos([0.3, 2.0]), atol=1e-4)


def test_phased_upsample_conv_matches_two_pass():
    """conv_transpose(stride 2, k=3) + FIR blur == 4*O-channel stride-1 conv +
    depth-to-space (manual phase decomposition, ops/upfirdn2d.py — kept as a
    documented primitive; the two-pass form is faster on v5e)."""
    from e3dge_tpu.models.layers import conv_transpose2d_torch
    from e3dge_tpu.ops.upfirdn2d import blur, conv_transpose2x_blur_phased, make_kernel

    rng = np.random.RandomState(13)
    x = jnp.asarray(rng.randn(2, 5, 8, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(7, 5, 3, 3).astype(np.float32))
    fir = make_kernel([1, 3, 3, 1])
    y = conv_transpose2d_torch(x, jnp.transpose(w, (1, 0, 2, 3)), stride=2)
    want = blur(y, fir, pad=(1, 1), upsample_factor=2)
    got = conv_transpose2x_blur_phased(x, w, fir, gain=4.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)
