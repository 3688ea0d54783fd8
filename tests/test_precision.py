"""Mixed-precision (bfloat16 conv-stack) tests.

The layers follow their INPUT dtype (f32 master params cast at use — see
models/layers.py header). Config `dtype` switches the encoder / hourglass /
decoder activation carriers to bf16; these tests pin (a) the f32 path is exactly
the old numerics, (b) bf16 outputs track f32 within bf16 tolerance, (c) the full
tiny pipeline runs finite end-to-end in bf16.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from e3dge_tpu.models.e3dge import E3DGE, LatentMeans


def test_equal_linear_dtype_follows_input():
    from e3dge_tpu.models.layers import EqualLinear

    m = EqualLinear(8)
    v = m.init(jax.random.key(0), jnp.zeros((2, 4)))
    x = jax.random.normal(jax.random.key(1), (2, 4))
    out32 = m.apply(v, x)
    out16 = m.apply(v, x.astype(jnp.bfloat16))
    assert out32.dtype == jnp.float32
    assert out16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out16, np.float32), np.asarray(out32), rtol=0.05, atol=0.05
    )


def test_modulated_conv_bf16_tracks_f32():
    from e3dge_tpu.models.layers import ModulatedConv2d

    m = ModulatedConv2d(8, 3)
    x = jax.random.normal(jax.random.key(1), (2, 4, 8, 8))
    s = jax.random.normal(jax.random.key(2), (2, 16))
    v = m.init(jax.random.key(0), x, s)
    out32 = m.apply(v, x, s)
    out16 = m.apply(v, x.astype(jnp.bfloat16), s.astype(jnp.bfloat16))
    assert out16.dtype == jnp.bfloat16
    scale = float(jnp.abs(out32).max())
    np.testing.assert_allclose(
        np.asarray(out16, np.float32) / scale, np.asarray(out32) / scale, atol=0.05
    )


def test_decoder_bf16_tracks_f32(tiny_full_setup):
    """Decoder output in bf16 stays close to f32 (image range [-1, 1])."""
    cfg, model, v, ml = tiny_full_setup
    from e3dge_tpu.models.decoder import Decoder

    dec = Decoder(cfg.decoder)
    feats = jax.random.normal(jax.random.key(1), (1, cfg.decoder.in_channels, cfg.decoder.in_res, cfg.decoder.in_res))
    styles = jax.random.normal(jax.random.key(2), (1, cfg.decoder.n_latent, cfg.decoder.style_dim)) * 0.1
    dv = dec.init({"params": jax.random.key(0), "noise": jax.random.key(3)}, feats, styles, input_is_latent=True)

    def run(f):
        out, _ = dec.apply(dv, f, styles, input_is_latent=True, rngs={"noise": jax.random.key(4)})
        return out

    out32 = run(feats)
    out16 = run(feats.astype(jnp.bfloat16))
    assert out16.dtype == jnp.bfloat16
    scale = float(jnp.abs(out32).max()) + 1e-6
    err = np.abs(np.asarray(out16, np.float32) - np.asarray(out32)) / scale
    assert err.mean() < 0.02, f"bf16 decoder drifted: mean rel err {err.mean():.4f}"


def test_pipeline_bf16_end_to_end(tiny_full_setup):
    """Full image2image with config dtype=bfloat16: finite f32 outputs, close to
    the f32 render."""
    import dataclasses

    cfg, model, v, ml = tiny_full_setup
    cfg16 = dataclasses.replace(cfg, dtype="bfloat16")
    model16 = E3DGE(cfg16)
    imgs = jax.random.normal(jax.random.key(1), (2, 3, cfg.pifu.load_size, cfg.pifu.load_size)) * 0.3

    def run(m):
        # jitted: eager full-pipeline dispatch was ~25s/run on the 1-core host;
        # the compiled graph persists in tests/.jax_cache (suite-runtime item)
        fn = jax.jit(lambda vv, ii, mm: m.apply(
            vv, ii, mm, method=E3DGE.image2image, rngs={"noise": jax.random.key(2)}))
        return fn(v, imgs, ml)["res_render_out"]["gen_imgs"]

    out32 = run(model)
    out16 = run(model16)
    assert out16.dtype == jnp.float32  # cast back at the generator boundary
    assert np.isfinite(np.asarray(out16)).all()
    scale = float(jnp.abs(out32).max()) + 1e-6
    err = np.abs(np.asarray(out16) - np.asarray(out32)) / scale
    assert err.mean() < 0.05, f"bf16 pipeline drifted: mean rel err {err.mean():.4f}"


def test_field_bf16_close_to_f32(tiny_full_setup):
    """renderer field_dtype=bfloat16: the SIREN query runs in bf16 (raw_h cache
    included), integration stays f32, and the render stays close to the f32 field."""
    import dataclasses

    from e3dge_tpu.utils.config import _with

    cfg, model, v, ml = tiny_full_setup
    cfg16 = _with(dataclasses.replace(cfg), renderer=dict(field_dtype="bfloat16")).validate()
    model16 = E3DGE(cfg16)
    imgs = jax.random.normal(jax.random.key(3), (2, 3, cfg.pifu.load_size, cfg.pifu.load_size)) * 0.3

    def run(m):
        fn = jax.jit(lambda vv, ii, mm: m.apply(
            vv, ii, mm, method=E3DGE.image2image, rngs={"noise": jax.random.key(2)}))
        out = fn(v, imgs, ml)
        return out["res_render_out"]["gen_imgs"], out["ref_info"]["global_render_out"]

    out32, g32 = run(model)
    out16, g16 = run(model16)
    assert g16["raw_h"].dtype == jnp.bfloat16  # cached backbone hidden in field dtype
    assert g16["sdf"].dtype == jnp.float32     # integration inputs cast back
    assert out16.dtype == jnp.float32
    assert np.isfinite(np.asarray(out16)).all()
    scale = float(jnp.abs(out32).max()) + 1e-6
    err = np.abs(np.asarray(out16) - np.asarray(out32)) / scale
    assert err.mean() < 0.05, f"bf16 field drifted: mean rel err {err.mean():.4f}"


@pytest.mark.slow
def test_stage1_step_bf16_field_tracks_f32(tiny_test_setup):
    """field_dtype=bfloat16 under AUTODIFF (scripts/train.py --field-dtype): the
    differentiated bf16+fast_sin field (3.1x faster backward on v5e, bench_field
    --grad) produces a finite step whose loss tracks the f32 field, and the
    encoder grads stay finite. Reference numerics stay the f32 default."""
    import dataclasses

    from e3dge_tpu.training.steps import (
        STAGE1_TRAINABLE,
        create_train_state,
        make_optimizer,
        make_stage1_step,
    )
    from e3dge_tpu.utils.config import _with

    cfg, model, v, ml = tiny_test_setup
    cfg16 = _with(dataclasses.replace(cfg), renderer=dict(field_dtype="bfloat16")).validate()
    model16 = E3DGE(cfg16)
    tx = make_optimizer(1e-3)
    lambdas = dict(l2_lambda=1.0, latent_gt_lambda=1.0, shape_uniform_lambda=0.1)

    losses = {}
    for name, m in (("f32", model), ("bf16", model16)):
        state = create_train_state(v, STAGE1_TRAINABLE, tx)
        step = jax.jit(make_stage1_step(m, lambdas, tx), static_argnums=(3,))
        state2, metrics = step(state, ml, jax.random.key(5), 2)
        losses[name] = float(metrics["loss"])
        assert np.isfinite(losses[name])
        finite = jax.tree.leaves(
            jax.tree.map(lambda x: bool(jnp.isfinite(x).all()), state2.params["encoder"])
        )
        assert all(finite)
    assert abs(losses["bf16"] - losses["f32"]) / (abs(losses["f32"]) + 1e-6) < 0.15, losses


@pytest.mark.slow
def test_cycle_step_bf16_field_tracks_f32(tiny_full_setup):
    """field_dtype=bfloat16 in the CYCLE step: the bf16 differentiated field AND
    the bf16 fusion/modulation path (feature_2d/3d/vis_mask/PE cast at the field
    boundary now applies under train=True too) produce a finite step whose loss
    tracks f32. The fusion MLPs are stage-2.2 TRAINABLES — this also pins that
    their bf16-input grads stay finite (master params f32)."""
    import dataclasses

    from e3dge_tpu.training.steps import (
        STAGE22_TRAINABLE,
        create_train_state,
        make_cycle_step,
        make_optimizer,
    )
    from e3dge_tpu.utils.config import _with

    cfg, model, v, ml = tiny_full_setup
    cfg16 = _with(dataclasses.replace(cfg), renderer=dict(field_dtype="bfloat16")).validate()
    model16 = E3DGE(cfg16)
    tx = make_optimizer(1e-4)
    lambdas = dict(l2_lambda=1.0, res_lambda=1.0)

    losses = {}
    for name, m in (("f32", model), ("bf16", model16)):
        state = create_train_state(v, STAGE22_TRAINABLE, tx)
        step = jax.jit(make_cycle_step(m, lambdas, tx), static_argnums=(3,))
        state2, metrics = step(state, ml, jax.random.key(5), 2)
        losses[name] = float(metrics["loss"])
        assert np.isfinite(losses[name])
        finite = jax.tree.leaves(
            jax.tree.map(lambda x: bool(jnp.isfinite(x).all()), state2.params)
        )
        assert all(finite)
    assert abs(losses["bf16"] - losses["f32"]) / (abs(losses["f32"]) + 1e-6) < 0.15, losses
