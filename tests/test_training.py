"""Tests for losses, the frozen-GAN sampler, and the stage-1/stage-2 train steps
(including an 8-device CPU-mesh data-parallel run)."""

import jax
import jax.numpy as jnp
import numpy as np

from e3dge_tpu.models.e3dge import E3DGE, LatentMeans
from e3dge_tpu.parallel.mesh import make_mesh, replicate
from e3dge_tpu.training import losses as L
from e3dge_tpu.training.steps import (
    STAGE1_TRAINABLE,
    STAGE22_TRAINABLE,
    create_train_state,
    make_cycle_step,
    make_optimizer,
    make_stage1_step,
    swap_tree,
)
from e3dge_tpu.utils.config import tiny_full_config, tiny_test_config


def _mean_latents(cfg):
    return LatentMeans(
        renderer=jnp.zeros((1, cfg.renderer.depth + 1, cfg.renderer.style_dim)),
        decoder=jnp.zeros((1, cfg.decoder.n_latent, cfg.decoder.style_dim)),
    )


def test_losses_basics():
    a = jnp.zeros((1, 3, 8, 8))
    b = jnp.ones((1, 3, 8, 8)) * 0.1
    assert float(L.mse(a, a)) == 0.0
    assert float(L.psnr(a, a)) > 100
    assert 0.99 < float(L.ssim(jnp.ones((1, 1, 16, 16)), jnp.ones((1, 1, 16, 16)))) <= 1.0
    # smooth l1 == 0.5*d^2 for small d
    np.testing.assert_allclose(float(L.smooth_l1(a, b)), 0.5 * 0.01, rtol=1e-5)
    # eikonal loss of unit-norm vectors is 0
    eik, _ = L.eikonal_loss(jnp.ones((4, 3)) / np.sqrt(3.0))
    np.testing.assert_allclose(float(eik), 0.0, atol=1e-6)


def test_swap_tree():
    x = jnp.arange(4)
    np.testing.assert_array_equal(np.asarray(swap_tree(x)), [1, 0, 3, 2])


def test_synthetic_sample():
    cfg = tiny_test_config()
    model = E3DGE(cfg)
    ml = _mean_latents(cfg)
    imgs = jnp.zeros((2, 3, cfg.pifu.load_size, cfg.pifu.load_size))
    v = model.init({"params": jax.random.key(0), "noise": jax.random.key(1)}, imgs, ml)
    batch = model.apply(v, jax.random.key(2), 2, 1.0, True, method=E3DGE.synthetic_sample, rngs={"noise": jax.random.key(3)})
    assert batch["images"].shape == (2, 3, cfg.decoder.size, cfg.decoder.size)
    assert batch["uniform_pts"].shape == (2, cfg.renderer.uniform_grid_sampling_num, 3)
    assert batch["latent_gt"].shape == (2, cfg.renderer.style_dim)
    # id-paired: entries 0 and 1 share a z -> same latent
    np.testing.assert_allclose(np.asarray(batch["latent_gt"][0]), np.asarray(batch["latent_gt"][1]))
    # uniform sdf within plausible scene scale
    assert np.abs(np.asarray(batch["uniform_sdf"])).max() < 10.0


def test_stage1_step_updates_encoder_only():
    cfg = tiny_test_config()
    model = E3DGE(cfg)
    ml = _mean_latents(cfg)
    imgs = jnp.zeros((2, 3, cfg.pifu.load_size, cfg.pifu.load_size))
    v = model.init({"params": jax.random.key(0), "noise": jax.random.key(1)}, imgs, ml)

    tx = make_optimizer(1e-3)
    state = create_train_state(v, STAGE1_TRAINABLE, tx)
    lambdas = dict(
        l2_lambda=1.0, latent_gt_lambda=1.0, shape_uniform_lambda=0.1,
        shape_surface_lambda=1.0, shape_normal_lambda=0.05, eikonal_lambda=0.1,
    )
    step = jax.jit(make_stage1_step(model, lambdas, tx), static_argnums=(3,))
    old_enc = jax.tree.map(lambda x: x.copy(), state.params["encoder"])
    old_gen = jax.tree.map(lambda x: x.copy(), state.frozen["generator"])
    state2, metrics = step(state, ml, jax.random.key(5), 2)

    assert np.isfinite(float(metrics["loss"]))
    # encoder moved
    moved = jax.tree.leaves(jax.tree.map(lambda a, b: jnp.any(a != b), old_enc, state2.params["encoder"]))
    assert any(bool(m) for m in moved)
    # generator untouched (frozen)
    same = jax.tree.leaves(jax.tree.map(lambda a, b: jnp.all(a == b), old_gen, state2.frozen["generator"]))
    assert all(bool(s) for s in same)


def test_cycle_step_runs():
    cfg = tiny_full_config()
    model = E3DGE(cfg)
    ml = _mean_latents(cfg)
    imgs = jnp.zeros((2, 3, cfg.pifu.load_size, cfg.pifu.load_size))
    v = model.init({"params": jax.random.key(0), "noise": jax.random.key(1)}, imgs, ml)
    tx = make_optimizer(1e-4)
    state = create_train_state(v, STAGE22_TRAINABLE, tx)
    lambdas = dict(l2_lambda=1.0, res_lambda=1.0)
    step = jax.jit(make_cycle_step(model, lambdas, tx), static_argnums=(3,))
    state2, metrics = step(state, ml, jax.random.key(5), 2)
    assert np.isfinite(float(metrics["loss"]))
    assert set(state2.params.keys()) == set(STAGE22_TRAINABLE)


def test_stage1_data_parallel_8dev_mesh():
    """Full stage-1 step over the virtual 8-device CPU mesh: replicated state,
    XLA-derived grad all-reduce."""
    assert jax.device_count() >= 8
    cfg = tiny_test_config()
    model = E3DGE(cfg)
    ml = _mean_latents(cfg)
    imgs = jnp.zeros((2, 3, cfg.pifu.load_size, cfg.pifu.load_size))
    v = model.init({"params": jax.random.key(0), "noise": jax.random.key(1)}, imgs, ml)
    tx = make_optimizer(1e-4)
    state = create_train_state(v, STAGE1_TRAINABLE, tx)

    mesh = make_mesh(8)
    state = replicate(state, mesh)
    ml_r = replicate(ml, mesh)
    lambdas = dict(l2_lambda=1.0, latent_gt_lambda=1.0, shape_uniform_lambda=0.1)
    step = jax.jit(make_stage1_step(model, lambdas, tx), static_argnums=(3,))
    state2, metrics = step(state, ml_r, jax.random.key(5), 8)
    assert np.isfinite(float(metrics["loss"]))


def test_volume_d_step():
    from e3dge_tpu.training.steps import make_volume_d_step

    cfg = tiny_test_config()
    model = E3DGE(cfg)
    ml = _mean_latents(cfg)
    imgs = jnp.zeros((2, 3, cfg.pifu.load_size, cfg.pifu.load_size))
    v = model.init({"params": jax.random.key(0), "noise": jax.random.key(1)}, imgs, ml)
    tx = make_optimizer(1e-4)
    state = create_train_state(v, ("volume_discriminator",), tx)
    step = jax.jit(make_volume_d_step(model, dict(r1=10.0, viewpoint_lambda=1.0), tx))
    res = cfg.renderer.out_im_res
    real = jax.random.normal(jax.random.key(2), (2, 3, res, res))
    fake = jax.random.normal(jax.random.key(3), (2, 3, res, res))
    vp = jax.random.normal(jax.random.key(4), (2, 2)) * 0.1
    state2, metrics = step(state, real, vp, fake)
    assert np.isfinite(float(metrics["d_loss"]))
    moved = jax.tree.leaves(
        jax.tree.map(lambda a, b: jnp.any(a != b), state.params, state2.params)
    )
    assert any(bool(m) for m in moved)
