"""Tests for the E1 local branch: hourglass filter, pixel-aligned query, ADA aligner,
SFT fusion, and modulation head zero-init."""

import jax
import jax.numpy as jnp
import numpy as np

from e3dge_tpu.models.align import FuseSftMLP, ResidualAligner, ResnetBlockFC
from e3dge_tpu.models.pifu.hourglass import HGFilter
from e3dge_tpu.models.pifu.local_net import LocalFeatureNet, query_features
from e3dge_tpu.render.camera import camera_params_from_angles
from e3dge_tpu.utils.config import tiny_test_config


def test_hgfilter_shapes():
    model = HGFilter(num_stack=2, num_hourglass=1, hourglass_dim=16)
    x = jax.random.normal(jax.random.key(0), (1, 8, 32, 32))
    v = model.init(jax.random.key(1), x)
    out = model.apply(v, x)
    assert out.shape == (1, 16, 8, 8)  # H/4, hourglass_dim channels
    outs = model.apply(v, x, return_all_stacks=True)
    assert len(outs) == 2


def test_query_features_interpolation():
    # a constant feature map must sample to that constant for in-image points
    cam = camera_params_from_angles(jnp.asarray([0.0]), jnp.asarray([0.0]), 64)
    im_feat = jnp.full((1, 4, 16, 16), 2.5)
    # points near the origin project inside the image
    pts = jnp.zeros((1, 3, 10)) + jnp.asarray([0.01, -0.02, 0.03]).reshape(1, 3, 1)
    out = query_features(im_feat, pts, cam.calibs)
    assert out["feats"].shape == (1, 4, 10)
    np.testing.assert_allclose(np.asarray(out["feats"]), 2.5, rtol=1e-5)
    assert np.asarray(out["in_img"]).all()
    # depth condition ~ 1 * 128 / 1.12
    np.testing.assert_allclose(np.asarray(out["z_condition"]).mean(), 128 / 1.12, rtol=0.05)


def test_local_net_end_to_end_and_zero_init_modulations():
    cfg = tiny_test_config()
    model = LocalFeatureNet(cfg.pifu, modulation_width=cfg.renderer.width, local_feats_dim=cfg.pifu.hourglass_dim + 45)
    res_img = jax.random.normal(jax.random.key(0), (1, 3, 32, 32))
    depth = jax.random.normal(jax.random.key(1), (1, 1, 32, 32))
    cam = camera_params_from_angles(jnp.asarray([0.0]), jnp.asarray([0.0]), 32)
    pts = 0.05 * jax.random.normal(jax.random.key(2), (1, 3, 7))
    v = model.init(jax.random.key(3), res_img, depth, pts, cam.calibs)
    out = model.apply(v, res_img, depth, pts, cam.calibs)
    assert out["feats"].shape == (1, cfg.pifu.hourglass_dim, 7)

    # modulation head is zero-init: alpha = beta = 0 -> SFT is identity at init
    feats = jax.random.normal(jax.random.key(4), (2, 5, cfg.pifu.hourglass_dim + 45))
    alpha, beta = model.apply(v, feats, method=LocalFeatureNet.tex_modulations)
    np.testing.assert_allclose(np.asarray(alpha), 0.0)
    np.testing.assert_allclose(np.asarray(beta), 0.0)
    assert alpha.shape == (2, 5, cfg.renderer.width)


def test_local_net_bn_variant():
    """HGPIFuNetGANResidual variant (reference HGPIFuGANNetResidualInput.py:19-103):
    BatchNorm context convs + zero-init EqualLinear tex head; ingestion covers it."""
    import jax

    from e3dge_tpu.models.pifu.local_net import LocalFeatureNet
    from e3dge_tpu.utils.config import tiny_full_config
    from e3dge_tpu.utils.torch_ckpt import flatten_tree, flax_path_to_torch

    cfg = tiny_full_config()
    net = LocalFeatureNet(
        cfg.pifu,
        modulation_width=cfg.renderer.width,
        local_feats_dim=cfg.renderer.residual_local_feats_dim,
        variant="bn",
    )
    res = jnp.zeros((2, 3, cfg.pifu.load_size, cfg.pifu.load_size))
    dep = jnp.zeros((2, 1, cfg.pifu.load_size, cfg.pifu.load_size))
    pts = jnp.zeros((2, 3, 5))
    calibs = jnp.tile(jnp.eye(4)[None], (2, 1, 1))
    v = net.init(jax.random.key(0), res, dep, pts, calibs)
    assert "batch_stats" in v  # BN running stats exist
    # tex head is the zero-init EqualLinear
    head = v["params"]["local_feat_to_tex_modulations"]
    assert set(head.keys()) == {"weight", "bias"}
    assert float(jnp.abs(head["weight"]).max()) == 0.0
    # forward works in train mode (mutable batch stats)
    out, mutated = net.apply(
        v, res, dep, True, method=LocalFeatureNet.filter, mutable=["batch_stats"]
    )
    assert out.shape[1] == cfg.pifu.hourglass_dim
    # every leaf (incl. BN stats + EqualLinear head) has an ingestion rule
    flat = flatten_tree({"params": {"local": v["params"]}, "batch_stats": {"local": v["batch_stats"]}})
    unmapped = [p for p in flat if flax_path_to_torch(p) is None]
    assert not unmapped, unmapped[:10]


def test_orthogonal_projection():
    """geometry.orthogonal parity (vendor/pifu/lib/geometry.py:83-99)."""
    from e3dge_tpu.render.camera import project_points_orthogonal

    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.randn(2, 3, 7).astype(np.float32))
    calibs = jnp.asarray(np.tile(np.eye(4, dtype=np.float32)[None], (2, 1, 1)))
    out = project_points_orthogonal(pts, calibs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-6)
    # affine: rot + trans applied without perspective divide
    calibs2 = calibs.at[:, :3, 3].set(jnp.asarray([1.0, 2.0, 3.0]))
    out2 = project_points_orthogonal(pts, calibs2)
    np.testing.assert_allclose(
        np.asarray(out2), np.asarray(pts) + np.array([1.0, 2.0, 3.0]).reshape(1, 3, 1), atol=1e-6
    )


def test_resnet_block_fc_shortcut():
    m = ResnetBlockFC(8)
    x = jax.random.normal(jax.random.key(0), (3, 12))
    v = m.init(jax.random.key(1), x)
    out = m.apply(v, x)
    assert out.shape == (3, 8)
    # fc_1 is zero-init -> output equals the shortcut projection
    ws = np.asarray(v["params"]["shortcut_weight"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) @ ws.T, rtol=1e-5)


def test_fuse_sft_mlp():
    m = FuseSftMLP(out_ch=16)
    enc = jax.random.normal(jax.random.key(0), (2, 6, 17))  # 16 + 1 vis mask
    dec = jax.random.normal(jax.random.key(1), (2, 6, 16))
    v = m.init(jax.random.key(2), enc, dec)
    out = m.apply(v, enc, dec)
    assert out.shape == (2, 6, 16)
    # w=0 disables fusion entirely
    out0 = m.apply(v, enc, dec, w=0.0)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(dec), rtol=1e-6)


def test_residual_aligner():
    m = ResidualAligner()
    x = jax.random.normal(jax.random.key(0), (1, 6, 32, 32))
    v = m.init(jax.random.key(1), x)
    out = m.apply(v, x)
    assert out.shape == (1, 3, 32, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_residual_encoder_conditions():
    from e3dge_tpu.models.align import ResidualEncoder

    m = ResidualEncoder(cond_channels=8, cond_res=8)
    x = jax.random.normal(jax.random.key(0), (1, 3, 32, 32))
    v = m.init(jax.random.key(1), x)
    scale, shift = m.apply(v, x)
    assert scale.shape == (1, 8, 8, 8)
    assert shift.shape == (1, 8, 8, 8)
    assert np.isfinite(np.asarray(scale)).all()


def test_surface_classifier_and_geo_modulations():
    from e3dge_tpu.models.pifu.local_net import LocalFeatureNet

    cfg = tiny_test_config()
    model = LocalFeatureNet(
        cfg.pifu,
        modulation_width=cfg.renderer.width,
        local_feats_dim=cfg.pifu.hourglass_dim + 45,
        enable_geo_modulations=True,
        enable_surface_classifier=True,
    )
    res_img = jax.random.normal(jax.random.key(0), (1, 3, 32, 32))
    depth = jax.random.normal(jax.random.key(1), (1, 1, 32, 32))
    cam = camera_params_from_angles(jnp.asarray([0.0]), jnp.asarray([0.0]), 32)
    pts = 0.05 * jax.random.normal(jax.random.key(2), (1, 3, 7))
    v = model.init(jax.random.key(3), res_img, depth, pts, cam.calibs)

    im_feat = model.apply(v, res_img, depth, method=LocalFeatureNet.filter)
    sdf = model.apply(v, im_feat, pts, cam.calibs, method=LocalFeatureNet.predict_sdf)
    assert sdf.shape == (1, 7, 1)
    assert np.isfinite(np.asarray(sdf)).all()

    feats = jax.random.normal(jax.random.key(4), (1, 5, cfg.pifu.hourglass_dim + 45))
    ga, gb = model.apply(v, feats, method=LocalFeatureNet.geo_modulations)
    np.testing.assert_allclose(np.asarray(ga), 0.0)  # zero-init


def test_ranger_optimizer_with_grad_centralization():
    import optax

    from e3dge_tpu.training.steps import make_optimizer

    tx = make_optimizer(1e-3, "ranger")
    params = {"w": jnp.ones((4, 3)), "b": jnp.ones((3,))}
    grads = {"w": jnp.ones((4, 3)) + jnp.arange(3.0), "b": jnp.ones((3,))}
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    assert jax.tree.map(lambda x: x.shape, updates) == jax.tree.map(lambda x: x.shape, params)


def test_resnet_block_fc_tuple_equals_concat():
    """Tuple input (split-column matmuls, no concat materialization) matches the
    concatenated-array path exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from e3dge_tpu.models.align import ResnetBlockFC

    m = ResnetBlockFC(24)
    rng = np.random.RandomState(7)
    a = jnp.asarray(rng.randn(2, 5, 16).astype(np.float32))
    b = jnp.asarray(rng.randn(2, 5, 9).astype(np.float32))
    cat = jnp.concatenate([a, b], axis=-1)
    v = m.init(jax.random.key(0), cat)
    np.testing.assert_allclose(
        np.asarray(m.apply(v, (a, b))), np.asarray(m.apply(v, cat)), rtol=1e-5, atol=1e-5
    )
    # identity-shortcut case (size_in == size_out)
    m2 = ResnetBlockFC(25)
    v2 = m2.init(jax.random.key(1), cat)
    np.testing.assert_allclose(
        np.asarray(m2.apply(v2, (a, b))), np.asarray(m2.apply(v2, cat)), rtol=1e-5, atol=1e-5
    )
