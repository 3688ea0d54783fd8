"""Numeric ingestion-parity tests (utils/parity.py): synthetic torch-layout weights
flow through the ingestion rules into OUR flax modules and reproduce an independent
numpy re-implementation of the reference math (volume_renderer.py:42-264)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e3dge_tpu.models.e3dge import E3DGE, LatentMeans
from e3dge_tpu.utils.config import tiny_full_config
from e3dge_tpu.utils.parity import (
    checksum,
    numpy_siren_forward,
    synthetic_sds,
)
from e3dge_tpu.utils.torch_ckpt import flatten_tree, ingest_variables


@pytest.fixture(scope="module")
def model_and_vars(tiny_full_setup):
    cfg, model, v, _ = tiny_full_setup
    return cfg, model, v


def test_checksum_stable_and_sensitive():
    a = np.arange(24, dtype=np.float32).reshape(2, 3, 4) / 7.0
    c1, c2 = checksum(a), checksum(a.copy())
    assert c1 == c2
    b = a.copy()
    b[0, 0, 0] += 0.01
    assert checksum(b)["sha1_q4"] != c1["sha1_q4"]


def test_synthetic_ingest_matches_numpy_siren(model_and_vars):
    """flax(ingested torch weights) == numpy(torch weights) on the SIREN field."""
    cfg, model, variables = model_and_vars
    sds, expected = synthetic_sds(variables)
    new_vars, missing = ingest_variables(variables, sds, strict=False)
    assert not missing, missing[:5]

    # every ingested leaf landed exactly
    flat = flatten_tree({k: np.asarray(v) for k, v in flatten_tree(new_vars).items()})
    for path, target in expected.items():
        np.testing.assert_allclose(flat[path], target, rtol=1e-6, err_msg=path)

    rng = np.random.RandomState(7)
    B, N = 2, 33
    pts = rng.uniform(-0.1, 0.1, (B, N, 3)).astype(np.float32)
    views = rng.randn(B, N, 3).astype(np.float32)
    views /= np.linalg.norm(views, axis=-1, keepdims=True)
    w = (0.1 * rng.randn(B, cfg.renderer.depth + 1, cfg.renderer.style_dim)).astype(np.float32)

    siren_sd = {
        k[len("renderer.network."):]: v
        for k, v in sds["generator"].items()
        if k.startswith("renderer.network.")
    }
    ref = numpy_siren_forward(
        siren_sd, pts / cfg.camera.dist_radius, views, w, depth=cfg.renderer.depth
    )

    def siren_raw(m, p, d, s):
        return m.generator.renderer.query_raw(p, d, s)

    ours = model.apply(new_vars, jnp.asarray(pts), jnp.asarray(views), jnp.asarray(w), method=siren_raw)
    # flax runs float32, the golden float64; FiLM gamma~30 amplifies rounding
    # through sin, so ~2e-4 absolute drift is expected float32 noise
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-3, rtol=1e-3)


def test_local_head_mapping_coverage():
    """Ingestion rules cover the geo-modulation + surface-classifier heads
    (VERDICT r1: utils/torch_ckpt.py holes)."""
    from e3dge_tpu.models.pifu.local_net import LocalFeatureNet
    from e3dge_tpu.utils.config import tiny_full_config
    from e3dge_tpu.utils.torch_ckpt import flax_path_to_torch

    cfg = tiny_full_config()
    net = LocalFeatureNet(
        cfg.pifu,
        modulation_width=cfg.renderer.width,
        local_feats_dim=cfg.renderer.residual_local_feats_dim,
        enable_geo_modulations=True,
        enable_surface_classifier=True,
    )
    res = jnp.zeros((1, 3, cfg.pifu.load_size, cfg.pifu.load_size))
    dep = jnp.zeros((1, 1, cfg.pifu.load_size, cfg.pifu.load_size))
    pts = jnp.zeros((1, 3, 5))
    calibs = jnp.eye(4)[None]
    v = net.init(jax.random.key(0), res, dep, pts, calibs)
    flat = flatten_tree({"params": {"local": v["params"]}})
    unmapped = [p for p in flat if flax_path_to_torch(p) is None]
    assert not unmapped, unmapped[:10]
    # geo head is the reference's zero-init EqualLinear — exact no-op at init
    geo = v["params"]["local_feat_to_geo_modulations"]
    assert float(jnp.abs(geo["weight"]).max()) == 0.0
    assert float(jnp.abs(geo["bias"]).max()) == 0.0


def test_arcface_ingest_roundtrip():
    """ArcFace (IDLoss) roundtrip like the LPIPS one (VERDICT r1 weak #7)."""
    from e3dge_tpu.training.perceptual import IDLoss
    from e3dge_tpu.utils.parity import INVERSE_TRANSFORMS
    from e3dge_tpu.utils.torch_ckpt import arcface_path_to_torch, ingest_perceptual

    idl = IDLoss()
    xi = jnp.zeros((1, 3, 112, 112))
    v = idl.init(jax.random.key(0), xi, xi)
    flat = flatten_tree({k: np.asarray(x) for k, x in flatten_tree(v).items()})
    rng = np.random.RandomState(0)
    sd, expected = {}, {}
    for path, val in flat.items():
        tk, tf = arcface_path_to_torch(path)
        target = rng.randn(*np.shape(val)).astype(np.float32)
        sd[tk] = INVERSE_TRANSFORMS[tf](target)
        expected[path] = target
    new_v, missing = ingest_perceptual(v, sd, "arcface")
    assert not missing
    new_flat = flatten_tree({k: np.asarray(x) for k, x in flatten_tree(new_v).items()})
    for p in flat:
        np.testing.assert_allclose(new_flat[p], expected[p], err_msg=p)
