"""Coverage + roundtrip tests for the torch checkpoint ingestion rules.

Builds a synthetic torch-layout state dict from OUR param tree via the inverse
transforms, ingests it, and checks every leaf was mapped and landed with the right
layout. This proves the name mapping is complete and layout-consistent; numeric
parity against the real released ckpts additionally needs those files (zero-egress CI
cannot download them)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e3dge_tpu.models.e3dge import E3DGE, LatentMeans
from e3dge_tpu.utils.config import tiny_full_config
from e3dge_tpu.utils.torch_ckpt import (
    _conv_to_flax,
    _dense_to_flax,
    _identity,
    _reshape_bias4,
    flatten_tree,
    flax_path_to_torch,
    ingest_variables,
    normalize_g_ema_keys,
    split_generator_sd,
    unflatten_tree,
)

_INVERSE = {
    _identity: lambda x: x,
    _conv_to_flax: lambda x: np.transpose(x, (3, 2, 0, 1)),
    _dense_to_flax: lambda x: np.transpose(x, (1, 0)),
    _reshape_bias4: lambda x: np.reshape(x, (-1,)),
}


@pytest.fixture(scope="module")
def variables(tiny_full_setup):
    return tiny_full_setup[2]


def test_full_mapping_coverage(variables):
    flat = flatten_tree(jax.tree.map(np.asarray, variables))
    unmapped = [p for p in flat if flax_path_to_torch(p) is None]
    assert not unmapped, f"unmapped paths: {unmapped[:20]} (+{max(0, len(unmapped) - 20)} more)"


def test_roundtrip_ingestion(variables):
    flat = flatten_tree(jax.tree.map(np.asarray, variables))
    rng = np.random.RandomState(0)

    # build synthetic torch sds keyed by top module
    sds: dict[str, dict] = {}
    expected = {}
    for path, v in flat.items():
        tk, tf = flax_path_to_torch(path)
        top = path.split("/")[1]
        target = rng.randn(*np.shape(v)).astype(np.float32)
        sds.setdefault(top, {})[tk] = _INVERSE[tf](target)
        expected[path] = target

    new_vars, missing = ingest_variables(variables, sds, strict=True)
    assert not missing
    new_flat = flatten_tree(jax.tree.map(np.asarray, new_vars))
    for path in flat:
        np.testing.assert_allclose(new_flat[path], expected[path], err_msg=path, rtol=1e-6)


def test_normalize_and_split():
    sd = {
        "module.renderer.network.netGlobal.pts_linears.0.weight": 1,
        "renderer.network.netLocal.image_filter.conv1.weight": 2,
        "decoder.conv1.conv.weight": 3,
    }
    norm = normalize_g_ema_keys(sd)
    assert "renderer.network.pts_linears.0.weight" in norm
    gen, local = split_generator_sd(norm)
    assert "image_filter.conv1.weight" in local
    assert "decoder.conv1.conv.weight" in gen


def test_e3dge_save_dict_ingestion(variables):
    """A released E3DGE training checkpoint (base_runner.save_network: one
    state_dict per network name + 'iter' + optimizer states) splits to our tops
    and ingests end-to-end — the scripts/eval.py --torch-encoder-ckpt path."""
    import torch

    from e3dge_tpu.utils.torch_ckpt import split_e3dge_save_dict

    flat = flatten_tree(jax.tree.map(np.asarray, variables))
    rng = np.random.RandomState(1)
    ref_name = {"encoder": "encoder", "local": "netLocal",
                "grid_align": "grid_align", "fuse_sft_block": "Fuse_sft_block"}
    save_dict = {"iter": 123, "e_optimizer": {"state": {}}}
    expected = {}
    for path, v in flat.items():
        top = path.split("/")[1]
        if top not in ref_name:
            continue
        tk, tf = flax_path_to_torch(path)
        target = rng.randn(*np.shape(v)).astype(np.float32)
        # 'module.' prefixes appear in DDP-saved dicts; the splitter strips them
        save_dict.setdefault(ref_name[top], {})["module." + tk] = torch.from_numpy(
            np.ascontiguousarray(_INVERSE[tf](target))
        )
        expected[path] = target
    assert expected, "fixture produced no encoder/local/ada/fusion leaves"

    sds = split_e3dge_save_dict(save_dict)
    assert set(sds) == {"encoder", "local", "grid_align", "fuse_sft_block"}
    new_vars, missing = ingest_variables(variables, sds, strict=True)
    assert not missing
    new_flat = flatten_tree(jax.tree.map(np.asarray, new_vars))
    for path, target in expected.items():
        np.testing.assert_allclose(new_flat[path], target, err_msg=path, rtol=1e-6)


def test_flatten_unflatten():
    tree = {"a": {"b": 1, "c": {"d": 2}}}
    assert unflatten_tree(flatten_tree(tree)) == tree


def test_perceptual_mapping_coverage():
    """LPIPS + ArcFace ingestion rules cover every leaf of their trees."""
    import jax.numpy as jnp

    from e3dge_tpu.training.perceptual import IDLoss, LPIPS
    from e3dge_tpu.utils.torch_ckpt import (
        arcface_path_to_torch,
        ingest_perceptual,
        lpips_path_to_torch,
    )

    lp = LPIPS()
    x = jnp.zeros((1, 3, 64, 64))
    v_lp = lp.init(jax.random.key(0), x, x)
    flat = flatten_tree(jax.tree.map(np.asarray, v_lp))
    unmapped = [p for p in flat if lpips_path_to_torch(p) is None]
    assert not unmapped, unmapped[:10]

    idl = IDLoss()
    xi = jnp.zeros((1, 3, 112, 112))
    v_id = idl.init(jax.random.key(0), xi, xi)
    flat_id = flatten_tree(jax.tree.map(np.asarray, v_id))
    unmapped = [p for p in flat_id if arcface_path_to_torch(p) is None]
    assert not unmapped, unmapped[:10]

    # roundtrip for LPIPS (small)
    rng = np.random.RandomState(0)
    sd, expected = {}, {}
    for path, val in flat.items():
        tk, tf = lpips_path_to_torch(path)
        target = rng.randn(*np.shape(val)).astype(np.float32)
        inv = {_identity: lambda a: a, _conv_to_flax: lambda a: np.transpose(a, (3, 2, 0, 1))}[tf]
        sd[tk] = inv(target)
        expected[path] = target
    new_v, missing = ingest_perceptual(v_lp, sd, "lpips")
    assert not missing
    new_flat = flatten_tree(jax.tree.map(np.asarray, new_v))
    for p2 in flat:
        np.testing.assert_allclose(new_flat[p2], expected[p2], err_msg=p2)
