"""Numeric parity verification for reference-checkpoint ingestion.

Three pieces (SURVEY.md §7 "hard parts": "build a verifier that checksums per-layer
outputs against the reference on a fixed input"):

  * checksum(...)      — stable per-array fingerprints (shape/mean/std/samples/sha1)
                         to diff our module outputs against reference-side dumps.
  * synthetic_sds(...) — torch-layout state dicts with random-but-deterministic
                         values for every torch key our ingestion rules can map,
                         built by inverting the ingestion transforms.
  * numpy_siren_forward(...) — an INDEPENDENT numpy re-implementation of the
                         reference FiLM-SIREN field (volume_renderer.py:42-264
                         math: LinearLayer std_init*(xW^T+b)+bias_init, FiLMSiren
                         sin(gamma*(xW^T+b)+beta)) driven directly by the
                         torch-layout sd. Comparing it against OUR SirenGenerator
                         applied to the INGESTED weights proves both the name
                         mapping and the math conventions end-to-end, without the
                         released .pt files (zero-egress).

The moment real weights are available, `scripts/verify_parity.py --ckpt` ingests
them and dumps the per-module checksums for comparison with a reference-side run
(utils/setup/train_setup.py:136-291 is the surgery being replicated).
"""

from __future__ import annotations

import hashlib
from typing import Any, Callable

import numpy as np

from e3dge_tpu.utils.torch_ckpt import (
    _conv_to_flax,
    _conv1d_to_dense,
    _dense_to_flax,
    _identity,
    _reshape_bias4,
    flatten_tree,
    flax_path_to_torch,
)

# inverse of each ingestion transform (shared with tests/test_torch_ckpt.py)
INVERSE_TRANSFORMS: dict[Callable, Callable] = {
    _identity: lambda x: x,
    _conv_to_flax: lambda x: np.transpose(x, (3, 2, 0, 1)),
    _dense_to_flax: lambda x: np.transpose(x, (1, 0)),
    _reshape_bias4: lambda x: np.reshape(x, (-1,)),
    _conv1d_to_dense: lambda x: np.transpose(x, (1, 0))[:, :, None],
}


def checksum(x: Any) -> dict:
    """Stable fingerprint of an array: shape, moments, corner samples, and a sha1 of
    the 1e-4-quantized float32 bytes (tolerant to sub-1e-4 backend noise)."""
    a = np.asarray(x, np.float64)
    q = np.round(np.asarray(x, np.float32) * 1e4).astype(np.int64)
    flat = a.reshape(-1)
    n = flat.size
    samples = flat[:: max(1, n // 8)][:8].astype(np.float64).round(6).tolist()
    return {
        "shape": list(a.shape),
        "mean": float(a.mean()),
        "std": float(a.std()),
        "absmax": float(np.abs(a).max()),
        "samples": samples,
        "sha1_q4": hashlib.sha1(q.tobytes()).hexdigest()[:16],
    }


def checksum_report(named_arrays: dict[str, Any]) -> dict[str, dict]:
    return {k: checksum(v) for k, v in named_arrays.items()}


def synthetic_sds(variables: dict, seed: int = 0) -> tuple[dict[str, dict], dict[str, np.ndarray]]:
    """Build deterministic torch-layout sds covering every mappable leaf of OUR tree.

    Returns (sds keyed by top module, expected flax-side values keyed by path)."""
    flat = flatten_tree({k: np.asarray(v) for k, v in flatten_tree(variables).items()})
    rng = np.random.RandomState(seed)
    sds: dict[str, dict] = {}
    expected: dict[str, np.ndarray] = {}
    for path, v in flat.items():
        rule = flax_path_to_torch(path)
        if rule is None:
            continue
        tk, tf = rule
        target = (0.1 * rng.randn(*np.shape(v))).astype(np.float32)
        # physically-valid ranges where the math requires them: BN running vars
        # must be positive (rsqrt), sigmoid_beta positive (SDF->density scale)
        if path.endswith("var"):
            target = np.abs(target) + 0.5
        elif path.endswith("sigmoid_beta"):
            target = np.full_like(target, 0.1)
        sds.setdefault(path.split("/")[1], {})[tk] = INVERSE_TRANSFORMS[tf](target)
        expected[path] = target
    return sds, expected


# ------------------------------------------------------- numpy SIREN reimpl


def _np_linear_layer(sd: dict, prefix: str, x: np.ndarray, std_init: float, bias_init: float):
    """LinearLayer forward: std_init * (x W^T + b) + bias_init (volume_renderer.py:76-80)."""
    w = np.asarray(sd[f"{prefix}.weight"], np.float64)
    b = np.asarray(sd[f"{prefix}.bias"], np.float64)
    return std_init * (x @ w.T + b) + bias_init


def _np_film_siren(sd: dict, prefix: str, x: np.ndarray, style: np.ndarray):
    """FiLMSiren forward: sin(gamma(style) * (x W^T + b) + beta(style))
    (volume_renderer.py:116-132; gamma std 15 bias 30, beta std 0.25 bias 0)."""
    w = np.asarray(sd[f"{prefix}.weight"], np.float64)
    b = np.asarray(sd[f"{prefix}.bias"], np.float64)
    out = x @ w.T + b
    gamma = _np_linear_layer(sd, f"{prefix}.gamma", style, 15.0, 30.0)
    beta = _np_linear_layer(sd, f"{prefix}.beta", style, 0.25, 0.0)
    bshape = (style.shape[0],) + (1,) * (x.ndim - 2) + (gamma.shape[-1],)
    return np.sin(gamma.reshape(bshape) * out + beta.reshape(bshape))


def numpy_siren_forward(
    sd: dict,
    pts: np.ndarray,       # [B, N, 3] box-warped points
    views: np.ndarray,     # [B, N, 3]
    styles: np.ndarray,    # [B, depth+1, style_dim]
    depth: int = 8,
) -> np.ndarray:
    """Reference SirenGenerator.forward from a torch-layout sd (keys relative to
    renderer.network.): returns concat([rgb, sdf, features]) in float64."""
    h = pts.astype(np.float64)
    for i in range(depth):
        style = styles[:, i] if styles.ndim == 3 else styles
        h = _np_film_siren(sd, f"pts_linears.{i}", h, style.astype(np.float64))
    sdf = _np_linear_layer(sd, "sigma_linear", h, 1.0, 0.0)
    view_style = (styles[:, -1] if styles.ndim == 3 else styles).astype(np.float64)
    hv = np.concatenate([h, views.astype(np.float64)], axis=-1)
    features = _np_film_siren(sd, "views_linears", hv, view_style)
    rgb = _np_linear_layer(sd, "rgb_linear", features, 1.0, 0.0)
    return np.concatenate([rgb, sdf, features], axis=-1)
