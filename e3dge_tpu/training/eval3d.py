"""3D evaluation metrics (reference NoW/deca eval, trainer.py:2103-2208, 2639-2953).

The reference's 3D eval pipeline crops NoW scans and computes point-to-mesh errors
via external deca utilities. Here we provide the self-contained core metrics that
work on any (pred, gt) geometry pair:

  chamfer_distance    — symmetric point-set distance (used by the reference's
                        commented chamfer path, losses/builder.py:121-128)
  depth_error         — masked L1/RMSE between rendered depth maps
  normal_consistency  — cosine distance between surface normal maps

All run in JAX on device; point sets are plain arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def chamfer_distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Symmetric chamfer over [Na, 3], [Nb, 3] point sets (squared distances)."""
    d2 = jnp.sum((a[:, None] - b[None]) ** 2, axis=-1)  # [Na, Nb]
    return jnp.mean(jnp.min(d2, axis=1)) + jnp.mean(jnp.min(d2, axis=0))


def batched_chamfer(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[B, N, 3] x [B, M, 3] -> [B] chamfer distances."""
    return jax.vmap(chamfer_distance)(a, b)


def depth_error(pred_depth: jnp.ndarray, gt_depth: jnp.ndarray, mask: jnp.ndarray | None = None):
    """Masked L1 + RMSE between depth maps (any matching shapes)."""
    diff = pred_depth - gt_depth
    if mask is not None:
        w = mask
        denom = jnp.maximum(jnp.sum(w), 1.0)
        l1 = jnp.sum(jnp.abs(diff) * w) / denom
        rmse = jnp.sqrt(jnp.sum(diff**2 * w) / denom)
    else:
        l1 = jnp.mean(jnp.abs(diff))
        rmse = jnp.sqrt(jnp.mean(diff**2))
    return {"depth_l1": l1, "depth_rmse": rmse}


def normal_consistency(pred_normals: jnp.ndarray, gt_normals: jnp.ndarray, mask: jnp.ndarray | None = None):
    """Mean cosine similarity between normal maps [..., 3]."""

    def unit(v):
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-8)

    cos = jnp.sum(unit(pred_normals) * unit(gt_normals), axis=-1)
    if mask is not None:
        m = mask.reshape(cos.shape)
        return jnp.sum(cos * m) / jnp.maximum(jnp.sum(m), 1.0)
    return jnp.mean(cos)
