"""SDF-aware alpha-compositing volume integration.

Numerically mirrors `VolumeFeatureRenderer.volume_integration`
(`project/utils/volume_renderer.py:809-943`):

  sigma  = sigmoid(-sdf / beta) / beta            (sigmoid-Laplace SDF->density)
  alpha  = 1 - exp(-sigma * delta)
  T_i    = prod_{j<i} (1 - alpha_j + 1e-10)       (transmittance)
  w_i    = alpha_i * T_i                          (hit probability)
  force_background: w_S = 1 - sum_{i<S} w_i       (leftover mass on last sample)
  rgb    = -1 + 2 * sum_i w_i * sigmoid(rgb_i)    ([-1, 1] range)
  feat   = sum_i w_i * f_i ;  xyz = sum_i w_i * pts_i ;  depth = sum_i w_i * z_i
  mask   = depth < 1.08

Pure function — eikonal gradients are taken by the caller with jax.grad/jvp through the
SIREN network rather than torch autograd.grad (volume_renderer.py:796-802).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

INF_DIST = 1e10


class IntegrationOut(NamedTuple):
    rgb: jnp.ndarray              # [B, H, W, 3] in [-1, 1]
    features: jnp.ndarray | None  # [B, H, W, F]
    sdf: jnp.ndarray              # [B, H, W, S, 1] raw SDF samples
    mask: jnp.ndarray             # [B, H, W, 1, 1] fg mask (depth < threshold)
    xyz: jnp.ndarray              # [B, H, W, 3] expected surface point
    depth: jnp.ndarray            # [B, H, W, 1, 1]
    weights: jnp.ndarray          # [B, H, W, S, 1] hit probability
    visibility: jnp.ndarray       # [B, H, W, S, 1] transmittance before each sample
    dists: jnp.ndarray            # [B, H, W, S] scaled interval lengths


def sdf_to_density(sdf: jnp.ndarray, sigmoid_beta: jnp.ndarray) -> jnp.ndarray:
    """sigmoid-Laplace density: sigmoid(-sdf/beta)/beta (volume_renderer.py:804-807,
    called as sdf_activation(-sdf) at :853)."""
    return jax.nn.sigmoid(-sdf / sigmoid_beta) / sigmoid_beta


def volume_integrate(
    rgb_raw: jnp.ndarray,       # [B, H, W, S, 3]
    sdf: jnp.ndarray,           # [B, H, W, S, 1]
    features: jnp.ndarray | None,  # [B, H, W, S, F] or None
    z_vals: jnp.ndarray,        # [B, H, W, S]
    rays_d: jnp.ndarray,        # [B, H, W, 3]
    pts: jnp.ndarray,           # [B, H, W, S, 3]
    sigmoid_beta: jnp.ndarray,  # scalar (learnable, init 0.1)
    force_background: bool = True,
    no_force_stop: bool = False,
    fg_mask_threshold: float = 1.08,
) -> IntegrationOut:
    """Composite per-sample SIREN outputs into per-ray images/features/geometry."""
    dists = z_vals[..., 1:] - z_vals[..., :-1]  # [B, H, W, S-1]
    rays_d_norm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)  # [B, H, W, 1]
    if not no_force_stop:
        last = jnp.broadcast_to(jnp.asarray(INF_DIST), rays_d_norm.shape)
    else:
        # query-reference-view mode repeats the first interval instead of an
        # infinite terminal segment (volume_renderer.py:834-836)
        last = dists[..., 0:1]
    dists = jnp.concatenate([dists, last], axis=-1) * rays_d_norm  # [B, H, W, S]

    density = sdf_to_density(sdf, sigmoid_beta)
    alpha = 1.0 - jnp.exp(-density * dists[..., None])  # [B, H, W, S, 1]

    # transmittance: cumprod of (1 - alpha) shifted right by one
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-2)
    visibility = jnp.concatenate([jnp.ones_like(alpha[..., :1, :]), trans[..., :-1, :]], axis=-2)
    weights = alpha * visibility  # hit probability

    if force_background and not no_force_stop:
        w_last = 1.0 - jnp.sum(weights[..., :-1, :], axis=-2, keepdims=True)
        weights = jnp.concatenate([weights[..., :-1, :], w_last], axis=-2)

    rgb = -1.0 + 2.0 * jnp.sum(weights * jax.nn.sigmoid(rgb_raw), axis=-2)

    feature_map = None
    if features is not None:
        feature_map = jnp.sum(weights * features, axis=-2)

    xyz = jnp.sum(weights * pts, axis=-2)  # [B, H, W, 3]
    depth = jnp.sum(weights * z_vals[..., None], axis=-2, keepdims=True)  # [B,H,W,1,1]
    mask = (depth < fg_mask_threshold).astype(weights.dtype)

    return IntegrationOut(
        rgb=rgb,
        features=feature_map,
        sdf=sdf,
        mask=mask,
        xyz=xyz,
        depth=depth,
        weights=weights,
        visibility=visibility,
        dists=dists,
    )
