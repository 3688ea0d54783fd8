"""Camera parameter sampling and projection math.

Numerically mirrors the reference `generate_camera_params` (`project/utils/
camera_utils.py:8-155`): cameras live on the unit sphere looking at the origin,
fov half-angle 6 degrees, near/far = 1 -/+ dist_radius. Returns c2w poses, w2c
extrinsics, focal, and PIFu-style homogeneous calib matrices mapping world points to
[-1, 1] uv space.

All functions are pure and jit-friendly; randomness comes in via explicit PRNG keys
(replacing torch.randn inside the reference function).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from e3dge_tpu.utils.config import CameraConfig


class CameraParams(NamedTuple):
    """Bundle mirroring the reference's return dict (camera_utils.py:141-153)."""

    poses: jnp.ndarray        # [B, 3, 4] c2w
    extrinsics: jnp.ndarray   # [B, 3, 4] w2c
    focal: jnp.ndarray        # [B, 1, 1]
    near: jnp.ndarray         # [B, 1, 1]
    far: jnp.ndarray          # [B, 1, 1]
    viewpoint: jnp.ndarray    # [B, 2] (azim, elev)
    calibs: jnp.ndarray       # [B, 4, 4] homogeneous uv-space calib


def _normalize(v: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    # F.normalize semantics: v / max(||v||, eps)
    norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(norm, eps)


def camera_params_from_angles(
    azim: jnp.ndarray,
    elev: jnp.ndarray,
    resolution: int,
    fov_ang: float | jnp.ndarray = 6.0,
    dist_radius: float = 0.12,
) -> CameraParams:
    """Build full camera parameters from [B] azimuth/elevation angles (radians)."""
    azim = azim.reshape(-1)
    elev = elev.reshape(-1)
    batch = azim.shape[0]

    dist = jnp.ones((batch,))
    near = (dist - dist_radius).reshape(batch, 1, 1)
    far = (dist + dist_radius).reshape(batch, 1, 1)
    fov = jnp.broadcast_to(jnp.asarray(fov_ang, jnp.float32), (batch,)) * jnp.pi / 180.0
    focal = (0.5 * resolution / jnp.tan(fov)).reshape(batch, 1, 1)

    # camera location on the unit sphere
    x = jnp.cos(elev) * jnp.sin(azim)
    y = jnp.sin(elev)
    z = jnp.cos(elev) * jnp.cos(azim)
    camera_dir = jnp.stack([x, y, z], axis=-1)  # [B, 3]
    camera_loc = dist[:, None] * camera_dir

    # look-at rotation: z axis points from origin to camera (into the screen is -z)
    up = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (batch, 3))
    z_axis = _normalize(camera_dir)
    x_axis = _normalize(jnp.cross(up, z_axis))
    y_axis = _normalize(jnp.cross(z_axis, x_axis))
    # Degenerate pole handling (reference camera_utils.py:97-101): when the camera
    # looks straight up/down, rebuild x from y x z.
    is_close = jnp.all(jnp.abs(x_axis) < 5e-3, axis=-1, keepdims=True)
    replacement = _normalize(jnp.cross(y_axis, z_axis))
    x_axis = jnp.where(is_close, replacement, x_axis)

    w2c_R = jnp.stack([x_axis, y_axis, z_axis], axis=1)  # [B, 3, 3] rows
    c2w_R = jnp.swapaxes(w2c_R, 1, 2)
    T = camera_loc[:, :, None]  # [B, 3, 1]
    poses = jnp.concatenate([c2w_R, T], axis=-1)  # [B, 3, 4]

    T_ext = -w2c_R @ T
    extrinsics = jnp.concatenate([w2c_R, T_ext], axis=-1)  # [B, 3, 4]

    # uv-space intrinsics: focal/(res/2) diag, homogeneous row; calib = K @ [R|t]
    f_uv = (focal.reshape(batch) / (resolution / 2.0))
    zeros = jnp.zeros((batch,))
    ones = jnp.ones((batch,))
    intrinsics = jnp.stack(
        [
            jnp.stack([f_uv, zeros, zeros], -1),
            jnp.stack([zeros, f_uv, zeros], -1),
            jnp.stack([zeros, zeros, ones], -1),
        ],
        axis=1,
    )  # [B, 3, 3]
    calibs = intrinsics @ extrinsics  # [B, 3, 4]
    homo = jnp.broadcast_to(jnp.asarray([[0.0, 0.0, 0.0, 1.0]]), (batch, 1, 4))
    calibs = jnp.concatenate([calibs, homo], axis=1)  # [B, 4, 4]

    viewpoint = jnp.stack([azim, elev], axis=-1)
    return CameraParams(poses, extrinsics, focal, near, far, viewpoint, calibs)


def sample_camera_params(
    key: jax.Array,
    batch: int,
    resolution: int,
    cfg: CameraConfig = CameraConfig(),
) -> CameraParams:
    """Sample random viewpoints (gaussian by default, uniform optionally)."""
    ka, ke = jax.random.split(key)
    if cfg.uniform:
        azim = jax.random.uniform(ka, (batch,), minval=-cfg.azim_range, maxval=cfg.azim_range)
        elev = jax.random.uniform(ke, (batch,), minval=-cfg.elev_range, maxval=cfg.elev_range)
    else:
        azim = cfg.azim_range * jax.random.normal(ka, (batch,))
        elev = cfg.elev_range * jax.random.normal(ke, (batch,))
    return camera_params_from_angles(
        cfg.azim_mean + azim, cfg.elev_mean + elev, resolution, cfg.fov_ang, cfg.dist_radius
    )


def sweep_camera_params(
    batch: int, resolution: int, cfg: CameraConfig = CameraConfig(), n_views: int = 8
) -> CameraParams:
    """Deterministic azimuth sweep at elev 0 (reference sweep branch; used for the
    novel-view video trajectories)."""
    # reference: -range + (2*range/7)*arange(8) covers [-range, +range] inclusive
    azim = -cfg.azim_range + (2 * cfg.azim_range / (n_views - 1)) * jnp.arange(n_views)
    azim = jnp.tile(azim, (batch,))
    elev = jnp.zeros_like(azim)
    return camera_params_from_angles(
        cfg.azim_mean + azim, cfg.elev_mean + elev, resolution, cfg.fov_ang, cfg.dist_radius
    )


def project_points(points: jnp.ndarray, calibs: jnp.ndarray) -> jnp.ndarray:
    """Perspective-project world points to uv space (reference `geometry.perspective`,
    vendor/pifu/lib/geometry.py:101-130 with uv-space calibs).

    Args:
      points: [B, 3, N] world-space points.
      calibs: [B, 4, 4] homogeneous calibration (intrinsics @ extrinsics).

    Returns:
      [B, 3, N]: (u, v, depth) with u,v in [-1, 1] and depth the camera-space z.
    """
    rot = calibs[:, :3, :3]
    trans = calibs[:, :3, 3:4]
    homo = rot @ points + trans  # [B, 3, N]
    # The camera looks down -z, so camera-space z is negative for visible points;
    # the reference flips it to a positive depth (geometry.py:116-121) before dividing.
    depth = -homo[:, 2:3]
    xy = homo[:, :2] / jnp.where(jnp.abs(depth) < 1e-8, 1e-8, depth)
    return jnp.concatenate([xy, depth], axis=1)


def project_points_orthogonal(points: jnp.ndarray, calibs: jnp.ndarray) -> jnp.ndarray:
    """Orthogonal projection (reference `geometry.orthogonal`,
    vendor/pifu/lib/geometry.py:83-99): affine transform without the perspective
    divide — the upstream-PIFu projection mode, kept for projection_mode parity.

    Args:
      points: [B, 3, N] world-space points; calibs: [B, 4, 4].

    Returns [B, 3, N] (u, v, z) image-plane coordinates.
    """
    rot = calibs[:, :3, :3]
    trans = calibs[:, :3, 3:4]
    return rot @ points + trans
