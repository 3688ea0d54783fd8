"""Ray generation and depth sampling for the SDF volume renderer.

Mirrors the reference `VolumeFeatureRenderer.get_rays` / z_vals construction
(`project/utils/volume_renderer.py:768-794, 1211-1233`): pinhole rays through pixel
centers (linspace 0.5 .. res-0.5), camera looking down -z, offset sampling by default
(eq. (3) of the paper) with optional per-ray jitter.

Pure functions of (focal, c2w, key); no buffers, no chunk loops — the sample axis is a
plain array axis that XLA tiles over the VPU/MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def get_rays(focal: jnp.ndarray, c2w: jnp.ndarray, res: int):
    """Generate world-space rays through every pixel.

    Args:
      focal: [B, 1, 1] focal length in pixels.
      c2w: [B, 3, 4] camera-to-world pose.
      res: image resolution (square).

    Returns:
      rays_o, rays_d, viewdirs: each [B, res, res, 3]; viewdirs is rays_d normalized
      (the reference normalizes in `render`, volume_renderer.py:1679).
    """
    b = focal.shape[0]
    # pixel centers; i indexes x (width), j indexes y (height)
    coords = jnp.linspace(0.5, res - 0.5, res)
    i = jnp.broadcast_to(coords[None, None, :], (b, res, res))  # x along last axis
    j = jnp.broadcast_to(coords[None, :, None], (b, res, res))  # y along rows

    f = focal.reshape(b, 1, 1)
    dirs = jnp.stack(
        [(i - res * 0.5) / f, -(j - res * 0.5) / f, -jnp.ones_like(i)], axis=-1
    )  # [B, H, W, 3] camera space, looking down -z

    rot = c2w[:, :3, :3]  # [B, 3, 3]
    rays_d = jnp.einsum("bhwi,bji->bhwj", dirs, rot)
    rays_o = jnp.broadcast_to(c2w[:, None, None, :3, 3], rays_d.shape)
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    return rays_o, rays_d, viewdirs


def sample_z_vals(
    key: jax.Array | None,
    near: jnp.ndarray,
    far: jnp.ndarray,
    shape: tuple[int, int, int],
    n_samples: int,
    offset_sampling: bool = True,
    perturb: bool = False,
) -> jnp.ndarray:
    """Depth values along each ray: [B, H, W, S].

    offset sampling: t in {0, 1/S, ..., (S-1)/S} with one shared jitter per ray;
    stratified: t in linspace(0, 1, S) with per-sample jitter in bin midpoint intervals.
    """
    b, h, w = shape
    # accept either per-batch [B,...] scalars or per-ray [B, H, W] bounds
    near = near.reshape(b, h, w, 1) if near.size == b * h * w else near.reshape(b, 1, 1, 1)
    far = far.reshape(b, h, w, 1) if far.size == b * h * w else far.reshape(b, 1, 1, 1)
    if offset_sampling:
        t_vals = jnp.linspace(0.0, 1.0 - 1.0 / n_samples, n_samples).reshape(1, 1, 1, -1)
    else:
        t_vals = jnp.linspace(0.0, 1.0, n_samples).reshape(1, 1, 1, -1)
    z_vals = near * (1.0 - t_vals) + far * t_vals  # [B, H, W, S]
    z_vals = jnp.broadcast_to(z_vals, (b, h, w, n_samples))

    if perturb and key is not None:
        if offset_sampling:
            upper = jnp.concatenate([z_vals[..., 1:], jnp.broadcast_to(far, (b, h, w, 1))], -1)
            lower = z_vals
            t_rand = jax.random.uniform(key, (b, h, w, 1))
        else:
            mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
            upper = jnp.concatenate([mids, z_vals[..., -1:]], -1)
            lower = jnp.concatenate([z_vals[..., :1], mids], -1)
            t_rand = jax.random.uniform(key, z_vals.shape)
        z_vals = lower + (upper - lower) * t_rand
    return z_vals


def rays_to_points(rays_o: jnp.ndarray, rays_d: jnp.ndarray, z_vals: jnp.ndarray) -> jnp.ndarray:
    """pts[b,h,w,s,:] = o + t*d -> [B, H, W, S, 3]."""
    return rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]
