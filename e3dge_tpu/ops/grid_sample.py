"""Differentiable bilinear grid sampling (zeros padding, align_corners=False).

Replaces the reference's `grid_sample_gradfix` (`project/models/op/grid_sample_gradfix.py`),
which exists only because PyTorch's native grid_sample lacks second-order gradients
(needed to push eikonal terms through pixel-aligned feature lookups). JAX differentiates
this gather+lerp formulation to arbitrary order for free.

On TPU the gather is lowered to dynamic-slice batches over HBM; all four corner gathers
share one index computation and fuse with the lerp on the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample(x: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Sample `x` at normalized locations `grid`.

    Args:
      x: [B, C, H, W] feature map.
      grid: [B, Hg, Wg, 2] sample locations in [-1, 1], last dim ordered (x, y)
        following torch convention (x indexes W, y indexes H).

    Returns:
      [B, C, Hg, Wg] bilinearly sampled features; out-of-range samples read zero
      (padding_mode='zeros', align_corners=False).
    """
    B, C, H, W = x.shape
    gx, gy = grid[..., 0], grid[..., 1]  # [B, Hg, Wg]

    # align_corners=False unnormalization: -1 -> -0.5, +1 -> size-0.5.
    ix = ((gx + 1.0) * W - 1.0) / 2.0
    iy = ((gy + 1.0) * H - 1.0) / 2.0

    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    ix1 = ix0 + 1.0
    iy1 = iy0 + 1.0

    wx1 = ix - ix0
    wy1 = iy - iy0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def gather(iy_c, ix_c):
        # Zero out-of-bounds corners (zeros padding) while clipping indices so the
        # gather itself stays in range.
        valid = (ix_c >= 0) & (ix_c <= W - 1) & (iy_c >= 0) & (iy_c <= H - 1)
        ixc = jnp.clip(ix_c, 0, W - 1).astype(jnp.int32)
        iyc = jnp.clip(iy_c, 0, H - 1).astype(jnp.int32)
        flat_idx = (iyc * W + ixc).reshape(B, 1, -1)  # [B, 1, Hg*Wg]
        vals = jnp.take_along_axis(
            x.reshape(B, C, H * W), jnp.broadcast_to(flat_idx, (B, C, flat_idx.shape[-1])), axis=2
        )
        vals = vals.reshape(B, C, *ix_c.shape[1:])
        return vals * valid[:, None].astype(x.dtype)

    out = (
        gather(iy0, ix0) * (wy0 * wx0)[:, None]
        + gather(iy0, ix1) * (wy0 * wx1)[:, None]
        + gather(iy1, ix0) * (wy1 * wx0)[:, None]
        + gather(iy1, ix1) * (wy1 * wx1)[:, None]
    )
    return out


def grid_sample_3d(x: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Trilinear 3D grid sample (zeros padding, align_corners=True variant used by
    `align_volume` for frustum->cube warping, reference `mesh_utils.py:17-44`).

    Args:
      x: [B, C, D, H, W] volume.
      grid: [B, Dg, Hg, Wg, 3] normalized (x, y, z) locations in [-1, 1] where x
        indexes W, y indexes H, z indexes D. align_corners=True mapping.

    Returns:
      [B, C, Dg, Hg, Wg].
    """
    B, C, D, H, W = x.shape
    gx, gy, gz = grid[..., 0], grid[..., 1], grid[..., 2]

    # align_corners=True unnormalization: -1 -> 0, +1 -> size-1.
    ix = (gx + 1.0) / 2.0 * (W - 1)
    iy = (gy + 1.0) / 2.0 * (H - 1)
    iz = (gz + 1.0) / 2.0 * (D - 1)

    ix0, iy0, iz0 = jnp.floor(ix), jnp.floor(iy), jnp.floor(iz)

    wx1, wy1, wz1 = ix - ix0, iy - iy0, iz - iz0
    wx0, wy0, wz0 = 1.0 - wx1, 1.0 - wy1, 1.0 - wz1

    def gather(iz_c, iy_c, ix_c):
        valid = (
            (ix_c >= 0) & (ix_c <= W - 1)
            & (iy_c >= 0) & (iy_c <= H - 1)
            & (iz_c >= 0) & (iz_c <= D - 1)
        )
        ixc = jnp.clip(ix_c, 0, W - 1).astype(jnp.int32)
        iyc = jnp.clip(iy_c, 0, H - 1).astype(jnp.int32)
        izc = jnp.clip(iz_c, 0, D - 1).astype(jnp.int32)
        flat_idx = ((izc * H + iyc) * W + ixc).reshape(B, 1, -1)
        vals = jnp.take_along_axis(
            x.reshape(B, C, D * H * W),
            jnp.broadcast_to(flat_idx, (B, C, flat_idx.shape[-1])),
            axis=2,
        )
        vals = vals.reshape(B, C, *ix_c.shape[1:])
        return vals * valid[:, None].astype(x.dtype)

    out = (
        gather(iz0, iy0, ix0) * (wz0 * wy0 * wx0)[:, None]
        + gather(iz0, iy0, ix0 + 1) * (wz0 * wy0 * wx1)[:, None]
        + gather(iz0, iy0 + 1, ix0) * (wz0 * wy1 * wx0)[:, None]
        + gather(iz0, iy0 + 1, ix0 + 1) * (wz0 * wy1 * wx1)[:, None]
        + gather(iz0 + 1, iy0, ix0) * (wz1 * wy0 * wx0)[:, None]
        + gather(iz0 + 1, iy0, ix0 + 1) * (wz1 * wy0 * wx1)[:, None]
        + gather(iz0 + 1, iy0 + 1, ix0) * (wz1 * wy1 * wx0)[:, None]
        + gather(iz0 + 1, iy0 + 1, ix0 + 1) * (wz1 * wy1 * wx1)[:, None]
    )
    return out


def interpolate_bilinear(
    x: jnp.ndarray, size: tuple[int, int], align_corners: bool = True
) -> jnp.ndarray:
    """Bilinear resize of an NCHW tensor (replaces F.interpolate on the FPN/ADA paths).

    Uses jax.image for the align_corners=False case and an explicit affine grid for
    align_corners=True (torch semantics, used by `_upsample_add`, fpn_encoders.py:366).
    """
    B, C, H, W = x.shape
    Ho, Wo = size
    if (H, W) == (Ho, Wo):
        return x
    if not align_corners:
        return jax.image.resize(x, (B, C, Ho, Wo), method="bilinear")
    # align_corners=True: endpoints map to endpoints.
    ys = jnp.linspace(0.0, H - 1.0, Ho)
    xs = jnp.linspace(0.0, W - 1.0, Wo)
    # Convert to align_corners=False normalized coords of grid_sample:
    gy = (2.0 * ys + 1.0) / H - 1.0
    gx = (2.0 * xs + 1.0) / W - 1.0
    grid = jnp.stack(jnp.meshgrid(gx, gy, indexing="xy"), axis=-1)  # [Ho, Wo, 2]
    grid = jnp.broadcast_to(grid[None], (B, Ho, Wo, 2))
    return grid_sample(x, grid)
