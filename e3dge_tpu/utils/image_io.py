"""Image grid saving (reference save_image panels, trainer.py:269-283, 502-510).

The reference writes a panel per validation step: GT | E0 64-res rec | residual |
aligned residual | E1 rec (README.md:204-206). `save_panel` reproduces that layout.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np


def to_uint8(img: np.ndarray) -> np.ndarray:
    """[-1, 1] CHW float -> HWC uint8."""
    img = np.clip((np.asarray(img) + 1.0) / 2.0, 0.0, 1.0)
    return (img.transpose(1, 2, 0) * 255).astype(np.uint8)


def save_image_grid(path: str | os.PathLike, images: np.ndarray, nrow: int | None = None) -> None:
    """images: [N, 3, H, W] in [-1, 1] -> one PNG grid with `nrow` images per row."""
    from PIL import Image

    n = len(images)
    nrow = nrow or n
    ncol = -(-n // nrow)
    h, w = images.shape[2], images.shape[3]
    grid = np.zeros((ncol * h, nrow * w, 3), np.uint8)
    for i, img in enumerate(images):
        r, c = divmod(i, nrow)
        grid[r * h : (r + 1) * h, c * w : (c + 1) * w] = to_uint8(img)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(grid).save(path)


def save_panel(path: str | os.PathLike, rows: dict[str, np.ndarray], size: int | None = None) -> None:
    """Reference-style comparison panel: one column per key (e.g. GT, thumb rec,
    residual, aligned residual, E1 rec), one row per batch item. All images are
    resized (nearest) to the largest height present unless `size` given."""
    mats = list(rows.values())
    b = mats[0].shape[0]
    size = size or max(m.shape[-1] for m in mats)

    def up(m):
        f = size // m.shape[-1]
        if f > 1:
            m = np.repeat(np.repeat(m, f, axis=2), f, axis=3)
        return m

    cols = [up(np.asarray(m)) for m in mats]
    panel = np.concatenate(cols, axis=3)  # side by side per item
    save_image_grid(path, panel, nrow=1)
