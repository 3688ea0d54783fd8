"""Semantic editing via latent boundaries + 3D toonification.

Mirrors the reference editing path (`trainer.py:2390-2496`): InterfaceGAN-style
boundary directions per attribute, stored per latent space ('renderer' W 256-d and
'decoder' W 512-d), added to the predicted W+ codes with user scales. Toonify
(demo_toonify.sh) is a pure weight-swap: load a domain-transferred generator into the
same graph — expressed here as `toonify_params`.
"""

from __future__ import annotations

from pathlib import Path
from typing import Mapping, Sequence

import jax.numpy as jnp
import numpy as np

ATTRS = ("Bangs", "Smiling", "No_Beard", "Young", "Eyeglasses")
SPACES = ("renderer", "decoder")


def load_boundaries(boundary_dir: str | Path, attrs: Sequence[str] = ATTRS[:4]) -> dict:
    """Load {attr: {space: [1, D] direction}} from `{space}_{attr}/boundary.npy`
    (reference _load_editing_directions, trainer.py:2390-2411)."""
    root = Path(boundary_dir)
    out: dict = {}
    for attr in attrs:
        out[attr] = {}
        for space in SPACES:
            out[attr][space] = np.load(root / f"{space}_{attr}" / "boundary.npy")
    return out


def edit_code(
    pred_latents: Sequence[jnp.ndarray],
    boundaries: Mapping[str, Mapping[str, np.ndarray]],
    scales: Mapping[str, float] | Sequence[float],
) -> list[jnp.ndarray]:
    """Offset both W+ codes along attribute boundaries (trainer.py:2415-2456).

    scales: {attr: scale} or a list aligned with ATTRS. Directions broadcast over
    the W+ row axis exactly like the reference's expand_dims.
    """
    if not isinstance(scales, Mapping):
        scales = dict(zip(ATTRS, list(scales) + [0.0] * (len(ATTRS) - len(scales))))
    edited = []
    for idx, space in enumerate(SPACES):
        code = pred_latents[idx]
        if code is None:
            edited.append(None)
            continue
        for attr, s in scales.items():
            if not s or attr not in boundaries:
                continue
            b = jnp.asarray(boundaries[attr][space])  # [1, D]
            if code.ndim == 3:
                b = b[:, None]  # [1, 1, D] broadcasts over W+ rows
            code = code + s * b
        edited.append(code)
    return edited


def toonify_params(params: dict, toon_generator_params: dict) -> dict:
    """3D toonification = swapping in domain-transferred generator weights
    (demo_toonify.sh:21-24 loads a different G ckpt into the same architecture)."""
    return {**params, "generator": toon_generator_params}
