"""Datasets (L6): real-image folders for training/eval.

Mirrors the reference `project/data/dataset.py`:
  ImageFolderDataset    — MultiResolutionDatasetLMS (:92): folder glob, random
                          horizontal flip, (size, 64) resized pair
  EvalImageDataset      — ImagesDatasetEval (:231): numeric-name-sorted test images

Host-side numpy/PIL pipeline — the TPU path receives ready [-1, 1] NCHW batches.
(The heavy "dataset" in E3DGE training is the frozen GAN sampled on-device —
e3dge_tpu/models/e3dge.py synthetic_sample — so there is no input bottleneck.)
"""

from __future__ import annotations

import os
import re
from pathlib import Path
from typing import Iterator, Sequence

import numpy as np

IMG_EXTS = {".png", ".jpg", ".jpeg", ".webp", ".bmp"}


def _list_images(root: str | Path) -> list[Path]:
    files = [p for p in sorted(Path(root).rglob("*")) if p.suffix.lower() in IMG_EXTS]
    if not files:
        raise FileNotFoundError(f"no images under {root}")
    return files


def _numeric_sort(paths: Sequence[Path]) -> list[Path]:
    def key(p: Path):
        m = re.findall(r"\d+", p.stem)
        return (int(m[0]) if m else 0, p.stem)

    return sorted(paths, key=key)


def load_image(path: str | Path, size: int) -> np.ndarray:
    """[-1, 1] float32 CHW."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    if img.size != (size, size):
        img = img.resize((size, size), Image.HAMMING)
    arr = np.asarray(img, dtype=np.float32) / 127.5 - 1.0
    return arr.transpose(2, 0, 1)


def landmark_heatmaps(lms: np.ndarray, resolution: int, sigma: float = 2.0) -> np.ndarray:
    """[N, 2] pixel-space landmarks -> [N, res, res] gaussian heatmaps.

    Working version of the reference's MultiResolutionDatasetLMS landmark branch
    (data/dataset.py:117-123 calls an undefined `heatmap_generator` behind
    `--lms_lambda`; the intended HRNet-style gaussians are supplied here).
    Landmarks with any coordinate outside the image give an all-zero map."""
    ys, xs = np.mgrid[0:resolution, 0:resolution].astype(np.float32)
    maps = np.zeros((len(lms), resolution, resolution), np.float32)
    for i, (x, y) in enumerate(np.asarray(lms, np.float32)):
        if 0 <= x < resolution and 0 <= y < resolution:
            maps[i] = np.exp(-((xs - x) ** 2 + (ys - y) ** 2) / (2.0 * sigma**2))
    return maps


class ImageFolderDataset:
    """Training dataset: returns (full-res, 64-thumb) pairs with random hflip.

    `lms_root` (reference `--lms_path` + MultiResolutionDatasetLMS) points at a
    directory of per-image `<stem>.npy` [N, 2] pixel landmarks; batches then also
    carry `lms` gaussian heatmaps, hflipped together with the image."""

    def __init__(
        self,
        root: str | Path,
        size: int = 256,
        thumb_size: int = 64,
        hflip: bool = True,
        lms_root: str | Path | None = None,
    ):
        self.paths = _list_images(root)
        self.size = size
        self.thumb_size = thumb_size
        self.hflip = hflip
        self.lms_root = Path(lms_root) if lms_root is not None else None

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, i: int) -> dict[str, np.ndarray]:
        img = load_image(self.paths[i], self.size)
        out: dict[str, np.ndarray] = {}
        if self.lms_root is not None:
            lms = np.load(self.lms_root / (self.paths[i].stem + ".npy"))
            out["lms"] = landmark_heatmaps(lms, self.size)
        if self.hflip and np.random.rand() < 0.5:
            img = img[:, :, ::-1].copy()
            if "lms" in out:  # flip heatmaps with the image (dataset.py:129-130)
                out["lms"] = out["lms"][:, :, ::-1].copy()
        f = self.size // self.thumb_size
        thumb = img.reshape(3, self.thumb_size, f, self.thumb_size, f).mean((2, 4))
        out.update({"image": img, "thumb": thumb})
        return out

    def iter_batches(self, batch_size: int, shuffle: bool = True, seed: int = 0) -> Iterator[dict]:
        rng = np.random.RandomState(seed)
        while True:
            order = rng.permutation(len(self)) if shuffle else np.arange(len(self))
            for s in range(0, len(order) - batch_size + 1, batch_size):
                items = [self[int(j)] for j in order[s : s + batch_size]]
                yield {k: np.stack([it[k] for it in items]) for k in items[0]}


class ShapeNetDataset:
    """ShapeNet renders with per-image pose files (reference
    MultiResolutionDataset_ShapeNet, data/dataset.py:328-377: a list file of image
    paths, each with a 4x4 c2w pose at ../pose/<stem>.txt; the reference zeroes
    the rotation/translation of the c2w before inverting — replicated here)."""

    def __init__(self, list_file: str | Path, size: int = 256, zero_pose: bool = True):
        list_file = Path(list_file)
        self.root = list_file.parent
        self.img_paths = [self.root / line.strip() for line in list_file.read_text().splitlines() if line.strip()]
        if not self.img_paths:
            raise FileNotFoundError(f"empty ShapeNet list {list_file}")
        self.size = size
        self.zero_pose = zero_pose

    def __len__(self):
        return len(self.img_paths)

    def __getitem__(self, i: int) -> dict:
        p = self.img_paths[i]
        img = load_image(p, self.size)
        pose_file = p.parent.parent / "pose" / (p.stem + ".txt")
        pose = np.loadtxt(pose_file).reshape(4, 4).astype(np.float32)
        if self.zero_pose:  # reference dataset.py:357-359
            pose[:3, :3] = np.eye(3)
            pose[:3, 3] = 0.0
        extrinsics = np.linalg.inv(pose)
        return {
            "image": img,
            "img_path": str(p),
            "poses": pose[:3, :4],
            "extrinsics": extrinsics[:3, :4].astype(np.float32),
        }

    def iter_batches(self, batch_size: int) -> Iterator[dict]:
        for s in range(0, len(self), batch_size):
            items = [self[j] for j in range(s, min(s + batch_size, len(self)))]
            yield {
                "image": np.stack([it["image"] for it in items]),
                "img_path": [it["img_path"] for it in items],
                "poses": np.stack([it["poses"] for it in items]),
                "extrinsics": np.stack([it["extrinsics"] for it in items]),
            }


class EvalImageDataset:
    """CelebA-HQ-style test split: numeric-sorted, returns image + path."""

    def __init__(self, root: str | Path, size: int = 256):
        self.paths = _numeric_sort(_list_images(root))
        self.size = size

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, i: int) -> dict:
        return {"image": load_image(self.paths[i], self.size), "img_path": str(self.paths[i])}

    def iter_batches(self, batch_size: int) -> Iterator[dict]:
        for s in range(0, len(self), batch_size):
            items = [self[j] for j in range(s, min(s + batch_size, len(self)))]
            yield {
                "image": np.stack([it["image"] for it in items]),
                "img_path": [it["img_path"] for it in items],
            }
