"""NoW benchmark dataset loader for 3D face evaluation.

Mirrors the reference `NoWDataset` (`project/data/now.py:10-160`): reads the NoW
image-path list, loads each iPhone picture with its detected face bbox, and produces
a similarity-transform crop at `crop_size` scaled by `scale` around the box center —
the input format the 3D eval (trainer.py evaluate3D, :2103-2208) expects.

Implemented with PIL/numpy (no skimage/cv2 dependency): the similarity transform for
axis-aligned square crops reduces to a crop + resize. Metric core lives in
training/eval3d.py (chamfer / depth / normal); the official NoW point-to-scan error
additionally needs the NoW scans + landmark alignment, which requires the NoW release
assets.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np


class NoWDataset:
    def __init__(
        self,
        folder: str | Path,
        crop_size: int = 224,
        scale: float = 1.6,
        mode: str = "val",
    ):
        folder = Path(folder)
        data_paths = {
            "val": folder / "imagepathsvalidation.txt",
            "test": folder / "imagepathstest.txt",
        }
        self.data_lines = [l.strip() for l in data_paths[mode].read_text().splitlines() if l.strip()]
        self.imagefolder = folder / "final_release_version" / "iphone_pictures"
        self.bbxfolder = folder / "final_release_version" / "detected_face"
        self.crop_size = crop_size
        self.scale = scale

    def __len__(self):
        return len(self.data_lines)

    def __getitem__(self, index: int) -> dict:
        from PIL import Image

        rel = self.data_lines[index]
        imagepath = self.imagefolder / rel
        bbx = np.load(self.bbxfolder / rel.replace(".jpg", ".npy"), allow_pickle=True, encoding="latin1").item()
        left, right, top, bottom = bbx["left"], bbx["right"], bbx["top"], bbx["bottom"]

        img = Image.open(imagepath).convert("RGB")
        old_size = (right - left + bottom - top) / 2.0
        cx = right - (right - left) / 2.0
        cy = bottom - (bottom - top) / 2.0
        size = int(old_size * self.scale)

        # axis-aligned square crop centered on the box, then resize — equivalent to
        # the reference's similarity warp for this (no-rotation) transform
        box = (cx - size / 2.0, cy - size / 2.0, cx + size / 2.0, cy + size / 2.0)
        crop = img.crop(tuple(int(round(v)) for v in box)).resize(
            (self.crop_size, self.crop_size), Image.BILINEAR
        )
        arr = np.asarray(crop, dtype=np.float32) / 127.5 - 1.0  # [-1, 1]
        return {
            "image": arr.transpose(2, 0, 1),
            "imagename": Path(rel).stem,
            "subject": rel.split(os.sep)[0] if os.sep in rel else rel.split("/")[0],
        }

    def iter_batches(self, batch_size: int):
        for s in range(0, len(self), batch_size):
            items = [self[j] for j in range(s, min(s + batch_size, len(self)))]
            yield {
                "image": np.stack([it["image"] for it in items]),
                "imagename": [it["imagename"] for it in items],
                "subject": [it["subject"] for it in items],
            }
