#!/usr/bin/env python
"""Compose inversion trajectory videos into one demo gallery video.

Reference: `helper_scripts/gallary_video.py` — reads per-id texture and geometry
trajectory videos, splices geometry into the right half of each texture frame
(`mix_tex_geo_vid`), tiles them into a gallery, and writes one mp4. This version
takes the `video_frames.npy` arrays produced by `scripts/eval.py --mode video`
(shape [B, V, 3, H, W], values in [-1, 1]) and writes via cv2/PIL (no ffmpeg).

  python scripts/eval.py --data imgs/ --mode video --out runs/vid
  python scripts/gallery_video.py --frames runs/vid/video_frames.npy \
      [--geo-frames runs/vid_geo/video_frames.npy] --cols 4 --out gallery.mp4
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path as _P

sys.path.insert(0, str(_P(__file__).resolve().parent.parent))  # repo root

import numpy as np


def mix_tex_geo(tex: np.ndarray, geo: np.ndarray) -> np.ndarray:
    """Right half of each frame shows the geometry render (reference
    mix_tex_geo_vid, gallary_video.py:96-107)."""
    if geo.shape != tex.shape:  # nearest-resize geo to the tex resolution
        fy = tex.shape[-2] / geo.shape[-2]
        fx = tex.shape[-1] / geo.shape[-1]
        iy = (np.arange(tex.shape[-2]) / fy).astype(int).clip(0, geo.shape[-2] - 1)
        ix = (np.arange(tex.shape[-1]) / fx).astype(int).clip(0, geo.shape[-1] - 1)
        geo = geo[..., iy[:, None], ix[None, :]]
    w = tex.shape[-1]
    out = tex.copy()
    out[..., w // 2 :] = geo[..., w // 2 :]
    return out


def tile(videos: np.ndarray, cols: int) -> np.ndarray:
    """[B, V, 3, H, W] -> [V, 3, rows*H, cols*W], padding short grids with black."""
    b, v, c, h, w = videos.shape
    rows = -(-b // cols)
    grid = np.full((rows * cols, v, c, h, w), -1.0, videos.dtype)
    grid[:b] = videos
    grid = grid.reshape(rows, cols, v, c, h, w)
    return grid.transpose(2, 3, 0, 4, 1, 5).reshape(v, c, rows * h, cols * w)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", required=True, help="texture video_frames.npy [B,V,3,H,W]")
    ap.add_argument("--geo-frames", default=None, help="geometry video_frames.npy (optional)")
    ap.add_argument("--cols", type=int, default=4)
    ap.add_argument("--fps", type=int, default=15)
    ap.add_argument("--bounce", action="store_true", help="play the trajectory forward then back")
    ap.add_argument("--out", default="gallery.mp4")
    args = ap.parse_args()

    from e3dge_tpu.utils.image_io import write_video

    tex = np.load(args.frames)
    if args.geo_frames:
        tex = mix_tex_geo(tex, np.load(args.geo_frames))
    frames = tile(tex, min(args.cols, tex.shape[0]))
    if args.bounce:
        frames = np.concatenate([frames, frames[::-1]], axis=0)
    out = write_video(args.out, frames, fps=args.fps)
    print(f"wrote {out} ({frames.shape[0]} frames @ {frames.shape[-1]}x{frames.shape[-2]})")


if __name__ == "__main__":
    main()
