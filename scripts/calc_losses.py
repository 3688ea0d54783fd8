#!/usr/bin/env python
"""Offline metrics between a results dir and a ground-truth dir.

Reference: `helper_scripts/calc_losses_on_images.py` (pairs images by filename
via GTResDataset, resizes to 256, computes per-image LPIPS or L2, writes
`inference_metrics/stat_<mode>.txt` + `scores_<mode>.json`). This version adds
psnr/ssim/id modes and runs the metric nets batched under jit.

  python scripts/calc_losses.py --mode lpips --data-path results/ --gt-path gt/
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path as _P

sys.path.insert(0, str(_P(__file__).resolve().parent.parent))  # repo root
from pathlib import Path

import numpy as np


def load_pairs(data_path: Path, gt_path: Path, size: int):
    """Filename-paired [-1,1] CHW arrays (reference GTResDataset semantics)."""
    from PIL import Image

    names, res, gts = [], [], []
    for f in sorted(data_path.iterdir()):
        if f.suffix.lower() not in (".png", ".jpg", ".jpeg"):
            continue
        g = gt_path / f.name
        if not g.exists():
            print(f"skip {f.name}: no ground-truth counterpart")
            continue

        def load(p):
            im = Image.open(p).convert("RGB").resize((size, size), Image.BILINEAR)
            return np.asarray(im, np.float32).transpose(2, 0, 1) / 127.5 - 1.0

        names.append(f.name)
        res.append(load(f))
        gts.append(load(g))
    if not names:
        raise SystemExit(f"no paired images between {data_path} and {gt_path}")
    return names, np.stack(res), np.stack(gts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--mode", default="lpips",
        choices=["lpips", "l2", "psnr", "ssim", "ssim_ref", "mae_ref", "id"],
        help="ssim_ref/mae_ref use the reference's printed conventions "
        "(kornia window-5 (1+SSIM)/2 and L1 on [-1,1], builder.py:171-182)",
    )
    ap.add_argument("--data-path", required=True, help="results dir")
    ap.add_argument("--gt-path", required=True, help="ground-truth dir (same filenames)")
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--lpips-ckpt", default=None)
    ap.add_argument("--arcface-ckpt", default=None)
    ap.add_argument("--out", default=None, help="default: <data-path>/../inference_metrics")
    args = ap.parse_args()

    import jax.numpy as jnp

    names, res, gts = load_pairs(Path(args.data_path), Path(args.gt_path), args.size)

    if args.mode in ("lpips", "id"):
        from e3dge_tpu.training.perceptual import make_perceptual_fns

        lpips_fn, id_fn = make_perceptual_fns(
            image_size=args.size, lpips_ckpt=args.lpips_ckpt, arcface_ckpt=args.arcface_ckpt
        )
        if args.mode == "lpips" and not args.lpips_ckpt:
            print("NOTE: LPIPS net is random-init (pass --lpips-ckpt for reference-comparable numbers)")
        if args.mode == "id" and not args.arcface_ckpt:
            print("NOTE: ArcFace net is random-init (pass --arcface-ckpt for reference-comparable numbers)")
        fn = {"lpips": lpips_fn, "id": id_fn}[args.mode]
        metric = lambda p, t: np.asarray(fn(jnp.asarray(p), jnp.asarray(t), per_sample=True))
    elif args.mode == "l2":
        metric = lambda p, t: np.mean((p - t) ** 2, axis=(1, 2, 3))
    elif args.mode == "psnr":
        from e3dge_tpu.training.losses import psnr

        metric = lambda p, t: np.array(
            [float(psnr(jnp.asarray(p[i : i + 1]), jnp.asarray(t[i : i + 1]), max_val=2.0)) for i in range(len(p))]
        )
    elif args.mode == "ssim_ref":
        from e3dge_tpu.training.losses import ssim_ref

        metric = lambda p, t: np.asarray(ssim_ref(jnp.asarray(p), jnp.asarray(t), per_sample=True))
    elif args.mode == "mae_ref":
        from e3dge_tpu.training.losses import mae_ref

        metric = lambda p, t: np.asarray(mae_ref(jnp.asarray(p), jnp.asarray(t), per_sample=True))
    else:  # ssim
        from e3dge_tpu.training.losses import ssim

        metric = lambda p, t: np.asarray(ssim(jnp.asarray(p), jnp.asarray(t), max_val=2.0, per_sample=True))

    scores: dict[str, float] = {}
    bs = args.batch_size
    for i in range(0, len(names), bs):
        vals = metric(res[i : i + bs], gts[i : i + bs])
        for name, v in zip(names[i : i + bs], np.atleast_1d(vals)):
            scores[name] = float(v)

    vals = np.array(list(scores.values()))
    result_str = f"Average loss is {vals.mean():.4f}+-{vals.std():.4f}"
    print("Finished with", args.data_path)
    print(result_str)

    out = Path(args.out) if args.out else Path(args.data_path).resolve().parent / "inference_metrics"
    out.mkdir(parents=True, exist_ok=True)
    (out / f"stat_{args.mode}.txt").write_text(result_str)
    (out / f"scores_{args.mode}.json").write_text(json.dumps(scores, indent=2))
    print("wrote", out / f"scores_{args.mode}.json")


if __name__ == "__main__":
    main()
