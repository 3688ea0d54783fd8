#!/usr/bin/env python
"""Evaluation / demo entry point (reference `test_ae.py` + `scripts/test/*.sh`).

Examples:
  python scripts/eval.py --data /path/to/celebahq_test --ckpt runs/train/models_final
  python scripts/eval.py --data imgs/ --mode video --views 16
  python scripts/eval.py --data imgs/ --mode edit --smile 1.0
  python scripts/eval.py --data imgs/ --mode mesh --out meshes/
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path as _P

sys.path.insert(0, str(_P(__file__).resolve().parent.parent))  # repo root
from pathlib import Path

from e3dge_tpu.utils.platform import apply_platform_override

apply_platform_override()  # E3DGE_PLATFORM=cpu rescues runs when the TPU relay is down

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--mode", choices=["metrics", "video", "edit", "mesh", "now", "hdtf", "project"],
                    default="metrics")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--torch-ckpt", default=None,
                    help="reference StyleSDF .pt to ingest (g_ema generator + "
                         "netLocal; its 'd' entry, when present, also fills the "
                         "volume discriminator = pose estimator)")
    ap.add_argument("--torch-encoder-ckpt", default=None,
                    help="reference E3DGE training save_dict .pt to ingest "
                         "(encoder / netLocal / grid_align / Fuse_sft_block — "
                         "base_runner.save_network layout); apply AFTER "
                         "--torch-ckpt for the released-weights parity run")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--smile", type=float, default=1.0)
    ap.add_argument("--boundaries", default=None)
    ap.add_argument("--out", default="runs/eval")
    ap.add_argument("--max-images", type=int, default=None)
    ap.add_argument("--lpips-ckpt", default=None, help="LPIPS alex .pth to ingest")
    ap.add_argument("--arcface-ckpt", default=None, help="model_ir_se50.pth to ingest")
    ap.add_argument("--no-perceptual", action="store_true",
                    help="skip LPIPS/ID metric nets (faster; scores lack those columns)")
    ap.add_argument("--tiny", action="store_true")
    # optimization inversion (reference Projectors, projectors.py:29-734;
    # defaults = options.py:1474-1490)
    ap.add_argument("--project-steps", type=int, default=300, help="first_inv_steps")
    ap.add_argument("--project-lr", type=float, default=5e-3, help="first_inv_lr")
    ap.add_argument("--wspace", action="store_true", help="optimize W (one row) instead of W+")
    ap.add_argument("--pti", action="store_true", help="PTI generator fine-tuning after projection")
    ap.add_argument("--pti-steps", type=int, default=100, help="max_pti_steps")
    ap.add_argument("--projection-root", default=None,
                    help="with --mode metrics: validate renders from saved "
                         "projection latents instead of the encoder (the reference's "
                         "--inference_projection_validation, trainer.py:355-379); "
                         "add --pti to also load each image's PTI generator")
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"],
                    help="conv-stack activation dtype. float32 (default) reproduces "
                         "reference-exact metrics; bfloat16 is the fast serving mode "
                         "(~1.7x on v5e, bf16-tolerance outputs — tests/test_precision.py)")
    ap.add_argument("--field-dtype", default=None, choices=["float32", "bfloat16"],
                    help="SIREN field dtype (bf16+fast_sin serving path); "
                         "default follows --dtype")
    ap.add_argument("--debug-nans", action="store_true",
                    help="jax debug_nans/debug_infs — the reference's always-on "
                         "torch.autograd.set_detect_anomaly (train_ae.py:16-20); "
                         "raises at the op that produced a non-finite value, ~2x cost")
    args = ap.parse_args()
    if args.debug_nans:
        from e3dge_tpu.utils.profiling import enable_debug_checks

        enable_debug_checks()

    from e3dge_tpu.models.e3dge import E3DGE, LatentMeans
    from e3dge_tpu.runner import Runner
    from e3dge_tpu.training.data import EvalImageDataset
    from e3dge_tpu.utils import config as C
    from e3dge_tpu.utils.mesh import save_obj

    cfg = C.tiny_full_config() if args.tiny else C.demo_view_synthesis_config()
    if args.dtype != "float32":
        import dataclasses

        cfg = dataclasses.replace(cfg, dtype=args.dtype)
    fdt = args.field_dtype or args.dtype
    if fdt != "float32":
        cfg = C._with(cfg, renderer=dict(field_dtype=fdt))
    model = E3DGE(cfg)
    imgs0 = jnp.zeros((1, 3, cfg.pifu.load_size, cfg.pifu.load_size))
    ml = LatentMeans(
        renderer=jnp.zeros((1, cfg.renderer.depth + 1, cfg.renderer.style_dim)),
        decoder=jnp.zeros((1, cfg.decoder.n_latent, cfg.decoder.style_dim)),
    )
    # jit the init: one compiled program instead of thousands of eager ops
    # (critical on remote-compiled TPU backends)
    variables = jax.jit(model.init)({"params": jax.random.key(0), "noise": jax.random.key(1)}, imgs0, ml)

    lpips_fn = id_fn = None
    if args.mode in ("metrics", "project") and not args.no_perceptual:
        from e3dge_tpu.training.perceptual import make_perceptual_fns

        lpips_fn, id_fn = make_perceptual_fns(
            image_size=min(cfg.decoder.size, 256),
            lpips_ckpt=args.lpips_ckpt,
            arcface_ckpt=args.arcface_ckpt,
        )
        if not (args.lpips_ckpt and args.arcface_ckpt):
            print("NOTE: LPIPS/ID nets are random-init (pass --lpips-ckpt/--arcface-ckpt "
                  "for reference-comparable numbers)")

    runner = Runner(cfg, variables, ml, work_dir=args.out, lpips_fn=lpips_fn, id_fn=id_fn)
    if args.ckpt:
        runner.load_checkpoint(args.ckpt)  # full path or a models_<name> in --out
    if args.torch_ckpt or args.torch_encoder_ckpt:
        from e3dge_tpu.utils.torch_ckpt import (
            _sd_to_numpy,
            ingest_variables,
            load_raw_ckpt,
            load_torch_file,
            normalize_g_ema_keys,
            split_e3dge_save_dict,
            split_generator_sd,
        )

        if args.torch_ckpt:
            raw = load_raw_ckpt(args.torch_ckpt)
            sd = normalize_g_ema_keys(load_torch_file(args.torch_ckpt))
            gen_sd, local_sd = split_generator_sd(sd)
            sds = {"generator": gen_sd, "local": local_sd}
            if isinstance(raw, dict) and isinstance(raw.get("d"), dict):
                # StyleSDF 'd' = the volume discriminator whose viewpoint head is
                # the pose estimator (train_setup.py:139-141)
                sds["volume_discriminator"] = _sd_to_numpy(raw["d"])
            runner.variables, missing = ingest_variables(runner.variables, sds, strict=False)
            print(f"ingested torch generator ckpt ({len(missing)} unmatched leaves)")
        if args.torch_encoder_ckpt:
            sds = split_e3dge_save_dict(load_raw_ckpt(args.torch_encoder_ckpt))
            runner.variables, missing = ingest_variables(runner.variables, sds, strict=False)
            print(f"ingested E3DGE save_dict [{', '.join(sds)}] "
                  f"({len(missing)} unmatched leaves)")
        ml = runner.model.apply(runner.variables, jax.random.key(2), 10000, method=E3DGE.mean_latent)
        runner.mean_latents = ml

    if args.mode == "metrics":
        if args.projection_root:
            scores = runner.validation_from_latents(
                args.data, args.projection_root, batch_size=1 if args.pti else args.batch,
                max_images=args.max_images, use_pti=args.pti,
            )
        else:
            scores = runner.validation(args.data, batch_size=args.batch, max_images=args.max_images)
        print(scores)
    elif args.mode == "project":
        results = runner.project_images(
            args.data, steps=args.project_steps, lr=args.project_lr,
            pti_steps=args.pti_steps if args.pti else 0, wspace=args.wspace,
            batch_size=args.batch, max_images=args.max_images,
        )
        print(f"projected {len(results)} images -> {runner.work_dir / 'projection'}")
        for r in results:
            print(f"  {r['name']}: final_loss={r['final_loss']:.4f}")
    elif args.mode == "video":
        ds = EvalImageDataset(args.data, size=cfg.pifu.load_size)
        batch = next(ds.iter_batches(args.batch))
        frames = runner.render_video(batch["image"], n_views=args.views)
        np.save(Path(args.out) / "video_frames.npy", frames)
        print("wrote", Path(args.out) / "video_frames.npy", frames.shape)
        from e3dge_tpu.utils.image_io import write_video

        for i, vid in enumerate(frames):  # one trajectory video per image
            p = write_video(Path(args.out) / "videos" / f"{i}.mp4", vid)
        print(f"wrote {len(frames)} trajectory videos under", Path(args.out) / "videos")
    elif args.mode == "edit":
        assert args.boundaries, "--boundaries required for editing"
        runner.load_boundaries(args.boundaries)
        ds = EvalImageDataset(args.data, size=cfg.pifu.load_size)
        batch = next(ds.iter_batches(args.batch))
        out = runner.edit_and_render(batch["image"], [0, args.smile, 0, 0, 0])
        np.save(Path(args.out) / "edited.npy", np.asarray(out["res_render_out"]["gen_imgs"]))
        print("wrote edited renders")
    elif args.mode == "now":
        # NoW 3D benchmark: mesh export + point-to-scan scoring when scan assets
        # are present (reference test_ae.py deca_eval -> evaluate3D)
        print(runner.evaluate3d(args.data, batch_size=args.batch))
    elif args.mode == "hdtf":
        # HDTF novel-view video eval (reference nvs_video -> render_HDTF)
        print(runner.render_hdtf(args.data, max_frames=args.max_images or 250, batch_size=args.batch))
    elif args.mode == "mesh":
        ds = EvalImageDataset(args.data, size=cfg.pifu.load_size)
        batch = next(ds.iter_batches(args.batch))
        ref = runner.encode_ref(jnp.asarray(batch["image"]))
        meshes = runner.latent2surface(ref["pred_latents"])
        outdir = Path(args.out)
        outdir.mkdir(parents=True, exist_ok=True)
        for i, (verts, faces) in enumerate(meshes):
            save_obj(outdir / f"mesh_{i}.obj", verts, faces)
        print(f"wrote {len(meshes)} meshes to {outdir}")


if __name__ == "__main__":
    main()
