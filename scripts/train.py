#!/usr/bin/env python
"""Training entry point (reference `train_ae.py` + `scripts/train/ffhq/stage*.sh`).

Implements the full 3-stage recipe with the reference's loss surface:
  stage 1   — E0 on frozen-GAN samples (2D rec incl. LPIPS/ID + latent-gt + 3D
              shape supervision: surf/uniform SDF, surface normals, eikonal),
              reference scripts/train/ffhq/stage1.sh:36-55
  stage 2.1 — cycle training of E1 (netLocal + ADA), E0 frozen, res_lambda 1,
              reference stage2.1.sh
  stage 2.2 — full runner: + SFT fusion block, --fix_ada, progressive
              pose curriculum, adversarial term (adv_lambda, full-res D interleaved
              every --d-interval with lazy R1 every --d-reg-every),
              reference stage2.2.sh + trainer.py:1100-1195

Loss-lambda defaults follow the reference stage scripts exactly; `--vgg-lambda` is
the LPIPS weight (the reference's historical flag name, builder.py:168). LPIPS/ID
terms need their pretrained nets — pass --lpips-ckpt/--arcface-ckpt to ingest the
torch weights; without them the random-init surrogates train but are NOT the
reference objective (a warning is printed).

Checkpoints persist the FULL training state (optimizer moments, step, EMA, D state —
reference base_runner.py:252-285 saves `<optim>_optimizer` dicts); `--resume`
continues a run with an identical loss trajectory, while `--ckpt` warm-starts
variables only (cross-stage surgery, train_setup.py:144-177).

Examples:
  python scripts/train.py --stage 1 --iters 10000 --batch 4
  python scripts/train.py --stage 2.2 --iters 20000 --batch 4 --adv-lambda 0.01 \
      --r1 60 --data /path/to/ffhq --val-data /path/to/celebahq --work-dir runs/s22
  python scripts/train.py --stage 1 --resume runs/train/models_latest ...
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path as _P

sys.path.insert(0, str(_P(__file__).resolve().parent.parent))  # repo root
import time
from pathlib import Path

from e3dge_tpu.utils.platform import apply_platform_override

apply_platform_override()  # E3DGE_PLATFORM=cpu rescues runs when the TPU relay is down

import jax
import jax.numpy as jnp
import numpy as np

# loss-lambda defaults per stage (reference scripts/train/ffhq/stage{1,2.1,2.2}.sh)
STAGE_LAMBDA_DEFAULTS = {
    "1": dict(l2=1.0, vgg=0.8, id=0.1, latent_gt=1.0, surf_sdf=1.0,
              surf_normal=1.0, uniform_pts_sdf=0.2, eikonal=0.1),
    "2.1": dict(l2=1.0, vgg=0.8, id=0.1, latent_gt=0.0, surf_sdf=0.0,
                surf_normal=0.0, uniform_pts_sdf=0.0, eikonal=0.0),
    "2.2": dict(l2=1.0, vgg=1.0, id=0.1, latent_gt=0.0, surf_sdf=0.0,
                surf_normal=0.0, uniform_pts_sdf=0.0, eikonal=0.0),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=["1", "2.1", "2.2"], default="1")
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=5e-5, help="reference stage scripts use 5e-5")
    ap.add_argument("--optimizer", dest="optimizer", default="adam", choices=["adam", "ranger"])
    ap.add_argument("--work-dir", default="runs/train")
    ap.add_argument("--ckpt", default=None,
                    help="warm-start VARIABLES from a previous stage's checkpoint "
                         "(size-matched partial load; optimizer starts fresh)")
    ap.add_argument("--resume", default=None,
                    help="resume a run from its checkpoint dir: restores variables + "
                         "full TrainState (optimizer/step/EMA) + D state")
    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument("--ckpt-every", type=int, default=1000)
    ap.add_argument("--val-every", type=int, default=2000, help="reference --val_interval")
    ap.add_argument("--saveimg-every", type=int, default=100,
                    help="training panel dump cadence (reference --saveimg_interval; "
                         "0 disables)")
    ap.add_argument("--val-data", default=None, help="eval image dir for in-training validation")
    ap.add_argument("--data", default=None, help="real-image dir (D reals for stage 2.2 adv)")
    ap.add_argument("--wandb", action="store_true", help="log to wandb (reference --wandb)")
    # ---- loss recipe (reference stage scripts; None -> stage default) ----
    ap.add_argument("--l2-lambda", type=float, default=None)
    ap.add_argument("--vgg-lambda", type=float, default=None,
                    help="LPIPS weight (reference --vgg_lambda, builder.py:168)")
    ap.add_argument("--id-lambda", type=float, default=None,
                    help="ArcFace identity loss weight (reference --id_lambda)")
    ap.add_argument("--latent-gt-lambda", type=float, default=None)
    ap.add_argument("--surf-sdf-lambda", type=float, default=None,
                    help="surface SDF -> 0 (reference --surf_sdf_lambda)")
    ap.add_argument("--surf-normal-lambda", type=float, default=None)
    ap.add_argument("--uniform-pts-sdf-lambda", type=float, default=None)
    ap.add_argument("--eikonal-lambda", type=float, default=None)
    ap.add_argument("--lpips-ckpt", default=None, help="torch LPIPS (alex) weights to ingest")
    ap.add_argument("--arcface-ckpt", default=None, help="torch model_ir_se50.pth to ingest")
    # stage-2.2 switches (reference stage2.2.sh)
    ap.add_argument("--adv-lambda", type=float, default=0.0)
    ap.add_argument("--adaptive-d-loss", action="store_true",
                    help="VQGAN adaptive adversarial weight (reference --adaptive_D_loss)")
    ap.add_argument("--discriminator-lambda", type=float, default=None)
    ap.add_argument("--r1", type=float, default=60.0)
    ap.add_argument("--d-interval", type=int, default=1, help="train D every N iters")
    ap.add_argument("--d-reg-every", type=int, default=16)
    ap.add_argument("--fix-ada", action="store_true", help="freeze the ADA aligner (stage 2.2)")
    ap.add_argument("--ema", action="store_true", help="EMA-accumulate trainable params")
    ap.add_argument("--pose-curriculum", action="store_true", help="--progressive_pose_sampling")
    ap.add_argument("--use-ref-view-weight", action="store_true",
                    help="occlusion-weight 3D-projected feats (cycle_runner.py:133-161)")
    ap.add_argument("--occlusion-dtype", default="bfloat16", choices=["float32", "bfloat16"],
                    help="field dtype for the stop-gradient occlusion re-integration "
                         "(bf16+fast_sin serving path; the training field itself stays f32)")
    ap.add_argument("--occlusion-mode", default="exact", choices=["exact", "texture"],
                    help="use_ref_view_weight occlusion source: 'exact' re-integrates "
                         "a ray through every query point (reference semantics, "
                         "cycle_runner.py:133-161; ~24x a render's field work); "
                         "'texture' trilinearly samples the ref render's own weight "
                         "volume — a light-field approximation of the same stop-grad "
                         "weighting (tolerance-pinned by tests/test_render.py)")
    ap.add_argument("--sample-field-dtype", default="float32", choices=["float32", "bfloat16"],
                    help="field dtype for the frozen-teacher target rendering in "
                         "synthetic_sample (stop-gradient data generation; float32 "
                         "[default] reproduces reference-exact targets; bfloat16 is "
                         "the TPU perf mode the stage scripts opt into, ~25 ms/step "
                         "faster at batch 4; 3D SDF grid targets are always f32)")
    ap.add_argument("--field-dtype", default="float32", choices=["float32", "bfloat16"],
                    help="compute dtype of the DIFFERENTIATED SIREN field (training "
                         "render). float32 [default] keeps reference-exact training "
                         "numerics (fused-cos sin VJP); bfloat16 runs the bf16+"
                         "fast_sin field under autodiff — 3.1x faster field backward "
                         "(bench_field --grad: 4.4 vs 13.5 ms at the 98k-pt shape); "
                         "loss drift is tolerance-pinned by tests/test_precision.py")
    ap.add_argument("--remat-field", action="store_true",
                    help="rematerialize the SIREN field in the backward pass "
                         "(jax.checkpoint) instead of storing the [B,H,W,S,width+4] "
                         "activations — HBM for FLOPs; identical numerics "
                         "(tests/test_training.py pins loss+grad equality)")
    ap.add_argument("--hit-prob-consistency-lambda", type=float, default=0.0)
    ap.add_argument("--depth-lambda", type=float, default=0.0)
    ap.add_argument("--res-lambda", type=float, default=1.0)
    # volume-D training (from-scratch StyleSDF D, reference trainer.py:1165-1186
    # non-enable_G1 branch; the released E3DGE recipe keeps the pretrained D fixed)
    ap.add_argument("--train-volume-d", action="store_true",
                    help="interleave the volume-D step (GAN logit + viewpoint head + R1)")
    ap.add_argument("--view-lambda", type=float, default=1.0, help="viewpoint regression weight")
    ap.add_argument("--tiny", action="store_true", help="tiny config (CI smoke)")
    ap.add_argument("--dtype", default=None, choices=["float32", "bfloat16"],
                    help="conv-stack compute dtype (bfloat16 halves HBM traffic on "
                         "the decoder/encoder/hourglass pyramids; params stay f32)")
    ap.add_argument("--debug-nans", action="store_true",
                    help="jax debug_nans/debug_infs — the reference's always-on "
                         "torch.autograd.set_detect_anomaly (train_ae.py:16-20); "
                         "raises at the op that produced a non-finite value, ~2x cost")
    args = ap.parse_args()
    if args.debug_nans:
        from e3dge_tpu.utils.profiling import enable_debug_checks

        enable_debug_checks()

    from e3dge_tpu.models.discriminator import Discriminator
    from e3dge_tpu.models.e3dge import E3DGE, LatentMeans, adaptive_avg_pool
    from e3dge_tpu.parallel.mesh import make_mesh, replicate
    from e3dge_tpu.runner import Runner
    from e3dge_tpu.training.data import ImageFolderDataset
    from e3dge_tpu.training.steps import (
        STAGE1_TRAINABLE,
        STAGE21_TRAINABLE,
        create_d_state,
        create_train_state,
        make_cycle_step,
        make_full_d_step,
        make_optimizer,
        make_stage1_step,
        make_volume_d_step,
        pose_curriculum,
        stage22_trainable,
    )
    from e3dge_tpu.utils import config as C

    if args.tiny:
        cfg = C.tiny_full_config() if args.stage != "1" else C.tiny_test_config()
    else:
        cfg = C.stage1_config() if args.stage == "1" else C.stage2_config()
    if args.dtype:
        import dataclasses

        cfg = dataclasses.replace(cfg, dtype=args.dtype)
    if args.use_ref_view_weight and args.occlusion_dtype != "float32":
        cfg = C._with(cfg, renderer=dict(occlusion_field_dtype=args.occlusion_dtype))
    if args.occlusion_mode != "exact":
        cfg = C._with(cfg, renderer=dict(occlusion_mode=args.occlusion_mode))
    if args.sample_field_dtype != cfg.renderer.sample_field_dtype:
        cfg = C._with(cfg, renderer=dict(sample_field_dtype=args.sample_field_dtype))
    if args.field_dtype != cfg.renderer.field_dtype:
        cfg = C._with(cfg, renderer=dict(field_dtype=args.field_dtype))
    if args.remat_field:
        cfg = C._with(cfg, renderer=dict(remat_field=True))

    model = E3DGE(cfg)
    imgs = jnp.zeros((2, 3, cfg.pifu.load_size, cfg.pifu.load_size))
    ml = LatentMeans(
        renderer=jnp.zeros((1, cfg.renderer.depth + 1, cfg.renderer.style_dim)),
        decoder=jnp.zeros((1, cfg.decoder.n_latent, cfg.decoder.style_dim)),
    )
    # jit the init: one compiled program instead of thousands of eager ops
    # (critical on remote-compiled TPU backends)
    variables = jax.jit(model.init)({"params": jax.random.key(0), "noise": jax.random.key(1)}, imgs, ml)

    if args.ckpt:
        # warm-start from a previous stage's checkpoint (reference --ckpt surgery,
        # train_setup.py:144-177 + misc_utils.py:207-213 size-matched partial load:
        # stage 2.1 loads the stage-1 E0 but keeps fresh E1/netLocal params; stage
        # 2.2 loads the stage-2.1 netLocal/ADA and adds a fresh fusion block)
        import orbax.checkpoint as ocp

        from e3dge_tpu.training.train_utils import warm_start_merge

        ckpt_path = Path(args.ckpt).resolve()
        var_path = ckpt_path / "variables"  # current layout: separate items
        if var_path.is_dir():
            restored = ocp.StandardCheckpointer().restore(var_path)
        else:  # legacy single-item layout
            restored = ocp.StandardCheckpointer().restore(ckpt_path)["variables"]
        variables, loaded, skipped = warm_start_merge(variables, restored)
        print(f"warm-started from {args.ckpt}: {loaded} leaves loaded, "
              f"{skipped} shape-mismatched kept fresh")

    # true mean latents from the (frozen, ideally pretrained) generator mapping
    ml = model.apply(variables, jax.random.key(2), 1000, method=E3DGE.mean_latent)

    # ---- loss recipe (stage defaults <- reference scripts, flag-overridable) ----
    dflt = STAGE_LAMBDA_DEFAULTS[args.stage]
    pick = lambda flag, key: dflt[key] if flag is None else flag
    lambdas = dict(
        l2_lambda=pick(args.l2_lambda, "l2"),
        lpips_lambda=pick(args.vgg_lambda, "vgg"),
        id_lambda=pick(args.id_lambda, "id"),
        latent_gt_lambda=pick(args.latent_gt_lambda, "latent_gt"),
        shape_surface_lambda=pick(args.surf_sdf_lambda, "surf_sdf"),
        shape_normal_lambda=pick(args.surf_normal_lambda, "surf_normal"),
        shape_uniform_lambda=pick(args.uniform_pts_sdf_lambda, "uniform_pts_sdf"),
        eikonal_lambda=pick(args.eikonal_lambda, "eikonal"),
        res_lambda=args.res_lambda if args.stage != "1" else 0.0,
        adv_lambda=args.adv_lambda,
        hit_prob_consistency_lambda=args.hit_prob_consistency_lambda,
        depth_lambda=args.depth_lambda,
    )
    lpips_fn = id_fn = None
    if lambdas["lpips_lambda"] > 0 or lambdas["id_lambda"] > 0:
        from e3dge_tpu.training.perceptual import make_perceptual_fns

        if not (args.lpips_ckpt or args.arcface_ckpt):
            print("WARNING: LPIPS/ID lambdas active without --lpips-ckpt/--arcface-ckpt; "
                  "using RANDOM-INIT perceptual nets (smooth surrogates, NOT the "
                  "reference objective)")
        lpips_fn, id_fn = make_perceptual_fns(
            image_size=min(cfg.decoder.size, 256),
            lpips_ckpt=args.lpips_ckpt,
            arcface_ckpt=args.arcface_ckpt,
        )
        if lambdas["lpips_lambda"] <= 0:
            lpips_fn = None
        if lambdas["id_lambda"] <= 0:
            id_fn = None

    tx = make_optimizer(args.lr, args.optimizer)
    trainable = {
        "1": STAGE1_TRAINABLE,
        "2.1": STAGE21_TRAINABLE,
        "2.2": stage22_trainable(args.fix_ada),
    }[args.stage]
    state = create_train_state(variables, trainable, tx, ema=args.ema)
    from e3dge_tpu.utils.logger import print_parameter

    print_parameter(state.params)  # trainable audit (reference trainer.py:753-757)
    print(f"lambdas: { {k: v for k, v in lambdas.items() if v} }")
    print(
        f"dtypes: compute={cfg.dtype} field={cfg.renderer.field_dtype} "
        f"frozen-teacher-sampling={cfg.renderer.sample_field_dtype}"
        + (
            " (NOTE: teacher targets are bf16+fast_sin, not reference-exact f32)"
            if cfg.renderer.sample_field_dtype != "float32"
            else ""
        )
    )
    schedule = pose_curriculum() if args.pose_curriculum else (lambda step: jnp.asarray(1.0))

    # ---- optional full-res D (stage 2.2 adversarial training) ----
    enable_adv = args.stage == "2.2" and args.adv_lambda > 0
    d_state = d_step_fn = d_apply = real_iter = None
    d_res = min(cfg.decoder.size, 256)  # reference --D_init_size 256
    if enable_adv:
        d_model = Discriminator(input_size=d_res)
        d_vars = jax.jit(d_model.init)(jax.random.key(3), jnp.zeros((2, 3, d_res, d_res)))
        d_tx = make_optimizer(args.lr * (args.d_reg_every / (args.d_reg_every + 1)))
        d_lambdas = dict(
            discriminator_lambda=(
                args.discriminator_lambda if args.discriminator_lambda is not None else args.adv_lambda
            ),
            r1=args.r1,
        )
        d_step_fn, d_apply = make_full_d_step(d_model, d_lambdas, d_tx, d_reg_every=args.d_reg_every)
        d_step_fn = jax.jit(d_step_fn)
        d_state = create_d_state(d_vars["params"], d_tx)
        if args.data:
            ds = ImageFolderDataset(args.data, size=d_res)
            real_iter = ds.iter_batches(args.batch)
        else:
            print("WARNING: --adv-lambda set without --data; using frozen-GAN samples "
                  "as D reals (smoke mode — reference trains the D against FFHQ)")

        # jitted fake-producer for the D step: fresh synthetic refs -> full
        # reconstruction (reference trainer.py:1110-1117 image2image)
        def _d_batch(state, mean_latents, rng, bs):
            variables = {"params": {**state.frozen, **state.params}, **state.extra}
            k1, k2 = jax.random.split(rng)
            batch = model.apply(
                variables, k1, bs, 1.0, method=E3DGE.synthetic_sample, rngs={"noise": k2}
            )
            out = model.apply(
                variables,
                batch["images"],
                mean_latents,
                batch["cam_settings"],
                method=E3DGE.image2image,
                rngs={"noise": k2},
            )
            fakes = adaptive_avg_pool(out["res_render_out"]["gen_imgs"], d_res)
            reals = adaptive_avg_pool(batch["images"], d_res)
            return jax.lax.stop_gradient(fakes), jax.lax.stop_gradient(reals)

        d_batch_fn = jax.jit(_d_batch, static_argnums=(3,))

    # ---- optional volume-D training (reference trainer.py:1165-1186) ----
    vd_state = vd_step_fn = vd_batch_fn = None
    if args.train_volume_d:
        vd_tx = make_optimizer(args.lr)
        vd_state = create_train_state(variables, ("volume_discriminator",), vd_tx)
        vd_step_fn = jax.jit(
            make_volume_d_step(
                model,
                dict(discriminator_lambda=1.0, viewpoint_lambda=args.view_lambda, r1=args.r1),
                vd_tx,
            )
        )

        def _vd_batch(state, mean_latents, rng, bs):
            """(real_thumbs, fake_thumbs, fake_viewpoints): fakes are encoder
            reconstructions rendered at the KNOWN sampling cams."""
            variables = {"params": {**state.frozen, **state.params}, **state.extra}
            k1, k2, k3 = jax.random.split(rng, 3)
            batch = model.apply(
                variables, k1, bs, 1.0, method=E3DGE.synthetic_sample, rngs={"noise": k2}
            )
            out = model.apply(
                variables,
                batch["images"],
                mean_latents,
                batch["cam_settings"],
                method=E3DGE.image2image_global,
                rngs={"noise": k2},
            )
            real_b = model.apply(
                variables, k3, bs, 1.0, method=E3DGE.synthetic_sample, rngs={"noise": k3}
            )
            sg = jax.lax.stop_gradient
            return (
                sg(real_b["thumb_images"]),
                sg(out["gen_thumb_imgs"]),
                sg(batch["cam_settings"].viewpoint),
            )

        vd_batch_fn = jax.jit(_vd_batch, static_argnums=(3,))

    if args.stage == "1":
        step = make_stage1_step(model, lambdas, tx, lpips_fn=lpips_fn, id_fn=id_fn,
                                pose_scale_schedule=schedule)
    else:
        step = make_cycle_step(
            model,
            lambdas,
            tx,
            lpips_fn=lpips_fn,
            id_fn=id_fn,
            pose_scale_schedule=schedule,
            use_ref_view_weight=args.use_ref_view_weight,
            d_apply=d_apply if enable_adv else None,
            adaptive_d_loss=args.adaptive_d_loss,
        )
    jstep = jax.jit(step, static_argnums=(3,))

    mesh = make_mesh()
    state = replicate(state, mesh)
    ml = replicate(ml, mesh)

    runner = Runner(cfg, variables, ml, work_dir=args.work_dir)

    # both adversarial-state flavors ride the checkpoint as one bundle so a resumed
    # run keeps the full-res D *and* the volume D optimizers (structure must match
    # the saving run's flags)
    def d_bundle():
        if d_state is None and vd_state is None:
            return None
        return {"full": d_state, "volume": vd_state}

    start_it = 0
    if args.resume:
        restored_state, restored_d = runner.load_checkpoint(
            args.resume, state_template=state, d_template=d_bundle()
        )
        if restored_state is None:
            raise SystemExit(f"--resume {args.resume}: no training state in checkpoint "
                             "(use --ckpt for a variables-only warm start)")
        state = restored_state
        if restored_d is not None:
            d_state = restored_d.get("full", d_state) or d_state
            vd_state = restored_d.get("volume", vd_state) or vd_state
        start_it = int(jax.device_get(state.step))
        # keep the frozen generator/variables consistent with the restored params
        variables = {"params": {**state.frozen, **state.params}, **state.extra}
        runner.variables = variables
        ml = model.apply(variables, jax.random.key(2), 1000, method=E3DGE.mean_latent)
        ml = replicate(ml, mesh)
        print(f"resumed from {args.resume} at iter {start_it}")

    from e3dge_tpu.utils.logger import MetricLogger

    logger = MetricLogger(args.work_dir, use_wandb=args.wandb,
                          config={"stage": args.stage, "cfg": cfg.to_dict()})
    base_key = jax.random.key(42)
    t0 = time.perf_counter()
    d_metrics = vd_metrics = {}

    def sync_runner_variables():
        runner.variables = {"params": {**state.frozen, **state.params}, **state.extra}

    # one jitted synthetic-batch producer for the panel dumps (tiny: reuses the
    # model's sampler; runs only every --saveimg-every iters)
    panel_sample_fn = None

    def save_train_panel(it):
        """Reference trainer.py:229-240: dump GT | thumb | residual | aligned | rec
        panels from a fresh synthetic batch under work_dir/train/images."""
        nonlocal panel_sample_fn
        from e3dge_tpu.utils.image_io import save_panel

        sync_runner_variables()
        if panel_sample_fn is None:
            panel_sample_fn = jax.jit(
                lambda v, rng, bs: model.apply(
                    v, rng, bs, 1.0, method=E3DGE.synthetic_sample, rngs={"noise": rng}
                ),
                static_argnums=(2,),
            )
        # panel keys live in the upper uint32 range, disjoint from per-iter step keys
        batch = panel_sample_fn(runner.variables, jax.random.fold_in(base_key, 2**31 + it), args.batch)
        out = runner.image2image(batch["images"])
        rec = out["res_render_out"] if "res_render_out" in out else out
        res = min(batch["images"].shape[-1], 256)
        rows = {"gt": np.asarray(adaptive_avg_pool(batch["images"], res))}
        rows["thumb"] = np.asarray(rec["gen_thumb_imgs"])
        if "ref_info" in out:
            rows["residual"] = np.asarray(out["ref_info"]["orig_res_gt"])
        if "aligned_res" in out:
            rows["aligned_res"] = np.asarray(out["aligned_res"])
        rows["rec"] = np.asarray(adaptive_avg_pool(rec["gen_imgs"], res))
        save_panel(Path(args.work_dir) / "train" / "images" / f"iter_{it:07d}.png", rows)

    for it in range(start_it, args.iters):
        # per-iter keys derived from the iteration index so --resume reproduces
        # the exact same data/noise stream as an uninterrupted run
        it_key = jax.random.fold_in(base_key, it)
        k_d, k_vd, k_e = jax.random.split(it_key, 3)

        # == D step interleave (reference train_step, e3dge_2dalignonly_runner.py:467-516) ==
        if enable_adv and it % args.d_interval == 0:
            fakes, synth_reals = d_batch_fn(state, ml, k_d, args.batch)
            if real_iter is not None:
                reals = jnp.asarray(next(real_iter)["image"])
            else:
                reals = synth_reals
            d_state, d_metrics = d_step_fn(d_state, reals, fakes)

        # == volume-D step (opt-in; reference non-enable_G1 branch) ==
        if vd_state is not None and it % args.d_interval == 0:
            real_th, fake_th, fake_vp = vd_batch_fn(state, ml, k_vd, args.batch)
            vd_state, vd_metrics = vd_step_fn(vd_state, real_th, fake_th, fake_vp)
            # the E step's pose estimator must see the updated D immediately
            state = state._replace(
                frozen={**state.frozen, "volume_discriminator": vd_state.params["volume_discriminator"]}
            )

        # == E step ==
        if enable_adv:
            state, metrics = jstep(state, ml, k_e, args.batch, d_state.params)
        else:
            state, metrics = jstep(state, ml, k_e, args.batch)

        if (it + 1) % args.log_every == 0:
            m = {k2: float(v) for k2, v in metrics.items()}
            if enable_adv:
                m.update({f"d_{k2}": float(v) for k2, v in d_metrics.items()})
            if vd_state is not None:
                m.update({f"vd_{k2}": float(v) for k2, v in vd_metrics.items()})
            rate = (it + 1 - start_it) / (time.perf_counter() - t0)
            extras = f" pose_scale={float(schedule(it)):.2f}" if args.pose_curriculum else ""
            print(f"iter {it + 1}: loss={m['loss']:.4f} ({rate:.2f} it/s){extras} {m}")
            logger.log(it + 1, m)
        if args.saveimg_every and (it + 1) % args.saveimg_every == 0:
            save_train_panel(it + 1)
        if args.val_data and (it + 1) % args.val_every == 0:
            sync_runner_variables()
            scores = runner.validation(args.val_data, batch_size=args.batch, max_images=8)
            print(f"iter {it + 1} validation: {scores}")
        if (it + 1) % args.ckpt_every == 0:
            sync_runner_variables()
            runner.save_checkpoint(state=state, name="latest", d_state=d_bundle())
    sync_runner_variables()
    runner.save_checkpoint(state=state, name="final", d_state=d_bundle())
    print("done.")


if __name__ == "__main__":
    main()
