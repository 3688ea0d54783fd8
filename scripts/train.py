#!/usr/bin/env python
"""Training entry point (reference `train_ae.py` + `scripts/train/ffhq/stage*.sh`).

Implements the full 3-stage recipe:
  stage 1   — E0 on frozen-GAN samples (2D rec + latent-gt + 3D shape supervision),
              reference scripts/train/ffhq/stage1.sh
  stage 2.1 — cycle training of E1 (netLocal + ADA), E0 frozen, res_lambda 1,
              reference stage2.1.sh
  stage 2.2 — full runner: + SFT fusion block, --fix_ada, --swap_res, progressive
              pose curriculum, adversarial term (adv_lambda, full-res D interleaved
              every --d-interval with lazy R1 every --d-reg-every),
              reference stage2.2.sh + trainer.py:1100-1195

Examples:
  python scripts/train.py --stage 1 --iters 10000 --batch 4
  python scripts/train.py --stage 2.2 --iters 20000 --batch 4 --adv-lambda 0.01 \
      --r1 60 --data /path/to/ffhq --val-data /path/to/celebahq --work-dir runs/s22
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path as _P

sys.path.insert(0, str(_P(__file__).resolve().parent.parent))  # repo root
import time
from pathlib import Path

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=["1", "2.1", "2.2"], default="1")
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--optimizer", dest="optimizer", default="adam", choices=["adam", "ranger"])
    ap.add_argument("--work-dir", default="runs/train")
    ap.add_argument("--ckpt", default=None, help="orbax checkpoint to resume from")
    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument("--ckpt-every", type=int, default=1000)
    ap.add_argument("--val-every", type=int, default=2000, help="reference --val_interval")
    ap.add_argument("--saveimg-every", type=int, default=100, help="training panel dump cadence")
    ap.add_argument("--val-data", default=None, help="eval image dir for in-training validation")
    ap.add_argument("--data", default=None, help="real-image dir (D reals for stage 2.2 adv)")
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
    ap.add_argument("--hit-prob-consistency-lambda", type=float, default=0.0)
    ap.add_argument("--depth-lambda", type=float, default=0.0)
    ap.add_argument("--res-lambda", type=float, default=1.0)
    ap.add_argument("--tiny", action="store_true", help="tiny config (CI smoke)")
    ap.add_argument("--dtype", default=None, choices=["float32", "bfloat16"],
                    help="conv-stack compute dtype (bfloat16 halves HBM traffic on "
                         "the decoder/encoder/hourglass pyramids; params stay f32)")
    args = ap.parse_args()

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

        restored = ocp.StandardCheckpointer().restore(Path(args.ckpt).resolve())
        variables, loaded, skipped = warm_start_merge(variables, restored["variables"])
        print(f"warm-started from {args.ckpt}: {loaded} leaves loaded, "
              f"{skipped} shape-mismatched kept fresh")

    # true mean latents from the (frozen, ideally pretrained) generator mapping
    ml = model.apply(variables, jax.random.key(2), 1000, method=E3DGE.mean_latent)

    tx = make_optimizer(args.lr, args.optimizer)
    trainable = {
        "1": STAGE1_TRAINABLE,
        "2.1": STAGE21_TRAINABLE,
        "2.2": stage22_trainable(args.fix_ada),
    }[args.stage]
    state = create_train_state(variables, trainable, tx, ema=args.ema)
    from e3dge_tpu.utils.logger import print_parameter

    print_parameter(state.params)  # trainable audit (reference trainer.py:753-757)
    lambdas = dict(
        l2_lambda=1.0,
        latent_gt_lambda=1.0 if args.stage == "1" else 0.0,
        shape_uniform_lambda=0.1 if args.stage == "1" else 0.0,
        shape_surface_lambda=1.0 if args.stage == "1" else 0.0,
        res_lambda=args.res_lambda if args.stage != "1" else 0.0,
        adv_lambda=args.adv_lambda,
        hit_prob_consistency_lambda=args.hit_prob_consistency_lambda,
        depth_lambda=args.depth_lambda,
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

    if args.stage == "1":
        step = make_stage1_step(model, lambdas, tx, pose_scale_schedule=schedule)
    else:
        step = make_cycle_step(
            model,
            lambdas,
            tx,
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
    from e3dge_tpu.utils.logger import MetricLogger

    logger = MetricLogger(args.work_dir, config={"stage": args.stage, "cfg": cfg.to_dict()})
    key = jax.random.key(42)
    t0 = time.perf_counter()

    def sync_runner_variables():
        runner.variables = {"params": {**state.frozen, **state.params}, **state.extra}

    for it in range(args.iters):
        # == D step interleave (reference train_step, e3dge_2dalignonly_runner.py:467-516) ==
        if enable_adv and it % args.d_interval == 0:
            key, kd = jax.random.split(key)
            fakes, synth_reals = d_batch_fn(state, ml, kd, args.batch)
            if real_iter is not None:
                reals = jnp.asarray(next(real_iter)["image"])
            else:
                reals = synth_reals
            d_state, d_metrics = d_step_fn(d_state, reals, fakes)

        # == E step ==
        key, k = jax.random.split(key)
        if enable_adv:
            state, metrics = jstep(state, ml, k, args.batch, d_state.params)
        else:
            state, metrics = jstep(state, ml, k, args.batch)

        if (it + 1) % args.log_every == 0:
            m = {k2: float(v) for k2, v in metrics.items()}
            if enable_adv:
                m.update({f"d_{k2}": float(v) for k2, v in d_metrics.items()})
            rate = (it + 1) / (time.perf_counter() - t0)
            extras = f" pose_scale={float(schedule(it)):.2f}" if args.pose_curriculum else ""
            print(f"iter {it + 1}: loss={m['loss']:.4f} ({rate:.2f} it/s){extras} {m}")
            logger.log(it + 1, m)
        if args.val_data and (it + 1) % args.val_every == 0:
            sync_runner_variables()
            scores = runner.validation(args.val_data, batch_size=args.batch, max_images=8)
            print(f"iter {it + 1} validation: {scores}")
        if (it + 1) % args.ckpt_every == 0:
            sync_runner_variables()
            runner.save_checkpoint(name="latest")
    sync_runner_variables()
    runner.save_checkpoint(name="final")
    print("done.")


if __name__ == "__main__":
    main()
