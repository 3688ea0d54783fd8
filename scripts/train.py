#!/usr/bin/env python
"""Training entry point (reference `train_ae.py` + `scripts/train/ffhq/stage*.sh`).

Examples:
  python scripts/train.py --stage 1 --iters 10000 --batch 4
  python scripts/train.py --stage 2.2 --iters 20000 --batch 4 --work-dir runs/stage22
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
    ap.add_argument("--tiny", action="store_true", help="tiny config (CI smoke)")
    args = ap.parse_args()

    from e3dge_tpu.models.e3dge import E3DGE, LatentMeans
    from e3dge_tpu.parallel.mesh import make_mesh, replicate
    from e3dge_tpu.runner import Runner
    from e3dge_tpu.training.steps import (
        STAGE1_TRAINABLE,
        STAGE21_TRAINABLE,
        STAGE22_TRAINABLE,
        create_train_state,
        make_cycle_step,
        make_optimizer,
        make_stage1_step,
    )
    from e3dge_tpu.utils import config as C

    if args.tiny:
        cfg = C.tiny_full_config() if args.stage != "1" else C.tiny_test_config()
    else:
        cfg = C.stage1_config() if args.stage == "1" else C.stage2_config()

    model = E3DGE(cfg)
    imgs = jnp.zeros((2, 3, cfg.pifu.load_size, cfg.pifu.load_size))
    ml = LatentMeans(
        renderer=jnp.zeros((1, cfg.renderer.depth + 1, cfg.renderer.style_dim)),
        decoder=jnp.zeros((1, cfg.decoder.n_latent, cfg.decoder.style_dim)),
    )
    # jit the init: one compiled program instead of thousands of eager ops
    # (critical on remote-compiled TPU backends)
    variables = jax.jit(model.init)({"params": jax.random.key(0), "noise": jax.random.key(1)}, imgs, ml)

    # true mean latents from the (frozen, ideally pretrained) generator mapping
    means = model.apply(variables, jax.random.key(2), 1000, method=E3DGE.mean_latent)
    ml = means

    tx = make_optimizer(args.lr, args.optimizer)
    trainable = {"1": STAGE1_TRAINABLE, "2.1": STAGE21_TRAINABLE, "2.2": STAGE22_TRAINABLE}[args.stage]
    state = create_train_state(variables, trainable, tx)
    lambdas = dict(
        l2_lambda=1.0,
        latent_gt_lambda=1.0 if args.stage == "1" else 0.0,
        shape_uniform_lambda=0.1 if args.stage == "1" else 0.0,
        shape_surface_lambda=1.0 if args.stage == "1" else 0.0,
        res_lambda=1.0 if args.stage != "1" else 0.0,
    )
    if args.stage == "1":
        step = make_stage1_step(model, lambdas, tx)
    else:
        step = make_cycle_step(model, lambdas, tx)
    jstep = jax.jit(step, static_argnums=(3,))

    mesh = make_mesh()
    state = replicate(state, mesh)
    ml = replicate(ml, mesh)

    runner = Runner(cfg, variables, ml, work_dir=args.work_dir)
    key = jax.random.key(42)
    t0 = time.perf_counter()
    for it in range(args.iters):
        key, k = jax.random.split(key)
        state, metrics = jstep(state, ml, k, args.batch)
        if (it + 1) % args.log_every == 0:
            m = {k2: float(v) for k2, v in metrics.items()}
            rate = (it + 1) / (time.perf_counter() - t0)
            print(f"iter {it + 1}: loss={m['loss']:.4f} ({rate:.2f} it/s) {m}")
        if (it + 1) % args.ckpt_every == 0:
            runner.variables = {"params": {**state.frozen, **state.params}, **state.extra}
            runner.save_checkpoint(name="latest")
    runner.variables = {"params": {**state.frozen, **state.params}, **state.extra}
    runner.save_checkpoint(name="final")
    print("done.")


if __name__ == "__main__":
    main()
