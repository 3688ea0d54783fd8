#!/usr/bin/env python
"""Stage-2 convergence probe (VERDICT r4 Missing #3 / Weak #5).

Trains the stage-2.2 cycle step on a tiny config for a few hundred iterations
against a frozen random-init GAN "world" and demonstrates the *training effect*
the reference's stage 2 is built for (e3dge_2dalignonly_runner.py:354-465): the
E1-conditioned cross-view reconstruction must LEARN to beat the stage-1 global
baseline on a HELD-OUT batch of synthetic id-paired views.

Held-out metrics (computed with train=False at fixed eval keys, never trained on):
  l2_local_full  — E1-conditioned query-view FULL-RES render vs the GT image
  l2_global_full — the pure global (stage-1 latents only) full render, same view
  l2_local / l2_global — same pair at thumb resolution (auxiliary: on the tiny
    random-init frozen GAN the thumbs are nearly latent-invariant, so this pair
    has no dynamic range — the training effect lives in the full-res path,
    where the E1 residual features condition the decoder via SFT fusion)
At iteration 0 the E1 branch is a provable no-op (zero-init modulation heads),
so l2_local_full == the fusion-off render; convergence = l2_local_full dropping
below l2_global_full and below its own iter-0 value.

Variants record the occlusion-weighting ablation on the SAME seed — exact
re-integration vs the texture-mode light-field approximation — settling whether
texture mode changes a real training trajectory (VERDICT r4 Weak #5):
  base      — no ref-view weighting (released recipe default)
  refweight — use_ref_view_weight + exact occlusion re-integration
  texture   — use_ref_view_weight + occlusion_mode="texture"

Usage:
  E3DGE_PLATFORM=cpu python scripts/convergence_probe.py \
      --iters 300 --eval-every 50 --variants base,refweight,texture \
      --out docs/train_runs/r5_convergence_probe.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path as _P

sys.path.insert(0, str(_P(__file__).resolve().parent.parent))

from e3dge_tpu.utils.platform import apply_platform_override

apply_platform_override()

import jax
import jax.numpy as jnp


def build(variant: str):
    import dataclasses

    from e3dge_tpu.models.e3dge import E3DGE, LatentMeans
    from e3dge_tpu.training.steps import (
        STAGE22_TRAINABLE,
        create_train_state,
        make_cycle_step,
        make_optimizer,
    )
    from e3dge_tpu.utils.config import _with, tiny_full_config

    cfg = tiny_full_config()
    if variant == "texture":
        cfg = _with(cfg, renderer=dict(occlusion_mode="texture")).validate()
    model = E3DGE(cfg)
    ml = LatentMeans(
        renderer=jnp.zeros((1, cfg.renderer.depth + 1, cfg.renderer.style_dim)),
        decoder=jnp.zeros((1, cfg.decoder.n_latent, cfg.decoder.style_dim)),
    )
    imgs = jnp.zeros((2, 3, cfg.pifu.load_size, cfg.pifu.load_size))
    variables = model.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1)}, imgs, ml
    )
    tx = make_optimizer(3e-4)
    state = create_train_state(variables, STAGE22_TRAINABLE, tx)
    step = jax.jit(
        make_cycle_step(
            model,
            dict(l2_lambda=1.0, res_lambda=1.0),
            tx,
            use_ref_view_weight=(variant != "base"),
        ),
        static_argnums=(3,),
    )
    return cfg, model, variables, ml, state, step


def make_eval(model, ml, variant: str, bs: int = 4):
    """Held-out evaluation on a FIXED synthetic batch (eval keys disjoint from
    the training key stream by fold_in tag)."""
    from e3dge_tpu.models.e3dge import E3DGE
    from e3dge_tpu.training.steps import swap_tree

    k_eval = jax.random.fold_in(jax.random.key(999), 7)

    @jax.jit
    def eval_fn(params_all, extra):
        variables = {"params": params_all, **extra}
        batch = model.apply(
            variables, k_eval, bs, 1.0, True,
            method=E3DGE.synthetic_sample, rngs={"noise": k_eval},
        )
        ref_info = model.apply(
            variables, batch["images"], ml, batch["cam_settings"],
            train=False, method=E3DGE.encode_ref_images, rngs={"noise": k_eval},
        )
        que_cam = swap_tree(batch["cam_settings"])
        que_out = model.apply(
            variables, ref_info, que_cam, train=False,
            use_ref_view_weight=(variant != "base"),
            method=E3DGE.que_render_given_ref, rngs={"noise": k_eval},
        )
        gt_thumb = swap_tree(batch["thumb_images"])
        local = que_out["res_render_out"]["gen_thumb_imgs"]
        glob = que_out["que_info"]["gen_thumb_imgs"]
        # stage-1 baseline at the query view: full decode from the global
        # latents alone, no E1 conditioning (what a pure-global model renders)
        glob_full = model.apply(
            variables, ref_info["pred_latents"], que_cam,
            train=False, method=E3DGE.latent2image, rngs={"noise": k_eval},
        )["gen_imgs"]
        gt_full = swap_tree(batch["images"])
        l2 = lambda a, b: jnp.mean((a - b) ** 2)
        return {
            "l2_local": l2(local, gt_thumb),
            "l2_global": l2(glob, gt_thumb),
            "l2_local_full": l2(que_out["res_render_out"]["gen_imgs"], gt_full),
            "l2_global_full": l2(glob_full, gt_full),
        }

    return eval_fn


def run_variant(variant: str, iters: int, eval_every: int, bs: int):
    print(f"[{variant}] building + compiling...", flush=True)
    cfg, model, variables, ml, state, step = build(variant)
    eval_fn = make_eval(model, ml, variant)
    curve = []

    def record(i):
        params_all = {**state.frozen, **state.params}
        m = eval_fn(params_all, state.extra)
        row = {k: float(v) for k, v in m.items()}
        row["iter"] = i
        curve.append(row)
        print(f"[{variant}] iter {i}: full_local {row['l2_local_full']:.5f} "
              f"full_global {row['l2_global_full']:.5f} "
              f"thumb {row['l2_local']:.5f}/{row['l2_global']:.5f}", flush=True)

    t0 = time.time()
    record(0)
    key = jax.random.key(3)
    train_loss = None
    for i in range(1, iters + 1):
        key, k = jax.random.split(key)
        state, metrics = step(state, ml, k, bs)
        if i % eval_every == 0 or i == iters:
            train_loss = float(metrics["loss"])
            record(i)
    print(f"[{variant}] {iters} iters in {time.time() - t0:.0f}s "
          f"(final train loss {train_loss:.5f})", flush=True)
    return curve


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--eval-every", type=int, default=50)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--variants", default="base,refweight,texture")
    ap.add_argument("--out", default="docs/train_runs/r5_convergence_probe.json")
    args = ap.parse_args()

    results = {}
    for v in args.variants.split(","):
        results[v] = run_variant(v, args.iters, args.eval_every, args.batch)

    out = _P(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps({"iters": args.iters, "curves": results}, indent=1))
    print(f"wrote {out}")

    # convergence verdicts (full-res path — where the E1 training effect lives)
    for v, curve in results.items():
        first, last = curve[0], curve[-1]
        improved = last["l2_local_full"] < first["l2_local_full"]
        beats = last["l2_local_full"] < last["l2_global_full"]
        print(f"[{v}] full {first['l2_local_full']:.5f} -> {last['l2_local_full']:.5f} "
              f"(improved={improved}); vs global {last['l2_global_full']:.5f} "
              f"(beats_baseline={beats})")


if __name__ == "__main__":
    main()
