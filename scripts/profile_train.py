#!/usr/bin/env python
"""Training-step profiler: times the full-scale stage-1 step and its pieces on the
current backend (the one real chip under axon), comparing perf variants.

Timing methodology (CLAUDE.md): block_until_ready does not sync through the axon
relay; every number amortizes N dispatches against one scalar value pull.

Usage: python scripts/profile_train.py [--variants base,remat] [--batch 4] [--iters 8]
"""

from __future__ import annotations

import argparse
import contextlib
import sys
import time
from pathlib import Path as _P

sys.path.insert(0, str(_P(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from e3dge_tpu.utils.profiling import trace


def time_fn(fn, sync, n=8, warmup=1):
    for _ in range(warmup):
        out = fn()
    _ = sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    _ = sync(out)
    return (time.perf_counter() - t0) / n * 1000.0  # ms


def build(cfg_kwargs, batch, dtype=None, perceptual=False):
    import dataclasses

    from __graft_entry__ import fast_init
    from e3dge_tpu.models.e3dge import E3DGE, LatentMeans
    from e3dge_tpu.training.steps import (
        STAGE1_TRAINABLE,
        create_train_state,
        make_optimizer,
        make_stage1_step,
    )
    from e3dge_tpu.utils.config import _with, stage1_config

    cfg = stage1_config()
    if cfg_kwargs:
        cfg = _with(cfg, renderer=cfg_kwargs).validate()
    if dtype:
        cfg = dataclasses.replace(cfg, dtype=dtype)
    model = E3DGE(cfg)
    ml = LatentMeans(
        renderer=jnp.zeros((1, cfg.renderer.depth + 1, cfg.renderer.style_dim)),
        decoder=jnp.zeros((1, cfg.decoder.n_latent, cfg.decoder.style_dim)),
    )
    imgs = jnp.zeros((2, 3, cfg.pifu.load_size, cfg.pifu.load_size))
    variables = fast_init(model, {"params": jax.random.key(0), "noise": jax.random.key(1)}, imgs, ml)
    tx = make_optimizer(1e-4)
    state = create_train_state(variables, STAGE1_TRAINABLE, tx)
    # full reference stage-1 recipe (stage1.sh:36-55); vgg/id terms only when the
    # perceptual nets are built (they add an AlexNet+IR-SE-50 fwd+bwd per step)
    lambdas = dict(l2_lambda=1.0, latent_gt_lambda=1.0, shape_uniform_lambda=0.2,
                   shape_surface_lambda=1.0, shape_normal_lambda=1.0, eikonal_lambda=0.1)
    lpips_fn = id_fn = None
    if perceptual:
        from e3dge_tpu.training.perceptual import make_perceptual_fns

        lambdas.update(lpips_lambda=0.8, id_lambda=0.1)
        lpips_fn, id_fn = make_perceptual_fns(image_size=256)
    step = jax.jit(
        make_stage1_step(model, lambdas, tx, lpips_fn=lpips_fn, id_fn=id_fn),
        static_argnums=(3,), donate_argnums=(0,),
    )
    return cfg, model, variables, ml, state, step


def build_cycle(batch, dtype="bfloat16", use_ref_view_weight=False, occlusion_dtype=None,
                renderer_kwargs=None):
    """Stage-2.2 cycle step at full scale (stage2_config) — times the E1 path and
    the occlusion re-integration (reference cycle_runner.py:133-161)."""
    import dataclasses

    from __graft_entry__ import fast_init
    from e3dge_tpu.models.e3dge import E3DGE, LatentMeans
    from e3dge_tpu.training.steps import (
        STAGE22_TRAINABLE,
        create_train_state,
        make_cycle_step,
        make_optimizer,
    )
    from e3dge_tpu.utils.config import _with, stage2_config

    cfg = stage2_config()
    if renderer_kwargs:
        cfg = _with(cfg, renderer=renderer_kwargs).validate()
    if occlusion_dtype:
        cfg = _with(cfg, renderer=dict(occlusion_field_dtype=occlusion_dtype)).validate()
    if dtype:
        cfg = dataclasses.replace(cfg, dtype=dtype)
    model = E3DGE(cfg)
    ml = LatentMeans(
        renderer=jnp.zeros((1, cfg.renderer.depth + 1, cfg.renderer.style_dim)),
        decoder=jnp.zeros((1, cfg.decoder.n_latent, cfg.decoder.style_dim)),
    )
    imgs = jnp.zeros((2, 3, cfg.pifu.load_size, cfg.pifu.load_size))
    variables = fast_init(model, {"params": jax.random.key(0), "noise": jax.random.key(1)}, imgs, ml)
    tx = make_optimizer(1e-4)
    state = create_train_state(variables, STAGE22_TRAINABLE, tx)
    lambdas = dict(l2_lambda=1.0, res_lambda=1.0)
    step = jax.jit(
        make_cycle_step(model, lambdas, tx, use_ref_view_weight=use_ref_view_weight),
        static_argnums=(3,), donate_argnums=(0,),
    )
    return cfg, model, variables, ml, state, step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="base,remat")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--pieces", action="store_true", help="also time sample/forward pieces")
    ap.add_argument("--cycle", action="store_true",
                    help="profile the stage-2.2 cycle step instead; variants: "
                         "base / refweight / refweight_bf16occ")
    ap.add_argument("--trace", default=None, metavar="DIR",
                    help="capture an xprof trace of the timed loop into DIR "
                         "(parse with scripts/parse_trace.py)")
    args = ap.parse_args()

    maybe_trace = (
        (lambda: trace(args.trace)) if args.trace else contextlib.nullcontext
    )

    if args.cycle:
        cycle_cfgs = {
            "base": dict(),
            "refweight": dict(use_ref_view_weight=True),
            "refweight_bf16occ": dict(use_ref_view_weight=True, occlusion_dtype="bfloat16"),
            # r4 TPU stack: bf16 teacher sampling + bf16 differentiated field
            # (the cycle xprof showed THREE f32 field passes per step)
            "r4": dict(renderer_kwargs=dict(
                sample_field_dtype="bfloat16", field_dtype="bfloat16")),
            "r4_refweight": dict(use_ref_view_weight=True, occlusion_dtype="bfloat16",
                                 renderer_kwargs=dict(
                sample_field_dtype="bfloat16", field_dtype="bfloat16")),
            # + texture-mode occlusion (light-field lookup of the ref render's
            # weight volume instead of per-point re-integration)
            "r4_refweight_tex": dict(use_ref_view_weight=True,
                                     renderer_kwargs=dict(
                sample_field_dtype="bfloat16", field_dtype="bfloat16",
                occlusion_mode="texture")),
        }
        for name in args.variants.split(","):
            cfg, model, variables, ml, state, step = build_cycle(args.batch, **cycle_cfgs[name])
            key = jax.random.key(7)
            st = state

            def run():
                nonlocal st, key
                key, k = jax.random.split(key)
                st, metrics = step(st, ml, k, args.batch)
                return metrics["loss"]

            with maybe_trace():
                ms = time_fn(run, lambda x: float(x), n=args.iters)
            print(f"[cycle/{name}] stage-2.2 step batch={args.batch}: {ms:.1f} ms/step "
                  f"({args.batch * 1000 / ms:.1f} img/s/chip)", flush=True)
        return

    variant_cfgs = {
        "base": {},
        "remat": dict(remat_field=True),
        "n18": dict(n_samples=18),          # reference stage1.sh trains with 18
        "remat_n18": dict(remat_field=True, n_samples=18),
        "bf16": dict(_dtype="bfloat16"),
        "bf16_recipe": dict(_dtype="bfloat16", _perceptual=True),  # + LPIPS/ID terms
        "recipe": dict(_perceptual=True),
        # the bench.py r4 stack (bf16 convs + bf16 teacher sampling, f32 field)
        "r4": dict(sample_field_dtype="bfloat16", _dtype="bfloat16"),
        # + bf16 differentiated field (grad_bf16 4.38 vs grad_f32 13.5 ms
        # standalone, bench_field --grad; r2's 343->388 regression predates the
        # flattened [B,N,C] field query — re-measured at step level here)
        "r4_bf16field": dict(
            sample_field_dtype="bfloat16", field_dtype="bfloat16", _dtype="bfloat16"
        ),
    }
    for name in args.variants.split(","):
        vk = dict(variant_cfgs[name])
        dtype = vk.pop("_dtype", None)
        perceptual = vk.pop("_perceptual", False)
        cfg, model, variables, ml, state, step = build(vk, args.batch, dtype=dtype, perceptual=perceptual)

        # pieces FIRST: the full step donates `state`, whose leaves alias `variables`
        if args.pieces:
            from e3dge_tpu.models.e3dge import E3DGE

            sample = jax.jit(
                lambda v, k, bs: model.apply(v, k, bs, 1.0, method=E3DGE.synthetic_sample,
                                             rngs={"noise": k}),
                static_argnums=(2,),
            )
            ms_s = time_fn(lambda: sample(variables, jax.random.key(1), args.batch)["images"],
                           lambda x: float(x.sum()), n=args.iters)
            print(f"[{name}]   synthetic_sample: {ms_s:.1f} ms", flush=True)

            fwd = jax.jit(
                lambda v, imgs, ml_: model.apply(v, imgs, ml_, method=E3DGE.image2image_global,
                                                 rngs={"noise": jax.random.key(2)})["gen_imgs"]
            )
            imgs = jnp.zeros((args.batch, 3, cfg.pifu.load_size, cfg.pifu.load_size))
            ms_f = time_fn(lambda: fwd(variables, imgs, ml), lambda x: float(x.sum()), n=args.iters)
            print(f"[{name}]   image2image_global fwd: {ms_f:.1f} ms", flush=True)

        key = jax.random.key(7)
        st = state

        def run():
            nonlocal st, key
            key, k = jax.random.split(key)
            st, metrics = step(st, ml, k, args.batch)
            return metrics["loss"]

        with maybe_trace():
            ms = time_fn(run, lambda x: float(x), n=args.iters)
        print(f"[{name}] stage-1 step batch={args.batch}: {ms:.1f} ms/step "
              f"({args.batch * 1000 / ms:.1f} img/s/chip)", flush=True)


if __name__ == "__main__":
    main()
