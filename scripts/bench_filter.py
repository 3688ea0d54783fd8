#!/usr/bin/env python
"""Standalone benchmark of the E1 local filter (context convs + stacked
hourglass) at the cycle-step shape.

The r5 cycle xprof (336 ms stack) attributes 80 ms/step to `local.filter`, with
30 ms of it pure data formatting: every TorchConv/GroupNorm pair transposes
NCHW<->NHWC and XLA does not cancel the pairs across the reflect-pads /
elementwise seams. This bench isolates the filter so layout experiments can be
measured directly (CLAUDE.md: value-pull sync only).

Usage: python scripts/bench_filter.py [--batch 4] [--dtype bfloat16] [--iters 20]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path as _P

sys.path.insert(0, str(_P(__file__).resolve().parent.parent))

from e3dge_tpu.utils.platform import apply_platform_override

apply_platform_override()

import jax
import jax.numpy as jnp


def time_fn(fn, sync, n=20, warmup=2):
    for _ in range(warmup):
        out = fn()
    _ = sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    _ = sync(out)
    return (time.perf_counter() - t0) / n * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from e3dge_tpu.models.pifu.local_net import LocalFeatureNet
    from e3dge_tpu.utils.config import PifuConfig

    cfg = PifuConfig()
    model = LocalFeatureNet(cfg)
    dt = jnp.dtype(args.dtype)
    B = args.batch
    resid = jnp.zeros((B, 3, cfg.load_size, cfg.load_size), dt)
    depth = jnp.zeros((B, 1, cfg.load_size, cfg.load_size), dt)
    # init at f32 like training state; compute dtype comes from the input
    k = jax.random.key(0)
    variables = jax.jit(
        lambda: model.init(k, resid.astype(jnp.float32), depth.astype(jnp.float32),
                           jnp.zeros((B, 3, 8)), jnp.eye(4)[None].repeat(B, 0))
    )()
    params = variables["params"]

    fwd = jax.jit(lambda p, r, d: model.apply(
        {"params": p}, r, d, method=LocalFeatureNet.filter))

    def loss(p, r, d):
        out = model.apply({"params": p}, r, d, method=LocalFeatureNet.filter)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    # grads wrt params AND the residual input (the cycle differentiates through
    # the ADA-aligned residual into the filter)
    gfn = jax.jit(jax.grad(loss, argnums=(0, 1)))

    ms = time_fn(lambda: fwd(params, resid, depth), lambda o: float(o.sum()), n=args.iters)
    print(f"[filter fwd]     batch={B} {args.dtype}: {ms:.2f} ms")

    ms = time_fn(lambda: gfn(params, resid, depth),
                 lambda o: float(jax.tree_util.tree_leaves(o)[0].sum()), n=args.iters)
    print(f"[filter fwd+bwd] batch={B} {args.dtype}: {ms:.2f} ms")


if __name__ == "__main__":
    main()
