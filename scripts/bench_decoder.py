#!/usr/bin/env python
"""Isolated G1 decoder benchmark (fwd and fwd+bwd-through) on the real TPU.

Targets the round-3 perf item (VERDICT r2 #1): the 1024^2 tail convs run ~7x off
roofline (32 of 128 lanes) and xprof shows ~98 ms/step of layout-conversion copies
around the 1024^2 conv fwd/bwd pairs in training. This harness measures the decoder
alone so candidate fixes (space-to-depth tail, XLA layout flags) can be evaluated
honestly before touching the pipeline — three previous "obvious" fusions measured
slower (ops/upfirdn2d.py notes).

Timing methodology (CLAUDE.md): block_until_ready does not sync through the axon
relay; amortize N dispatches against one scalar value pull.

Usage:
  python scripts/bench_decoder.py                # fwd + bwd, batch 4, bf16
  python scripts/bench_decoder.py --mode fwd --batch 1
  XLA_FLAGS="..." python scripts/bench_decoder.py   # flag sweeps
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--mode", default="both", choices=["fwd", "bwd", "both"])
    ap.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--profile", default=None, help="write an xprof trace to this dir")
    ap.add_argument("--s2d", type=int, default=0,
                    help="s2d_min_res: phase-space tail levels >= this res (0 off)")
    args = ap.parse_args()

    from e3dge_tpu.models.decoder import Decoder
    from e3dge_tpu.utils.config import DecoderConfig

    cfg = DecoderConfig(size=args.size, s2d_min_res=args.s2d, s2d_min_res_eval=args.s2d)
    dec = Decoder(cfg)
    dt = jnp.dtype(args.dtype)
    b = args.batch
    feats = jnp.zeros((b, cfg.in_channels, cfg.in_res, cfg.in_res), dt)
    latent = jnp.zeros((b, cfg.n_latent, cfg.style_dim), dt)

    variables = jax.jit(lambda r, f, l: dec.init(r, f, l, input_is_latent=True))(
        {"params": jax.random.key(0), "noise": jax.random.key(1)}, feats, latent
    )
    feats = jax.random.normal(jax.random.key(2), feats.shape, dt)
    latent = 0.1 * jax.random.normal(jax.random.key(3), latent.shape, dt)

    def fwd(v, f, l):
        img, _ = dec.apply(v, f, l, input_is_latent=True, rngs={"noise": jax.random.key(4)})
        return img

    # training-shaped backward: decoder params are FROZEN in every E3DGE stage,
    # but the loss backprops THROUGH the decoder to the feature map + latents
    # (trainer.py:1568-1680 grad plumbing)
    def loss(v, f, l):
        # train=True: the decoder picks its training-context d2s form
        img, _ = dec.apply(v, f, l, input_is_latent=True, train=True,
                           rngs={"noise": jax.random.key(4)})
        return jnp.sum(img.astype(jnp.float32) ** 2)

    bwd = jax.grad(loss, argnums=(1, 2))

    results = {}

    def time_fn(name, jfn, pull):
        out = jfn(variables, feats, latent)
        _ = float(pull(out))  # compile + honest sync
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = jfn(variables, feats, latent)
        _ = float(pull(out))
        ms = (time.perf_counter() - t0) / args.iters * 1000
        results[name] = round(ms, 3)

    if args.mode in ("fwd", "both"):
        time_fn("fwd_ms", jax.jit(fwd), lambda o: o.sum())
    if args.mode in ("bwd", "both"):
        time_fn("fwdbwd_ms", jax.jit(bwd), lambda o: o[0].sum())

    if args.profile:
        jfn = jax.jit(fwd) if args.mode == "fwd" else jax.jit(bwd)
        pull = (lambda o: o.sum()) if args.mode == "fwd" else (lambda o: o[0].sum())
        _ = float(pull(jfn(variables, feats, latent)))
        with jax.profiler.trace(args.profile):
            for _ in range(3):
                out = jfn(variables, feats, latent)
            _ = float(pull(out))

    print(json.dumps({
        "bench": "decoder_isolated",
        "batch": b, "size": args.size, "dtype": args.dtype, "s2d": args.s2d,
        "platform": jax.devices()[0].platform,
        **results,
    }))


if __name__ == "__main__":
    main()
