#!/usr/bin/env python
"""SIREN field-query benchmark: XLA formulation vs the fused Pallas kernel
(precision 'highest' and 'serving') at the serving shape (98304 pts, W=256, D=8).

r2 verdict: f32+jnp.sin kernel 9.1 ms vs XLA 10.0 ms standalone (both VPU
sin-bound), XLA wins e2e. r3 adds the 'serving' kernel path (bf16 MXU matmuls +
fast_sin) matching the XLA bf16 serving field — this is the honest rematch.

One JSON line per variant; honest sync via value pull (CLAUDE.md).
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
    ap.add_argument("--n", type=int, default=64 * 64 * 24)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--grad", action="store_true",
                    help="also time the training backward (plain vs remat policies)")
    args = ap.parse_args()

    from e3dge_tpu.models.siren import SirenGenerator
    from e3dge_tpu.ops.pallas.siren_kernel import (
        film_vectors,
        pack_siren_params,
        siren_query_fused,
    )

    d, w = args.depth, args.width
    model = SirenGenerator(depth=d, width=w, style_dim=256)
    pts = jax.random.normal(jax.random.key(0), (1, args.n, 3))
    dirs = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
    styles = 0.3 * jax.random.normal(jax.random.key(2), (1, d + 1, 256))
    v = jax.jit(model.init)(jax.random.key(3), pts, dirs, styles)

    def timed(fn, pull):
        out = fn()
        _ = float(pull(out))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn()
        _ = float(pull(out))
        return (time.perf_counter() - t0) / args.iters * 1000

    results = {"n": args.n, "platform": jax.devices()[0].platform}

    # XLA f32 (training formulation)
    xla32 = jax.jit(lambda: model.apply(v, pts, dirs, styles))
    results["xla_f32_ms"] = round(timed(xla32, lambda o: o.sum()), 3)
    # XLA bf16 + fast_sin (serving formulation: field_dtype boundary)
    p16, d16, s16 = pts.astype(jnp.bfloat16), dirs.astype(jnp.bfloat16), styles.astype(jnp.bfloat16)
    xla16 = jax.jit(lambda: model.apply(v, p16, d16, s16))
    results["xla_bf16_ms"] = round(timed(xla16, lambda o: o.astype(jnp.float32).sum()), 3)

    if args.grad:
        # training formulation: grads flow THROUGH the frozen field to styles
        # (stage-1: encoder latents). Compare the stored-activation backward
        # against rematerialization policies — the f32 field backward is the
        # widest band of the r3 train step (COMPONENTS.md round-4 candidates).
        def fwd(s):
            return model.apply(v, pts, dirs, s).sum()

        def fwd16(s):
            # bf16 training-field candidate: cast at the field boundary like the
            # serving path, keep the style cotangent in f32 at the boundary
            out = model.apply(
                v, pts.astype(jnp.bfloat16), dirs.astype(jnp.bfloat16), s.astype(jnp.bfloat16)
            )
            return out.astype(jnp.float32).sum()

        variants = {
            "grad_f32_ms": jax.grad(fwd),
            "grad_f32_remat_ms": jax.grad(
                lambda s: jax.checkpoint(lambda q: model.apply(v, pts, dirs, q))(s).sum()
            ),
            "grad_f32_save_dots_ms": jax.grad(
                lambda s: jax.checkpoint(
                    lambda q: model.apply(v, pts, dirs, q),
                    policy=jax.checkpoint_policies.dots_saveable,
                )(s).sum()
            ),
            "grad_bf16_ms": jax.grad(fwd16),
        }
        for name, g in variants.items():
            jg = jax.jit(g)
            results[name] = round(timed(lambda: jg(styles), lambda o: o.sum()), 3)

    pack = pack_siren_params(v["params"], depth=d, width=w)
    gamma, beta = film_vectors(v["params"], styles[0], depth=d)
    for prec in ("highest", "serving"):
        fn = jax.jit(
            lambda prec=prec: siren_query_fused(
                pts[0], dirs[0], pack, gamma, beta, depth=d, width=w, precision=prec
            )
        )
        results[f"pallas_{prec}_ms"] = round(timed(fn, lambda o: o[0].sum()), 3)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
