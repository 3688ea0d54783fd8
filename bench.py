"""Throughput benchmark: single-image inversion + render (encoder -> volume render ->
E1 fusion -> decoder) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference runs inference on a V100 (README.md:117); no published
throughput exists (BASELINE.md), so we anchor to an estimated 2.0 single-image
full-pipeline inversions/sec on V100 (pSp-style encoder ~30 ms + 64^2x24 SIREN
volume render + StyleGAN2 upsample + 4-stack hourglass E1 pass). The driver's
north-star is >=5x that per-chip.
"""

from __future__ import annotations

import json
import time

import jax

V100_BASELINE_INV_PER_SEC = 2.0


def main():
    from __graft_entry__ import entry

    fn, args = entry()
    jfn = jax.jit(fn, donate_argnums=())

    # warmup / compile. NOTE: on the axon relay, block_until_ready does NOT
    # synchronize with device execution — a value pull (float()) is the only honest
    # sync, so we time N dispatches amortized against one final scalar round-trip.
    out = jfn(*args)
    _ = float(out.sum())

    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = jfn(*args)
    _ = float(out.sum())
    dt = time.perf_counter() - t0

    batch = args[1].shape[0]
    inv_per_sec = n_iters * batch / dt
    print(
        json.dumps(
            {
                "metric": "single-image inversion+render throughput (full E1 pipeline, 1024^2 out)",
                "value": round(inv_per_sec, 4),
                "unit": "inversions/sec/chip",
                "vs_baseline": round(inv_per_sec / V100_BASELINE_INV_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
