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


def bench_train_step() -> dict | None:
    """Auxiliary: full-scale stage-1 training-step throughput (img/s/chip).

    Reference anchor: 4x V100 training at batch 4 (README.md:173); no published
    step time exists, so this is reported as an absolute number only."""
    import dataclasses

    import jax.numpy as jnp

    from __graft_entry__ import fast_init
    from e3dge_tpu.models.e3dge import E3DGE, LatentMeans
    from e3dge_tpu.training.steps import (
        STAGE1_TRAINABLE,
        create_train_state,
        make_optimizer,
        make_stage1_step,
    )
    from e3dge_tpu.utils.config import stage1_config

    # bf16 conv-stack activations (f32 master params + f32 SIREN field): measured
    # 471 -> 343 ms/step on v5e with matching loss (tests/test_precision.py pins
    # the numerics; scripts/train.py --dtype exposes the same switch)
    # bf16 teacher sampling is the TPU perf stack the stage scripts opt into
    # (config default is reference-exact f32) — bench what the scripts run
    cfg = dataclasses.replace(stage1_config(), dtype="bfloat16")
    from e3dge_tpu.utils.config import _with

    # + r4: bf16 differentiated field (--field-dtype, 224.5 -> 195.5 ms/step;
    # grad_bf16 4.4 vs grad_f32 13.5 ms standalone, scripts/bench_field.py --grad)
    cfg = _with(cfg, renderer=dict(sample_field_dtype="bfloat16", field_dtype="bfloat16"))
    model = E3DGE(cfg)
    ml = LatentMeans(
        renderer=jnp.zeros((1, cfg.renderer.depth + 1, cfg.renderer.style_dim)),
        decoder=jnp.zeros((1, cfg.decoder.n_latent, cfg.decoder.style_dim)),
    )
    imgs = jnp.zeros((2, 3, cfg.pifu.load_size, cfg.pifu.load_size))
    variables = fast_init(model, {"params": jax.random.key(0), "noise": jax.random.key(1)}, imgs, ml)
    tx = make_optimizer(1e-4)
    state = create_train_state(variables, STAGE1_TRAINABLE, tx)
    lambdas = dict(l2_lambda=1.0, latent_gt_lambda=1.0, shape_uniform_lambda=0.1, shape_surface_lambda=1.0)
    step = jax.jit(make_stage1_step(model, lambdas, tx), static_argnums=(3,), donate_argnums=(0,))

    bs = 4
    state, metrics = step(state, ml, jax.random.key(2), bs)
    _ = float(metrics["loss"])  # honest sync (see header note)
    n = 8
    key = jax.random.key(3)
    t0 = time.perf_counter()
    for i in range(n):
        state, metrics = step(state, ml, jax.random.fold_in(key, i), bs)
    _ = float(metrics["loss"])
    dt = time.perf_counter() - t0
    return {
        "metric": "stage-1 training step (batch 4, full scale)",
        "value": round(n * bs / dt, 4),
        "unit": "img/sec/chip",
        "ms_per_step": round(1000 * dt / n, 2),
    }


def _require_device(timeout_s: float = 300.0):
    """Bound backend init: the axon relay has been observed to drop for hours,
    and jax.devices() then hangs indefinitely. Probe it in a daemon thread and
    emit a machine-readable error line instead of hanging the driver."""
    import sys
    import threading

    box = []

    def probe():
        try:
            box.append(jax.devices())
        except Exception as e:  # backend init failed outright
            box.append(e)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if not box or isinstance(box[0], Exception):
        detail = repr(box[0])[:160] if box else f"backend init hung >{timeout_s:.0f}s"
        print(
            json.dumps(
                {
                    "metric": "single-image inversion+render throughput (full E1 pipeline, 1024^2 out)",
                    "value": None,
                    "unit": "inversions/sec/chip",
                    "error": f"TPU backend unavailable: {detail}",
                }
            )
        )
        sys.exit(1)


def main():
    _require_device()
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

    aux = None
    try:
        aux = bench_train_step()
    except Exception as e:  # aux metric must never break the primary line
        aux = {"error": str(e)[:200]}

    print(
        json.dumps(
            {
                "metric": "single-image inversion+render throughput (full E1 pipeline, 1024^2 out)",
                "value": round(inv_per_sec, 4),
                "unit": "inversions/sec/chip",
                "vs_baseline": round(inv_per_sec / V100_BASELINE_INV_PER_SEC, 4),
                "aux_training": aux,
            }
        )
    )


if __name__ == "__main__":
    main()
