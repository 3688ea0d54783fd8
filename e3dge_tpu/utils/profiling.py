"""Profiling & runtime-check helpers (SURVEY.md §5 aux subsystems).

The reference has no profiler and always-on `torch.autograd.set_detect_anomaly` +
`TORCH_DISTRIBUTED_DEBUG=DETAIL` (train_ae.py:16-20). Here:

  * enable_debug_checks()  — jax debug_nans + debug_infs + checking leaks: the JAX
    equivalent of anomaly detection (catches non-finite values at the op that
    produced them, at a ~2x cost — use for debugging runs).
  * timed()                — honest device timing context. NOTE this machine's axon
    relay does not synchronize on block_until_ready; a value pull is forced.
  * trace()                — jax.profiler trace context writing a TensorBoard-
    compatible profile directory.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path

import jax


def enable_debug_checks(nans: bool = True, leaks: bool = False) -> None:
    jax.config.update("jax_debug_nans", nans)
    jax.config.update("jax_debug_infs", nans)
    if leaks:
        jax.config.update("jax_check_tracer_leaks", True)


@contextlib.contextmanager
def timed(name: str, sync_value=None):
    """Context manager printing wall time; pass a device array as sync_value to
    force a true device round-trip before stopping the clock."""
    t0 = time.perf_counter()
    box = {}
    try:
        yield box
    finally:
        v = box.get("sync", sync_value)
        if v is not None:
            _ = float(jax.numpy.asarray(v).sum())
        dt = time.perf_counter() - t0
        print(f"[timed] {name}: {dt * 1000:.2f} ms")
        box["ms"] = dt * 1000


@contextlib.contextmanager
def trace(log_dir: str | Path = "runs/profile"):
    """jax.profiler trace (view with TensorBoard or xprof)."""
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    with jax.profiler.trace(str(log_dir)):
        yield
