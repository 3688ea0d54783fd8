"""Metric logging: JSONL file + console, optional wandb when available.

Replaces the reference's rank-0 wandb logging (`train_setup.py:368-383`,
`trainer.py:243-253`); under a mesh, log only from process 0
(jax.process_index() == 0)."""

from __future__ import annotations

import json
import time
from pathlib import Path

import jax
import numpy as np


def print_parameter(params: dict, title: str = "trainable", out=print) -> int:
    """Trainable-parameter audit at train start (reference print_parameter,
    utils/misc_utils.py:225-228 + trainer.py:753-757): list every trainable leaf
    with its shape, plus per-top-level-key and total counts. `params` is the
    trainable param subtree (TrainState.params). Returns the total count."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    total = 0
    per_key: dict[str, int] = {}
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        n = int(np.prod(leaf.shape)) if leaf.shape else 1
        total += n
        per_key[name.split("/")[0]] = per_key.get(name.split("/")[0], 0) + n
        out(f"{name} {tuple(leaf.shape)}")
    for key, n in sorted(per_key.items()):
        out(f"[{title}] {key}: {n:,} params")
    out(f"[{title}] total: {total:,} params")
    return total


class MetricLogger:
    def __init__(self, work_dir: str | Path, use_wandb: bool = False, project: str = "e3dge_tpu", config: dict | None = None):
        self.is_main = jax.process_index() == 0
        self.path = Path(work_dir) / "metrics.jsonl"
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._wandb = None
        if use_wandb and self.is_main:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(project=project, config=config or {})
            except ImportError:
                pass

    def log(self, step: int, metrics: dict, prefix: str = "") -> None:
        if not self.is_main:
            return
        record = {"step": step, "time": time.time()}
        record.update({f"{prefix}{k}": float(v) for k, v in metrics.items()})
        with self.path.open("a") as f:
            f.write(json.dumps(record) + "\n")
        if self._wandb is not None:
            self._wandb.log(record, step=step)
