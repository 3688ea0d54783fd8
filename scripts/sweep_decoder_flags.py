#!/usr/bin/env python
"""libtpu/XLA TPU flag sweep over the isolated decoder benchmark (round-3 perf item).

Each candidate flag targets the diagnosed pathology: bf16 layout-conversion copies
around the 1024^2 conv fwd/bwd pairs ([1025,32,130,32]-class "data formatting",
~98 ms/train-step) and the 32-lane tail convs. Flags are applied in a fresh
subprocess (XLA_FLAGS must be set before backend init).

Writes one JSON line per config; candidate names come from `strings libtpu.so`.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

BENCH = str(Path(__file__).resolve().parent / "bench_decoder.py")

CANDIDATES = [
    ("baseline", ""),
    ("large_2nd_minor_x16", "--xla_tpu_enable_large_2nd_minor_layout_for_x16=true "
                            "--xla_tpu_allow_large_2nd_minor_layout_for_x16=true"),
    ("aggressive_loop_fusion_layout", "--xla_tpu_enable_aggressive_loop_fusion_layout_opt=true"),
    ("autotune_layouts", "--xla_tpu_autotune_layouts=true"),
    ("layout_negotiation", "--xla_tpu_allow_layout_negotiation=true"),
    ("fusion_layout_update", "--xla_tpu_enable_fusion_layout_update=true"),
    ("order_dot_after_layout", "--xla_tpu_order_dot_after_layout=true"),
    ("copy_permute_minor_fusion", "--xla_tpu_enable_copy_permute_minor_fusion=true"),
    ("untiled_layout", "--xla_tpu_enable_untiled_layout=true"),
]


def main():
    extra_args = sys.argv[1:]  # forwarded to bench_decoder.py (e.g. --mode bwd)
    results = []
    for name, flags in CANDIDATES:
        env = dict(os.environ)
        base = env.get("LIBTPU_INIT_ARGS", "")
        env["LIBTPU_INIT_ARGS"] = (base + " " + flags).strip()  # reaches the remote
        # compiler through the axon relay as per-compile options (probed: unknown
        # names are rejected with "No such compile option")
        proc = subprocess.run(
            [sys.executable, BENCH, *extra_args],
            env=env, capture_output=True, text=True, timeout=900,
        )
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
        try:
            rec = json.loads(line)
        except (json.JSONDecodeError, IndexError):
            rec = {"error": (proc.stderr or proc.stdout)[-300:]}
        rec["config"] = name
        rec["flags"] = flags
        results.append(rec)
        print(json.dumps(rec), flush=True)
    ok = [r for r in results if "fwdbwd_ms" in r or "fwd_ms" in r]
    key = "fwdbwd_ms" if any("fwdbwd_ms" in r for r in ok) else "fwd_ms"
    ok.sort(key=lambda r: r.get(key, 1e9))
    print("\n# ranked:")
    for r in ok:
        print(f"  {r.get(key):8.3f} ms  {r['config']}")


if __name__ == "__main__":
    main()
