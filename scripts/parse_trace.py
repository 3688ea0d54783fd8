#!/usr/bin/env python
"""Aggregate an xprof/jax.profiler chrome-trace into a top-ops table.

Usage: python scripts/parse_trace.py <profile_dir_or_trace.json.gz> [--top 30]

Finds *.trace.json.gz under the dir, keeps TensorCore ("/device:TPU" pid) complete
events, sums durations by event name, and prints the top ops with a crude
category (conv / matmul / copy|format / elementwise-fusion / other). This is the
workflow that found the r2 sine-bound field and the 98 ms/step layout copies.
"""

from __future__ import annotations

import argparse
import gzip
import json
import re
from collections import defaultdict
from pathlib import Path


def load_trace(path: Path) -> dict:
    if path.is_dir():
        cands = sorted(path.rglob("*.trace.json.gz"))
        if not cands:
            raise SystemExit(f"no *.trace.json.gz under {path}")
        path = cands[-1]
    with gzip.open(path, "rt") as f:
        return json.load(f)


def categorize(name: str) -> str:
    n = name.lower()
    if "convolution" in n or "conv" in n:
        return "conv"
    if "dot" in n or "matmul" in n:
        return "matmul"
    if "copy" in n or "format" in n or "transpose" in n or "bitcast" in n:
        return "copy/format"
    if "fusion" in n:
        return "fusion"
    if "all-reduce" in n or "all-gather" in n:
        return "collective"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--like", default=None, help="only show events matching this regex")
    args = ap.parse_args()

    trace = load_trace(Path(args.path))
    events = trace.get("traceEvents", [])
    # device pids: metadata events name them; keep anything that looks like a TPU core
    device_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pname = e.get("args", {}).get("name", "")
            if "TPU" in pname or "Tensor" in pname or "/device" in pname.lower():
                device_pids.add(e["pid"])

    durs: dict[str, float] = defaultdict(float)
    counts: dict[str, int] = defaultdict(int)
    for e in events:
        if e.get("ph") != "X":
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        if args.like and not re.search(args.like, name):
            continue
        durs[name] += e.get("dur", 0.0)
        counts[name] += 1

    total = sum(durs.values())
    by_cat: dict[str, float] = defaultdict(float)
    for name, d in durs.items():
        by_cat[categorize(name)] += d
    print(f"total device-event time: {total / 1000:.2f} ms (pids={sorted(device_pids)})")
    for cat, d in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:12s} {d / 1000:9.2f} ms  ({100 * d / max(total, 1):.1f}%)")
    print()
    for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{d / 1000:9.3f} ms  x{counts[name]:<4d} [{categorize(name):11s}] {name[:110]}")


if __name__ == "__main__":
    main()
