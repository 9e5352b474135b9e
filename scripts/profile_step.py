#!/usr/bin/env python
"""Profile the SPARF train step: capture a jax.profiler device trace of N
steps at a chosen stage, then aggregate per-op device time from the trace.

Usage:
  python scripts/profile_step.py [--stage fine|coarse] [--steps 10] [--tiny]

Prints a sorted table of device-op total durations (the XLA/Pallas op names)
plus category totals. This is the re-profiling VERDICT r2 #1 asked for —
the round-1 "40% XLA glue" figure came from an earlier code state.
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def categorize(name: str) -> str:
    n = name.lower()
    if "custom-call" in n or "tpu_custom_call" in n or "mosaic" in n:
        return "pallas_kernel"
    if n.startswith("fusion") or ".fusion" in n:
        return "xla_fusion"
    if "convolution" in n or "dot" in n:
        return "matmul"
    if "all-reduce" in n or "all-gather" in n or "collective" in n:
        return "collective"
    if "copy" in n or "transpose" in n or "reshape" in n or "bitcast" in n:
        return "data_movement"
    if "sort" in n:
        return "sort"
    if "scatter" in n or "gather" in n:
        return "gather_scatter"
    if "rng" in n or "random" in n:
        return "rng"
    return "other"


def parse_trace(trace_dir: str, n_steps: int):
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not files:
        files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json"), recursive=True)
    if not files:
        print(f"NO TRACE FILES under {trace_dir}", file=sys.stderr)
        return
    path = max(files, key=os.path.getmtime)
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    # find device PIDs (TPU planes)
    device_pids = set()
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            nm = e.get("args", {}).get("name", "")
            pid_names[e["pid"]] = nm
            if "TPU" in nm or "/device" in nm.lower() or "Device" in nm:
                if "host" not in nm.lower():
                    device_pids.add(e["pid"])
    if not device_pids:
        print("planes:", sorted(set(pid_names.values())), file=sys.stderr)

    tot = defaultdict(float)
    cnt = defaultdict(int)
    for e in events:
        if e.get("ph") != "X":
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        dur = float(e.get("dur", 0.0))
        tot[name] += dur
        cnt[name] += 1

    total_us = sum(tot.values())
    print(f"\ntrace: {path}")
    print(f"device planes: {[pid_names.get(p) for p in device_pids]}")
    print(f"TOTAL device-op time: {total_us/1000:.2f} ms over {n_steps} steps "
          f"-> {total_us/1000/n_steps:.2f} ms/step\n")
    cats = defaultdict(float)
    for name, us in tot.items():
        cats[categorize(name)] += us
    print("== categories ==")
    for cat, us in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:16s} {us/1000:9.2f} ms  {100*us/max(total_us,1e-9):5.1f}%")
    print("\n== top 45 ops ==")
    for name, us in sorted(tot.items(), key=lambda kv: -kv[1])[:45]:
        print(f"  {us/1000:9.2f} ms  x{cnt[name]:<5d} {100*us/max(total_us,1e-9):5.1f}%  {name[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="fine", choices=["fine", "coarse"])
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--trace-dir", default=None)
    ap.add_argument("--parse-only", default=None, help="skip run; parse this dir")
    args = ap.parse_args()

    if args.parse_only:
        parse_trace(args.parse_only, args.steps)
        return

    import jax
    import jax.numpy as jnp

    from bench import build_trainer

    trainer = build_trainer(args.tiny)
    ratio = float(trainer.cfg.get("ratio_end_joint_nerf_pose_refinement") or 0.3)
    it = 0 if args.stage == "coarse" else int(trainer.cfg.max_iter * (ratio + 0.05))
    step = trainer.get_step(it)
    state = trainer.state.replace(
        iteration=jnp.asarray(it, jnp.int32), iteration_nerf=jnp.asarray(it, jnp.int32)
    )
    for _ in range(args.warmup):
        state, stats = step(state)
    jax.block_until_ready(stats["all"])

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="sparf_profile_")
    jax.profiler.start_trace(trace_dir)
    for _ in range(args.steps):
        state, stats = step(state)
    jax.block_until_ready(stats["all"])
    jax.profiler.stop_trace()
    print(f"trace dir: {trace_dir}")
    parse_trace(trace_dir, args.steps)


if __name__ == "__main__":
    main()
