#!/usr/bin/env python
"""Parse a jax.profiler trace dir: per-op SELF device time (nested spans
subtracted), sorted; optionally map op names to HLO via a dumped module.

Usage: python scripts/parse_trace.py <trace_dir> --steps 10
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
from collections import defaultdict


def load_events(trace_dir):
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", [])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--top", type=int, default=60)
    args = ap.parse_args()

    events = load_events(args.trace_dir)
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e.get("args", {}).get("name", "")
    device_pids = {p for p, n in pid_names.items() if "TPU" in n and "host" not in n.lower()}

    # group complete events per (pid, tid)
    by_track = defaultdict(list)
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            by_track[(e["pid"], e.get("tid", 0))].append(e)

    self_tot = defaultdict(float)
    cnt = defaultdict(int)
    total_span = 0.0
    for track, evs in by_track.items():
        evs.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
        stack = []  # (end_ts, name, child_time_accum_index)
        # compute self time via interval nesting
        child_time = {}
        order = []
        for e in evs:
            ts, dur, name = e["ts"], float(e.get("dur", 0.0)), e.get("name", "?")
            while stack and stack[-1][0] <= ts + 1e-9:
                stack.pop()
            eid = id(e)
            child_time[eid] = 0.0
            if stack:
                child_time[stack[-1][2]] += dur
            stack.append((ts + dur, name, eid))
            order.append((name, dur, eid))
        for name, dur, eid in order:
            self_us = dur - child_time[eid]
            self_tot[name] += self_us
            cnt[name] += 1
            total_span += self_us

    per_step = total_span / args.steps
    print(f"total self-time: {total_span/1000:.2f} ms -> {per_step/1000:.3f} ms/step")
    print(f"\n== top {args.top} ops by SELF time ==")
    rows = sorted(self_tot.items(), key=lambda kv: -kv[1])
    for name, us in rows[:args.top]:
        if us < 100:
            break
        print(f"  {us/1000/args.steps:8.3f} ms/step  x{cnt[name]//args.steps:<4d} "
              f"{100*us/max(total_span,1e-9):5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
