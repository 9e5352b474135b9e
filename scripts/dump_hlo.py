#!/usr/bin/env python
"""Dump the compiled HLO of the bench train step for fusion-name forensics.

Usage: python scripts/dump_hlo.py [--stage fine] [--out /tmp/step_hlo.txt]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="fine", choices=["fine", "coarse"])
    ap.add_argument("--out", default="/tmp/step_hlo.txt")
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    import jax

    from bench import build_trainer

    trainer = build_trainer(args.tiny)
    ratio = float(trainer.cfg.get("ratio_end_joint_nerf_pose_refinement") or 0.3)
    it = 0 if args.stage == "coarse" else int(trainer.cfg.max_iter * (ratio + 0.05))
    step = trainer.get_step(it)
    lowered = jax.jit(lambda s: step(s)).lower(trainer.state)
    compiled = lowered.compile()
    with open(args.out, "w") as f:
        f.write(compiled.as_text())
    print(f"wrote {args.out} ({os.path.getsize(args.out)} bytes)")


if __name__ == "__main__":
    main()
