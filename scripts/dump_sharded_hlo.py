#!/usr/bin/env python
"""Dump the compiled HLO of the N-way-sharded full-shape train step (virtual
CPU mesh) for collective forensics — which tensors XLA all-gathers and which
consumers force it (PERF_NOTES scaling model / reduce-scatter rework).

Usage: python scripts/dump_sharded_hlo.py [--n 8] [--out /tmp/sharded_hlo.txt]
Re-execs itself with JAX_PLATFORMS=cpu + forced host device count.
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--out", default="/tmp/sharded_hlo.txt")
    ap.add_argument("--stage", default="fine", choices=["fine", "joint"])
    args = ap.parse_args()

    if os.environ.get("_SPARF_HLO_CHILD") != "1":
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["JAX_PLATFORM_NAME"] = "cpu"
        flags = env.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            flags = (flags + f" --xla_force_host_platform_device_count={args.n}").strip()
        env["XLA_FLAGS"] = flags
        env["_SPARF_HLO_CHILD"] = "1"
        sys.exit(subprocess.run([sys.executable] + sys.argv, env=env).returncode)

    import tempfile

    import jax

    jax.config.update("jax_platforms", "cpu")

    from sparf_tpu.configs.config import ConfigDict, override_options
    from sparf_tpu.configs.presets import PRESETS
    from sparf_tpu.parallel import mesh as mesh_mod
    from sparf_tpu.training.joint_trainer import PoseAndNerfTrainerPerScene

    cfg = PRESETS["joint_pose_nerf_training/synthetic/sparf"]()
    over = ConfigDict(
        env=ConfigDict(), scene="spheres", max_iter=1000,
        synthetic=dict(H=300, W=400, n_train=3, n_test=1),
        min_nbr_matches=50, use_gt_correspondences=True,
        tpu=ConfigDict(mesh_shape=[args.n], donate_state=False),
    )
    cfg = override_options(cfg, over)
    mesh_mod.set_active_mesh(None)
    tr = PoseAndNerfTrainerPerScene(cfg, workspace=tempfile.mkdtemp())
    it = 0 if args.stage == "joint" else int(tr.cfg.max_iter * 0.35)
    step = tr.get_step(it)
    compiled = jax.jit(lambda s: step(s)).lower(tr.state).compile()
    with open(args.out, "w") as f:
        f.write(compiled.as_text())
    print(f"wrote {args.out} ({os.path.getsize(args.out)} bytes)")


if __name__ == "__main__":
    main()
