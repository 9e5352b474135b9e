#!/usr/bin/env python
"""Benchmark: full SPARF training-step throughput at the reference workload shape.

Workload (BASELINE.md): DTU 3-view joint training = 100k iterations of
  photometric (1024 rays) + correspondence (2x512 rays) + depth-consistency
  (1024 ref + 1024 visibility + 1024 virtual rays), 128 coarse + 128 fine
  samples/ray, 8x256 MLP + 128-hidden rgb head, dual Adam.

Baseline: the reference trains this on one A100 in ~10 h (SPARF CVPR'23,
~2.78 it/s); vs_baseline is our it/s over that. The BASELINE.md north star is
vs_baseline >= 5.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

A100_REFERENCE_ITERS_PER_SEC = 100000.0 / (10 * 3600)  # ~2.78 it/s (estimate)


def build_trainer(tiny: bool):
    from sparf_tpu.configs.config import ConfigDict, override_options
    from sparf_tpu.configs.presets import PRESETS
    from sparf_tpu.training.joint_trainer import PoseAndNerfTrainerPerScene
    import tempfile

    cfg = PRESETS["joint_pose_nerf_training/synthetic/sparf"]()
    over = ConfigDict(
        env=ConfigDict(),
        scene="spheres",
        max_iter=100000,
        use_gt_correspondences=True,  # matcher runs offline; not part of step timing
        min_nbr_matches=100,
        # both stages are measured from the same initial state
        tpu=ConfigDict(donate_state=False),
    )
    if tiny:
        over = override_options(
            over,
            ConfigDict(
                synthetic=dict(H=48, W=64, n_train=3, n_test=1),
                arch=dict(layers_feat=[None, 64, 64, 64, 64],
                          layers_rgb=[None, 32, 3], skip=[2]),
                nerf=ConfigDict(sample_intvs=32, sample_intvs_fine=16, rand_rays=128),
                depth_cons_nbr_rays=128,
            ),
        )
    else:
        # DTU-shaped: 300x400 images, 1024 rays, 128+128 samples, full MLP
        over = override_options(
            over, ConfigDict(synthetic=dict(H=300, W=400, n_train=3, n_test=1))
        )
    cfg = override_options(cfg, over)
    ws = tempfile.mkdtemp(prefix="sparf_bench_")
    return PoseAndNerfTrainerPerScene(cfg, workspace=ws)


def run_mesh_audit(n: int, full: bool = False) -> None:
    """--mesh N: SPMD audit on an N-device virtual CPU mesh.

    Verifies (1) the per-device ray shard shapes in the compiled step,
    (2) the cross-device collectives XLA inserted, and (3) numerical
    equivalence of the sharded step vs the unsharded one (same seed).
    With --mesh_full, audits the REAL DTU workload shape (300x400, 8x256
    MLP, 1024 rays, 128+128 samples) and both schedule stages, reporting
    collective payload bytes for the PERF_NOTES scaling model (execution
    is skipped — CPU would take minutes; compile-only is enough for the
    communication profile). Prints ONE JSON line. Runs itself in a child
    process with the CPU platform + device count forced (the session env
    pins one real TPU)."""
    import os
    import subprocess

    if os.environ.get("_SPARF_BENCH_MESH_CHILD") != "1":
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["JAX_PLATFORM_NAME"] = "cpu"
        flags = env.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            flags = (flags + f" --xla_force_host_platform_device_count={n}").strip()
        env["XLA_FLAGS"] = flags
        env["_SPARF_BENCH_MESH_CHILD"] = "1"
        cmd = [sys.executable, os.path.abspath(__file__), "--mesh", str(n)]
        if full:
            cmd.append("--mesh_full")
        rc = subprocess.run(cmd, env=env).returncode
        sys.exit(rc)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    assert jax.device_count() >= n, f"{jax.device_count()} devices, need {n}"

    from sparf_tpu.configs.config import ConfigDict, override_options
    from sparf_tpu.parallel import mesh as mesh_mod

    def one_trainer(mesh_n):
        import tempfile

        from sparf_tpu.configs.presets import PRESETS
        from sparf_tpu.training.joint_trainer import PoseAndNerfTrainerPerScene

        cfg = PRESETS["joint_pose_nerf_training/synthetic/sparf"]()
        if full:
            over = ConfigDict(
                env=ConfigDict(), scene="spheres", max_iter=1000,
                synthetic=dict(H=300, W=400, n_train=3, n_test=1),
                min_nbr_matches=50, use_gt_correspondences=True,
                tpu=ConfigDict(mesh_shape=[mesh_n] if mesh_n else None,
                               donate_state=False),
            )
        else:
            over = ConfigDict(
                env=ConfigDict(), scene="spheres", max_iter=1000,
                synthetic=dict(H=24, W=32, n_train=3, n_test=1),
                arch=dict(layers_feat=[None, 64, 64, 64, 64],
                          layers_rgb=[None, 32, 3], skip=[2]),
                nerf=ConfigDict(sample_intvs=32, sample_intvs_fine=16,
                                rand_rays=16 * n),
                depth_cons_nbr_rays=16 * n,
                min_nbr_matches=50, use_gt_correspondences=True,
                tpu=ConfigDict(mesh_shape=[mesh_n] if mesh_n else None,
                               donate_state=False),
            )
        cfg = override_options(cfg, over)
        mesh_mod.set_active_mesh(None)
        return PoseAndNerfTrainerPerScene(cfg, workspace=tempfile.mkdtemp())

    # sharded trainer: compile the joint-stage step, audit HLO
    tr = one_trainer(n)
    stage_iter = 0 if not full else int(tr.cfg.max_iter * 0.35)  # fine stage
    step = tr.get_step(stage_iter)
    lowered = jax.jit(lambda s: step(s)).lower(tr.state)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    coll = {
        "all_reduce": hlo.count("all-reduce("),
        "all_gather": hlo.count("all-gather("),
        "reduce_scatter": hlo.count("reduce-scatter("),
        "collective_permute": hlo.count("collective-permute("),
    }
    # collective payload bytes: parse the result shape of each collective op
    # (feeds the PERF_NOTES multi-chip scaling model)
    import re as re_mod

    dtype_bytes = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                   "pred": 1, "f64": 8, "s64": 8}
    coll_bytes = {}
    for kind in ("all-reduce", "all-gather", "reduce-scatter", "collective-permute"):
        total = 0
        for m in re_mod.finditer(
            r"= (?:\()?([a-z0-9]+)\[([0-9,]*)\][^=]*? " + kind + r"\(", hlo
        ):
            dt, dims = m.group(1), m.group(2)
            n_elem = 1
            for d in dims.split(","):
                if d:
                    n_elem *= int(d)
            total += n_elem * dtype_bytes.get(dt, 4)
        coll_bytes[kind.replace("-", "_") + "_bytes"] = total
    rays = int(tr.cfg.nerf.rand_rays)
    shard = rays // n
    # per-device ray shard: the photometric ray batch f32[rand_rays/n, ...]
    shard_ok = f"f32[{shard}," in hlo or f"f32[1,{shard}," in hlo
    if full:
        # compile-only: the communication profile is what we're after; one
        # DTU-shape step on 8 virtual CPU devices would take minutes, and
        # the tiny audit already proves sharded==unsharded numerics
        loss_sharded = loss_ref = diff = 0.0
    else:
        state1, stats1 = step(tr.state)
        loss_sharded = float(np.asarray(stats1["all"]))

        # unsharded reference, same seed/config
        tr0 = one_trainer(None)
        step0 = tr0.get_step(0)
        _, stats0 = step0(tr0.state)
        loss_ref = float(np.asarray(stats0["all"]))
        diff = abs(loss_sharded - loss_ref)

    result = {
        "metric": "sparf_mesh_audit",
        "value": n,
        "unit": "devices",
        "vs_baseline": 1.0 if (shard_ok and diff < 1e-4 and
                               sum(coll.values()) > 0) else 0.0,
        "detail": {
            "collectives_per_step": coll,
            "collective_payload": coll_bytes,
            "rays_per_device": shard,
            "shard_shape_found": bool(shard_ok),
            "loss_sharded": loss_sharded,
            "loss_unsharded": loss_ref,
            "abs_diff": diff,
            "devices": jax.device_count(),
            "full_workload": bool(full),
            "stage": "fine" if full else "joint",
        },
    }
    print(json.dumps(result))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--tiny", action="store_true", help="small shapes (CPU sanity)")
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--warmup", type=int, default=3)
    parser.add_argument("--mesh", type=int, default=0,
                        help="SPMD audit on an N-device virtual CPU mesh")
    parser.add_argument("--mesh_full", action="store_true",
                        help="audit the full DTU workload shape (compile-only)")
    parser.add_argument("--no-merge", action="store_true",
                        help="disable merged multi-loss rendering (A/B)")
    args = parser.parse_args()

    if args.mesh:
        run_mesh_audit(args.mesh, full=args.mesh_full)
        return

    import jax
    import jax.numpy as jnp

    trainer = build_trainer(args.tiny)
    if args.no_merge:
        trainer.cfg.tpu.merged_render = False

    def measure(iteration: int) -> float:
        step = trainer.get_step(iteration)
        state = trainer.state.replace(
            iteration=jnp.asarray(iteration, jnp.int32),
            iteration_nerf=jnp.asarray(iteration, jnp.int32),
        )
        for _ in range(args.warmup):
            state, stats = step(state)
        jax.block_until_ready(stats["all"])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, stats = step(state)
        jax.block_until_ready(stats["all"])
        return (time.perf_counter() - t0) / args.steps, stats

    # the joint schedule spends 30% of iterations in the coarse joint stage and
    # 70% with fine sampling enabled — measure both, report the weighted rate
    ratio = float(trainer.cfg.get("ratio_end_joint_nerf_pose_refinement") or 0.3)
    dt_coarse, _ = measure(0)
    dt_fine, stats = measure(int(trainer.cfg.max_iter * (ratio + 0.05)))
    dt = ratio * dt_coarse + (1 - ratio) * dt_fine

    iters_per_sec = 1.0 / dt
    rays_per_step = (
        trainer.cfg.nerf.rand_rays  # photometric
        + 2 * (trainer.cfg.nerf.rand_rays // 2)  # corres, both views
        + 3 * int(trainer.cfg.get("depth_cons_nbr_rays")
                  or max(1024, trainer.cfg.nerf.rand_rays))  # ref+vis+virtual
    )
    samples = trainer.cfg.nerf.sample_intvs + (
        trainer.cfg.nerf.sample_intvs_fine if trainer.cfg.nerf.fine_sampling else 0
    )
    result = {
        "metric": "sparf_train_step_throughput",
        "value": round(iters_per_sec, 3),
        "unit": "it/s",
        "vs_baseline": round(iters_per_sec / A100_REFERENCE_ITERS_PER_SEC, 3),
        "detail": {
            "rays_per_step": int(rays_per_step),
            "samples_per_ray": int(samples),
            "ray_samples_per_sec": int(rays_per_step * samples * iters_per_sec),
            "it_per_sec_coarse_stage": round(1.0 / dt_coarse, 3),
            "it_per_sec_fine_stage": round(1.0 / dt_fine, 3),
            "projected_100k_iter_minutes": round(100000 * dt / 60, 1),
            "device": str(jax.devices()[0]),
            "n_devices": jax.device_count(),
            "tiny": bool(args.tiny),
            "merged_render": bool(trainer.cfg.tpu.get("merged_render", True)),
            "loss": float(np.asarray(stats["all"])),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
