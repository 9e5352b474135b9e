#!/usr/bin/env python
"""Diagnose the no-prior SfM-init path stage by stage (the results/sfm_init
recipe): where does the pose error enter — the matcher's INTERNAL mini-SfM
(whose poses the plane-sweep rematch then bakes into every emitted flow), or
the OUTER run_mini_sfm that re-derives poses from those flows?

Usage: python scripts/diag_sfm_init.py [--backend PDCNet|zncc] [--H 300 ...]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def pose_err(poses_w2c_34, gt_34):
    from sparf_tpu.utils import alignment

    aligned, _ = alignment.prealign_w2c_small_camera_systems(
        np.asarray(poses_w2c_34, np.float32), np.asarray(gt_34, np.float32)
    )
    err = alignment.evaluate_camera_alignment(aligned, np.asarray(gt_34, np.float32))
    return float(np.asarray(err["R"]).mean() * 180 / np.pi), float(np.asarray(err["t"]).mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="PDCNet")
    ap.add_argument("--H", type=int, default=300)
    ap.add_argument("--W", type=int, default=400)
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--span", type=float, default=0.35)
    ap.add_argument("--octaves", type=int, default=3)
    args = ap.parse_args()

    from sparf_tpu.configs.config import ConfigDict
    from sparf_tpu.datasets.synthetic import load_synthetic_scene
    from sparf_tpu.colmap_init import sfm as sfm_mod
    from sparf_tpu.models import flow_net

    scene = load_synthetic_scene(
        split="train", H=args.H, W=args.W, n_train=args.n, n_test=4,
        texture_octaves=args.octaves, angular_span=args.span,
    )
    gt = np.asarray(scene["pose"])  # (N,3,4) w2c

    # --- instrument the matcher's internal SfM rounds
    orig_global = flow_net._global_poses_from_flows
    internal_poses = []

    def patched_global(*a, **kw):
        poses, depth_pool = orig_global(*a, **kw)
        if poses is not None:
            e = pose_err(poses[:, :3], gt)
            internal_poses.append((np.array(poses), e))
            print(f"[diag] internal SfM round {len(internal_poses)}: "
                  f"rot {e[0]:.3f} deg  trans {e[1]:.4f}", flush=True)
        else:
            print("[diag] internal SfM round: FAILED (pairwise fallback)", flush=True)
        return poses, depth_pool

    flow_net._global_poses_from_flows = patched_global

    cfg = ConfigDict(use_gt_correspondences=False, flow_backbone=args.backend)
    kps, pair_matches, poses_hint = sfm_mod.matches_from_dense_flow(scene, cfg)
    flow_net._global_poses_from_flows = orig_global

    for (i, j), (idx, _) in sorted(pair_matches.items()):
        print(f"[diag] pair ({i},{j}): {len(idx)} confident grid matches")

    if poses_hint is not None:
        e_hint = pose_err(np.asarray(poses_hint)[:, :3], gt)
        print(f"[diag] poses_hint (best internal round, handoff): "
              f"rot {e_hint[0]:.3f} deg  trans {e_hint[1]:.4f}", flush=True)
        result = sfm_mod.run_prior_init_sfm(
            scene, (kps, pair_matches), np.asarray(poses_hint), rounds=3
        )
        e_outer = pose_err(result.poses_w2c[:, :3], gt)
        print(f"[diag] OUTER prior-init SfM (new path): rot {e_outer[0]:.3f} deg  "
              f"trans {e_outer[1]:.4f}  (excluded: {result.index_images_excluded})",
              flush=True)
    # --- legacy outer path (essential-matrix re-derivation from the flows)
    result = sfm_mod.run_mini_sfm(scene, cfg, matches=(kps, pair_matches))
    e_outer = pose_err(result.poses_w2c[:, :3], gt)
    print(f"[diag] OUTER run_mini_sfm (legacy path): rot {e_outer[0]:.3f} deg  "
          f"trans {e_outer[1]:.4f}  (excluded: {result.index_images_excluded})",
          flush=True)

    if internal_poses:
        best = min(internal_poses, key=lambda pe: pe[1][0])
        print(f"[diag] best internal round: rot {best[1][0]:.3f} deg")
        last = internal_poses[-1]
        print(f"[diag] last internal round: rot {last[1][0]:.3f} deg")


if __name__ == "__main__":
    main()
