#!/usr/bin/env python
"""Oracle-matches SfM ceiling: feed run_mini_sfm GT-depth correspondences at
the geometry-bootstrap resolution and measure the pose error of each stage
(essential init pair -> +PnP -> +BA). If the ceiling is >~0.5 deg, the no-prior
SfM machinery (init-pair choice / BA convergence), not the matcher, is what
caps the sfm_init rows. CPU-only (forces the platform before jax import).
"""
from __future__ import annotations

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
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
    import argparse

    import jax

    jax.config.update("jax_platforms", "cpu")

    ap = argparse.ArgumentParser()
    ap.add_argument("--H", type=int, default=150)
    ap.add_argument("--W", type=int, default=200)
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--span", type=float, default=0.35)
    ap.add_argument("--noise_px", type=float, default=0.0)
    ap.add_argument("--ba_iters", type=int, default=1500)
    args = ap.parse_args()

    from sparf_tpu.configs.config import ConfigDict
    from sparf_tpu.datasets.synthetic import load_synthetic_scene
    from sparf_tpu.colmap_init import sfm as sfm_mod

    scene = load_synthetic_scene(
        split="train", H=args.H, W=args.W, n_train=args.n, n_test=4,
        texture_octaves=3, angular_span=args.span,
    )
    gt = np.asarray(scene["pose"])
    cfg = ConfigDict(use_gt_correspondences=True, flow_backbone="zncc")
    kps, pair_matches, _ = sfm_mod.matches_from_dense_flow(scene, cfg)
    if args.noise_px > 0:
        rng = np.random.RandomState(0)
        pair_matches = {
            k: (idx, xy + rng.normal(0, args.noise_px, xy.shape).astype(np.float32))
            for k, (idx, xy) in pair_matches.items()
        }
    for (i, j), (idx, _) in sorted(pair_matches.items()):
        print(f"pair ({i},{j}): {len(idx)} matches")

    res = sfm_mod.run_mini_sfm(scene, cfg, matches=(kps, pair_matches),
                               ba_iters=args.ba_iters)
    e = pose_err(res.poses_w2c[:, :3], gt)
    print(f"ORACLE run_mini_sfm @ {args.H}x{args.W} noise={args.noise_px}px: "
          f"rot {e[0]:.4f} deg  trans {e[1]:.5f}  excluded={res.index_images_excluded}")

    # prior-init path from the GT poses themselves (BA fixed point check)
    res2 = sfm_mod.run_prior_init_sfm(
        scene, (kps, pair_matches),
        np.concatenate([gt, np.tile(np.array([[[0, 0, 0, 1.0]]], np.float32),
                                    (gt.shape[0], 1, 1))], 1),
        ba_iters=args.ba_iters,
    )
    e2 = pose_err(res2.poses_w2c[:, :3], gt)
    print(f"ORACLE run_prior_init_sfm(GT prior): rot {e2[0]:.4f} deg  trans {e2[1]:.5f}")


if __name__ == "__main__":
    main()
