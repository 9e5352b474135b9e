#!/usr/bin/env python
"""Diagnose the geometry-guided matcher stage by stage on the analytic scene.

Reports, per pair (median EPE over confident px vs GT flow):
  1. stage-1 appearance matching (hierarchical ZNCC+LK),
  2. the full pipeline (mini-SfM + plane-sweep rematch iterations),
  3. ORACLE-POSE rematch: _geom_rematch_pair fed the GT relative pose + GT
     depth range — isolates sweep precision from pose-estimation error,
  4. mini-SfM relative-pose error vs GT.

Usage: python scripts/diag_matcher.py [--H 300 --W 400 --n 3 --span 1.0]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def rel_pose(poses, t, s):
    Rt, tt = poses[t][:3, :3], poses[t][:3, 3]
    Rs, ts = poses[s][:3, :3], poses[s][:3, 3]
    R = Rs @ Rt.T
    tr = ts - R @ tt
    return R, tr


def epe_stats(corres, conf, gt_corres, gt_conf, min_conf=0.95):
    m = (conf > min_conf) & (gt_conf[0] > 0.5)
    if m.sum() < 10:
        return dict(n=int(m.sum()))
    err = np.linalg.norm(np.asarray(corres).transpose(2, 0, 1) - gt_corres, axis=0)[m]
    return dict(n=int(m.sum()), med=float(np.median(err)), mean=float(err.mean()),
                pck1=float((err <= 1).mean()), pck3=float((err <= 3).mean()))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--H", type=int, default=300)
    ap.add_argument("--W", type=int, default=400)
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--span", type=float, default=1.0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from sparf_tpu.datasets.synthetic import load_synthetic_scene
    from sparf_tpu.models import flow_net as F

    sc = load_synthetic_scene(split="train", H=args.H, W=args.W,
                              n_train=args.n, n_test=1, angular_span=args.span)
    imgs = np.asarray(sc["image"])
    intr = np.asarray(sc["intr"])
    n = imgs.shape[0]
    combi = F.get_combi_list(n, "all")
    gt_corres, gt_conf = F.compute_gt_flow_of_combi_list(sc, combi)
    poses44 = []
    for i in range(n):
        p = np.eye(4)
        p[:3] = sc["pose"][i]
        poses44.append(p)

    import jax.numpy as jnp

    with jax.default_matmul_precision("float32"):
        jimgs = jnp.asarray(imgs, jnp.float32)
        H, W = args.H, args.W

        # ---- stage 1 only (geom_iters=0)
        c1, f1 = F.compute_zncc_flow_of_combi_list(imgs, combi, intr=None)
        print("== stage-1 appearance matching ==")
        for p, (t, s) in enumerate(combi.T):
            st = epe_stats(np.asarray(c1[p]).transpose(1, 2, 0), f1[p, 0],
                           gt_corres[p], gt_conf[p : p + 1, 0])
            print(f"  pair {t}->{s}: {st}")

        # ---- full pipeline
        c2, f2 = F.compute_zncc_flow_of_combi_list(imgs, combi, intr=intr)
        print("== full pipeline (mini-SfM + rematch) ==")
        for p, (t, s) in enumerate(combi.T):
            st = epe_stats(np.asarray(c2[p]).transpose(1, 2, 0), f2[p, 0],
                           gt_corres[p], gt_conf[p : p + 1, 0])
            print(f"  pair {t}->{s}: {st}")

        # ---- oracle-pose rematch
        print("== oracle-pose plane-sweep rematch ==")
        for p, (t, s) in enumerate(combi.T):
            t, s = int(t), int(s)
            R, tr = rel_pose(poses44, t, s)
            d = sc["depth_gt"][t][sc["valid_depth_gt"][t]]
            c, sc_, mg = F._geom_rematch_pair(
                jimgs[t], jimgs[s], intr[t], intr[s], R, tr, d
            )
            conf = (np.asarray(sc_) >= 0.5) & (np.asarray(mg) >= 0.02)
            st = epe_stats(np.asarray(c), conf.astype(np.float32),
                           gt_corres[p], gt_conf[p : p + 1, 0], min_conf=0.5)
            print(f"  pair {t}->{s}: {st}")


if __name__ == "__main__":
    main()
