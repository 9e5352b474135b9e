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


def epe_stats(corres, conf, gt_corres, gt_conf, min_conf=0.95, epi_dir=None):
    """epi_dir: (H,W,2) unit GT epipolar direction at the GT match — adds the
    error decomposition along/perpendicular to the GT epipolar line. The
    PERPENDICULAR error is what biases pose recovery; along-line error only
    implies a different depth, which the reprojection loss absorbs."""
    m = (conf > min_conf) & (gt_conf[0] > 0.5)
    if m.sum() < 10:
        return dict(n=int(m.sum()))
    diff = (np.asarray(corres).transpose(2, 0, 1) - gt_corres)
    err = np.linalg.norm(diff, axis=0)[m]
    out = dict(n=int(m.sum()), med=float(np.median(err)), mean=float(err.mean()),
               pck1=float((err <= 1).mean()), pck3=float((err <= 3).mean()))
    if epi_dir is not None:
        d = diff.transpose(1, 2, 0)[m]
        e = epi_dir[m]
        along = np.abs(np.sum(d * e, -1))
        perp = np.abs(d[:, 0] * e[:, 1] - d[:, 1] * e[:, 0])
        out["med_along"] = float(np.median(along))
        out["med_perp"] = float(np.median(perp))
        out["perp_pck1"] = float((perp <= 1).mean())
    return out


def gt_epipolar_dirs(sc, t, s, eps=1e-3):
    """(H,W,2) unit direction of the GT epipolar line at the GT match,
    computed as d(project)/d(depth) normalized."""
    import jax.numpy as jnp

    from sparf_tpu.utils import geometry

    H, W = sc["depth_gt"][t].shape
    xx, yy = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32))
    pix = np.stack([xx, yy], -1).reshape(-1, 2)
    depth = sc["depth_gt"][t].reshape(-1)
    T = geometry.relative_transform_i_to_j(
        jnp.asarray(sc["pose"][t]), jnp.asarray(sc["pose"][s])
    )[None]
    K = jnp.asarray(sc["intr"][:1])
    p0 = np.asarray(geometry.batch_project_to_other_img(
        jnp.asarray(pix[None]), jnp.asarray(depth[None]), K, K, T))[0]
    p1 = np.asarray(geometry.batch_project_to_other_img(
        jnp.asarray(pix[None]), jnp.asarray(depth[None] * (1 + eps)), K, K, T))[0]
    d = p1 - p0
    n = np.linalg.norm(d, axis=-1, keepdims=True)
    d = d / np.where(n < 1e-9, 1e-9, n)
    return d.reshape(H, W, 2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--H", type=int, default=300)
    ap.add_argument("--W", type=int, default=400)
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--span", type=float, default=1.0)
    ap.add_argument("--octaves", type=int, default=1)
    ap.add_argument("--noise", type=float, default=0.0,
                    help="se3 noise sigma for init-pose priors (training regime "
                         "passes noisy init poses to the matcher; 0 = none)")
    ap.add_argument("--skip-stage1", action="store_true",
                    help="skip the stage-1-only and oracle sections")
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
                              n_train=args.n, n_test=1, angular_span=args.span,
                              texture_octaves=args.octaves)
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
        if not args.skip_stage1:
            c1, f1 = F.compute_zncc_flow_of_combi_list(imgs, combi, intr=None)
            print("== stage-1 appearance matching ==")
            for p, (t, s) in enumerate(combi.T):
                st = epe_stats(np.asarray(c1[p]).transpose(1, 2, 0), f1[p, 0],
                               gt_corres[p], gt_conf[p : p + 1, 0])
                print(f"  pair {t}->{s}: {st}")

        # ---- full pipeline
        init_poses = None
        if args.noise > 0:
            from sparf_tpu.utils import camera as cam

            se3_noise = jax.random.normal(jax.random.PRNGKey(1), (imgs.shape[0], 6)) * args.noise
            noise44 = np.asarray(cam.se3_to_SE3(se3_noise))
            init_poses = np.asarray(cam.pose_compose(
                [jnp.asarray(noise44), jnp.asarray(sc["pose"])]
            ))
        c2, f2 = F.compute_zncc_flow_of_combi_list(imgs, combi, intr=intr,
                                                   init_poses_w2c=init_poses)
        print("== full pipeline (mini-SfM + rematch) ==")
        for p, (t, s) in enumerate(combi.T):
            ed = gt_epipolar_dirs(sc, int(t), int(s))
            st = epe_stats(np.asarray(c2[p]).transpose(1, 2, 0), f2[p, 0],
                           gt_corres[p], gt_conf[p : p + 1, 0], epi_dir=ed)
            print(f"  pair {t}->{s}: {st}")

        # ---- oracle-pose rematch
        if args.skip_stage1:
            return
        print("== oracle-pose plane-sweep rematch ==")
        for p, (t, s) in enumerate(combi.T):
            t, s = int(t), int(s)
            R, tr = rel_pose(poses44, t, s)
            d = sc["depth_gt"][t][sc["valid_depth_gt"][t]]
            c, sc_, mg, _cv, _d = F._geom_rematch_pair(
                jimgs[t], jimgs[s], intr[t], intr[s], R, tr, d
            )
            conf = (np.asarray(sc_) >= 0.5) & (np.asarray(mg) >= 0.02)
            st = epe_stats(np.asarray(c), conf.astype(np.float32),
                           gt_corres[p], gt_conf[p : p + 1, 0], min_conf=0.5)
            print(f"  pair {t}->{s}: {st}")


if __name__ == "__main__":
    main()
