"""Multi-view correspondence loss — SPARF Sec. 4.1, the core novelty.

Parity with reference corres_loss.py:29-220 + base_corres_loss.py:28-375:
for a sampled image pair (self, other), render depth at matched pixels in both
views, reproject self's pixels into other with the rendered depth and the
current relative pose, penalize the distance to the matched pixel (huber,
confidence-weighted), symmetrized over both directions and averaged over
coarse+fine (/4).

TPU-native reshaping of the reference's data-dependent control flow:
  - correspondences are precomputed once on host into PER-PAIR PIXEL POOLS of
    one fixed size (padded; sampled modulo the true count), so the jitted step
    never sees ragged shapes;
  - "sample one random valid pair each iteration" is a traced randint into the
    stacked pool tensors;
  - the gradual weight decay (/2 every K iters after a start ratio) and the
    start_iter gate are traced arithmetic on the iteration counter.

NOTE the reference uses integer pixel coordinates for these rays (its `grid`
has no +0.5, base_corres_loss.py:44-49) — kept for exactness.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sparf_tpu.models import flow_net as flow_mod
from sparf_tpu.models import renderer as renderer_mod
from sparf_tpu.training.losses import base as L
from sparf_tpu.utils import camera, geometry

Array = jax.Array


# ---------------------------------------------------------------------------
# host-side precompute
# ---------------------------------------------------------------------------


def build_correspondence_pools(cfg, scene_np, logger=None,
                               init_poses_w2c=None) -> Dict[str, np.ndarray]:
    """Run the matcher over the pair list and build fixed-size pixel pools.

    Returns dict with pool_pix_self/other (n,Pmax,2), pool_conf (n,Pmax),
    pool_count (n,), pair_ids (n,2), or n=0 when no pair survives filtering.
    """
    images = scene_np["image"]
    n_views, _, H, W = images.shape

    method = cfg.get("matching_pair_generation", "all_to_all")
    if method == "all":
        combi_list = flow_mod.generate_pair_list(n_views)
    elif method == "all_to_all":
        combi_list = flow_mod.get_combi_list(n_views, "all")
    elif method == "angle":
        combi_list = flow_mod.image_pair_candidates_with_angular_distance(
            scene_np["pose"], cfg.get("pairing_angle_threshold", 45)
        )
    else:
        raise ValueError(method)

    backend = "gt_depth" if cfg.get("use_gt_correspondences") else cfg.get("flow_backbone", "zncc")
    wrapper = flow_mod.FlowSelectionWrapper(
        backend=backend, ckpt_path=cfg.get("flow_ckpt_path"),
        adapt_steps=int(cfg.get("pdcnet_adapt_steps", 0) or 0),
        init_poses_w2c=init_poses_w2c,
        use_homography=bool(cfg.get("use_homography_flow")),
        geometry_refine=bool(cfg.get("pdcnet_geometry_refine", True)),
        multiscale_factors=cfg.get("pdcnet_multiscale") or (),
    )
    cc_maps = None
    if cfg.get("filter_corr_w_cc"):
        # reference base_corres_loss.py:104-117: a SEPARATE cyclic-consistency
        # confidence additionally gates the valid-match mask
        corres_maps, conf_maps, cc_maps = (
            wrapper.compute_flow_and_confidence_map_and_cc_of_combi_list(
                scene_np, combi_list
            )
        )
    else:
        corres_maps, conf_maps = wrapper.compute_flow_and_confidence_map_of_combi_list(
            scene_np, combi_list
        )
    if cfg.get("use_gt_correspondences") and cfg.get("use_dummy_all_one_confidence"):
        conf_maps = np.ones_like(conf_maps)

    min_conf = 1.0 if backend == "gt_depth" else float(cfg.get("min_conf_valid_corr", 0.95))
    mask_valid = flow_mod.get_mask_valid_from_conf_map(conf_maps, corres_maps, min_conf)
    if cc_maps is not None:
        mask_valid &= cc_maps >= float(cfg.get("min_conf_cc_valid_corr", 1 / 2.5))

    # geometric verification (no reference counterpart; default-on for the
    # built-in matcher): epipolar RANSAC per pair kills drift that survives
    # cycle/score gating. Inliers may still slide ALONG epipolar lines, but
    # such matches are consistent with the true pose (they only imply a
    # different depth) — exactly what the reprojection loss can absorb.
    if backend != "gt_depth" and cfg.get("geometric_verification", True):
        import cv2

        for p in range(mask_valid.shape[0]):
            ys, xs = np.where(mask_valid[p, 0])
            if len(ys) < 16:
                continue
            pts1 = np.stack([xs, ys], -1).astype(np.float64)
            pts2 = corres_maps[p, :, ys, xs].astype(np.float64)
            F, inliers = cv2.findFundamentalMat(pts1, pts2, cv2.FM_RANSAC, 1.0, 0.999)
            if F is None or inliers is None:
                mask_valid[p] = False
                continue
            keep = inliers[:, 0].astype(bool)
            new_mask = np.zeros_like(mask_valid[p, 0])
            new_mask[ys[keep], xs[keep]] = True
            mask_valid[p, 0] = new_mask

    min_nbr_matches = int(cfg.get("min_nbr_matches", 500))
    kept = [
        i for i in range(combi_list.shape[1]) if mask_valid[i].sum() > min_nbr_matches
    ]
    if logger:
        logger.info(
            # log the RESOLVED backend (what actually ran), not the request —
            # a PDCNet request can fall back to the classical matcher
            f"correspondence precompute [{wrapper._resolve_backend()}]: "
            f"{combi_list.shape[1]} pairs, "
            f"{len(kept)} kept (>{min_nbr_matches} confident px)"
        )
    if not kept:
        return dict(n_pairs=0)

    counts = [int(mask_valid[i].sum()) for i in kept]
    Pmax = max(counts)
    n = len(kept)
    pool_pix_self = np.zeros((n, Pmax, 2), np.float32)
    pool_pix_other = np.zeros((n, Pmax, 2), np.float32)
    pool_conf = np.zeros((n, Pmax), np.float32)
    pool_count = np.zeros((n,), np.int32)
    pair_ids = np.zeros((n, 2), np.int32)

    xx, yy = np.meshgrid(np.arange(W), np.arange(H))
    for k, i in enumerate(kept):
        m = mask_valid[i, 0]
        ys, xs = np.where(m)
        c = len(ys)
        pool_pix_self[k, :c] = np.stack([xs, ys], -1)
        pool_pix_other[k, :c] = corres_maps[i, :, ys, xs]
        pool_conf[k, :c] = conf_maps[i, 0, ys, xs]
        pool_count[k] = c
        pair_ids[k] = combi_list[:, i]

    return dict(
        n_pairs=n,
        pool_pix_self=pool_pix_self,
        pool_pix_other=pool_pix_other,
        pool_conf=pool_conf,
        pool_count=pool_count,
        pair_ids=pair_ids,
        corres_maps=corres_maps,
        conf_maps=conf_maps,
        mask_valid=mask_valid,
        combi_list=combi_list,
    )


def compute_flow_metrics(pools_np: Dict[str, np.ndarray], scene_np) -> Dict[str, float]:
    """EPE/PCK of the precomputed correspondences vs GT-depth correspondences
    (reference correspondence_utils.py:94-126, logged when depth_gt exists)."""
    if pools_np.get("n_pairs", 0) == 0 or "depth_gt" not in scene_np:
        return {}
    from sparf_tpu.models import flow_net

    combi = pools_np["combi_list"]
    gt_corres, gt_conf = flow_net.compute_gt_flow_of_combi_list(scene_np, combi)
    pred = pools_np["corres_maps"]
    pred_valid = pools_np["mask_valid"][:, 0].astype(bool)
    gt_valid = gt_conf[:, 0] > 0.5
    err = np.linalg.norm(pred - gt_corres, axis=1)

    out = {}
    m_all = gt_valid
    if m_all.any():
        e = err[m_all]
        out["avg_epe_all"] = float(e.mean())
        out["avg_pck_1_all"] = float((e <= 1).mean())
        out["avg_pck_3_all"] = float((e <= 3).mean())
    m_conf = gt_valid & pred_valid
    if m_conf.any():
        e = err[m_conf]
        out["avg_epe_in_conf"] = float(e.mean())
        out["avg_pck_1_in_conf"] = float((e <= 1).mean())
        out["avg_pck_3_in_conf"] = float((e <= 3).mean())
    return out


# ---------------------------------------------------------------------------
# jitted loss
# ---------------------------------------------------------------------------


def compute_render_and_repro_loss_w_repro_thres(
    cfg,
    pixels_in_self: Array,
    depth_rendered_self: Array,
    intr_self: Array,
    pixels_in_other: Array,
    depth_rendered_other: Array,
    intr_other: Array,
    T_self2other: Array,
    conf_values: Array,
) -> Array:
    """(corres_loss.py:51-95). All args leading dim N; intr (1,3,3); T (1,4,4)."""
    pts_repr, depth_repr = geometry.batch_project_to_other_img(
        pixels_in_self[None], depth_rendered_self[None], intr_self, intr_other,
        T_self2other, return_depth=True,
    )
    pts_repr = pts_repr[0]
    depth_repr = depth_repr[0]
    diff = pts_repr - pixels_in_other  # (N,2)
    dist = jnp.linalg.norm(diff, axis=-1, keepdims=True)

    valid = jnp.ones_like(dist, bool)
    if cfg.get("renderrepro_do_pixel_reprojection_check"):
        valid &= jax.lax.stop_gradient(dist) <= cfg.renderrepro_pixel_reprojection_thresh
    if cfg.get("renderrepro_do_depth_reprojection_check"):
        rel = jnp.abs(depth_rendered_other - depth_repr) / (depth_rendered_other + 1e-6)
        valid &= (jax.lax.stop_gradient(rel) <= cfg.renderrepro_depth_reprojection_thresh)[..., None]

    return L.compute_diff_loss(
        cfg.get("diff_loss_type", "huber"), diff, weights=conf_values[..., None], mask=valid
    )


def make_corres_loss_builder(trainer):
    """Returns make(fine_enabled) -> LossBuilder. Precomputes pools now."""
    cfg = trainer.cfg
    # matcher geometry prior: the mid-training rematch (rematch_at_ratio)
    # swaps in the current pose estimates; otherwise the initial poses
    prior = getattr(trainer, "matcher_prior_poses_w2c", None)
    if prior is None:
        prior = getattr(trainer, "initial_poses_w2c", None)
    pools_np = build_correspondence_pools(
        cfg, trainer.train_scene_np, trainer.logger,
        init_poses_w2c=prior,
    )
    trainer.corres_pools = pools_np  # exposed for tests/flow metrics
    flow_stats = compute_flow_metrics(pools_np, trainer.train_scene_np)
    if flow_stats:
        trainer.logger.info(
            "flow quality vs GT: "
            + " ".join(f"{k}={v:.3f}" for k, v in sorted(flow_stats.items()))
        )
        trainer.writer.write_event("train", flow_stats, 0)
    if pools_np["n_pairs"] == 0:
        def make_empty(fine_enabled):
            def builder(nerf_params, poses_w2c, key, iteration, progress):
                return {"corres": jnp.asarray(0.0)}, {}
            return builder
        return make_empty

    pools = {k: jnp.asarray(v) for k, v in pools_np.items()
             if k in ("pool_pix_self", "pool_pix_other", "pool_conf", "pool_count", "pair_ids")}
    n_pairs = pools_np["n_pairs"]
    scene = trainer.train_scene
    render_cfg = trainer.render_cfg
    impl = trainer.mlp_impl
    N = int(cfg.nerf.rand_rays) // 2
    max_iter = float(cfg.max_iter)

    start_iter = float(cfg.start_iter.get("corres", 0) or 0)
    if cfg.start_ratio.get("corres") is not None:
        start_iter = max(start_iter, float(cfg.start_ratio.corres) * max_iter)
    stop_at = cfg.get("stop_corres_loss_at")

    decay_start = None
    if cfg.get("gradually_decrease_corres_weight"):
        decay_start = (
            float(cfg.ratio_start_decrease_corres_weight) * max_iter
            if cfg.get("ratio_start_decrease_corres_weight") is not None
            else float(cfg.get("iter_start_decrease_corres_weight", 0))
        )
    reduct_every = float(cfg.get("corres_weight_reduct_at_x_iter", 10000))
    compute_photo = bool(cfg.get("compute_photo_on_matches", False))
    # debugging: substitute GT depth for the rendered depth -> the corres loss
    # becomes a pure pose signal (reference flag corres_loss.py:43, vestigial
    # there; functional here)
    use_gt_depth = bool(cfg.get("use_gt_depth", False)) and "depth_gt" in scene
    if use_gt_depth:
        H_img, W_img = trainer.train_scene_np["image"].shape[-2:]
        depth_gt_flat = jnp.asarray(
            trainer.train_scene_np["depth_gt"].reshape(trainer.n_train_views, -1)
        )

    def make(fine_enabled: bool):
        def builder(nerf_params, poses_w2c, key, iteration, progress):
            from sparf_tpu.parallel import mesh as mesh_mod

            k_pair, k_sub, k_r1, k_r2 = jax.random.split(key, 4)
            p = jax.random.randint(k_pair, (), 0, n_pairs)
            count = pools["pool_count"][p]
            idx = jax.random.randint(k_sub, (N,), 0, 2**31 - 1) % count
            idx = mesh_mod.shard_rays(idx)
            pix_self = pools["pool_pix_self"][p][idx]      # (N,2)
            pix_other = pools["pool_pix_other"][p][idx]    # (N,2)
            conf = pools["pool_conf"][p][idx]              # (N,)
            id_self = pools["pair_ids"][p, 0]
            id_other = pools["pair_ids"][p, 1]

            pose_self = jnp.take(poses_w2c, id_self, axis=0)[None]    # (1,3,4)
            pose_other = jnp.take(poses_w2c, id_other, axis=0)[None]
            intr_self = jnp.take(scene["intr"], id_self, axis=0)[None]
            intr_other = jnp.take(scene["intr"], id_other, axis=0)[None]

            # two per-direction renders (reference corres_loss.py:181-219
            # renders each view separately too). A round-2 variant stacked
            # both directions into one B=2 render claiming better MXU
            # efficiency; the A/B (PERF_NOTES round-3 findings) measured
            # batched 14.21 vs split 14.50 it/s weighted — no gain, so the
            # simpler form with independent stratified jitter stays.
            ret_self, ret_other = yield [
                renderer_mod.RayBundle(
                    pixels=pix_self[None], pose_w2c=pose_self,
                    intr=intr_self, key=k_r1, stratified=True,
                ),
                renderer_mod.RayBundle(
                    pixels=pix_other[None], pose_w2c=pose_other,
                    intr=intr_other, key=k_r2, stratified=True,
                ),
            ]

            T_s2o = geometry.pose_to_T4x4(
                camera.pose_compose_pair(camera.pose_invert(pose_self), pose_other)
            )
            T_o2s = geometry.pose_to_T4x4(
                camera.pose_compose_pair(camera.pose_invert(pose_other), pose_self)
            )

            def both_directions(depth_s, depth_o):
                l1 = compute_render_and_repro_loss_w_repro_thres(
                    cfg, pix_self, depth_s, intr_self, pix_other, depth_o, intr_other,
                    T_s2o, conf,
                )
                l2 = compute_render_and_repro_loss_w_repro_thres(
                    cfg, pix_other, depth_o, intr_other, pix_self, depth_s, intr_self,
                    T_o2s, conf,
                )
                return l1 + l2

            if use_gt_depth:
                def gt_depth_at(pix, idx_img):
                    flat = jnp.clip(
                        jnp.round(pix[:, 1]).astype(jnp.int32) * W_img
                        + jnp.round(pix[:, 0]).astype(jnp.int32),
                        0, H_img * W_img - 1,
                    )
                    return jnp.take(depth_gt_flat, idx_img, axis=0)[flat]

                loss_corres = both_directions(
                    gt_depth_at(pix_self, id_self), gt_depth_at(pix_other, id_other)
                ) / 2.0
                has_fine = False
            else:
                loss_corres = both_directions(
                    ret_self["depth"][0, :, 0], ret_other["depth"][0, :, 0]
                )
                has_fine = "depth_fine" in ret_self
                if has_fine:
                    loss_corres = loss_corres + both_directions(
                        ret_self["depth_fine"][0, :, 0], ret_other["depth_fine"][0, :, 0]
                    )
                loss_corres = loss_corres / (4.0 if has_fine else 2.0)

            # schedules (base_corres_loss.py:203-213 + start_iter gate)
            gate = L.iteration_gate(iteration, start_iter)
            if stop_at is not None:
                gate = gate * (iteration < stop_at).astype(jnp.float32)
            if decay_start is not None:
                steps_past = jnp.maximum(iteration - decay_start, 0.0)
                gamma = 2.0 ** jnp.floor(
                    jnp.where(iteration >= decay_start, steps_past / reduct_every, 0.0)
                )
                loss_corres = loss_corres / gamma
            loss_dict = {"corres": loss_corres * gate}

            if compute_photo:
                images_flat = scene["image"].reshape(scene["image"].shape[0], 3, -1)
                H, W = scene["image"].shape[-2:]

                def photo(ret, pix, idx_img):
                    r = jnp.clip(
                        jnp.round(pix[:, 1]).astype(jnp.int32) * W
                        + jnp.round(pix[:, 0]).astype(jnp.int32),
                        0, H * W - 1,
                    )
                    gt = jnp.take(images_flat, idx_img, axis=0)[:, r].T  # (N,3)
                    loss = L.mse_loss(ret["rgb"][0], gt)
                    if "rgb_fine" in ret:
                        loss = loss + L.mse_loss(ret["rgb_fine"][0], gt)
                    return loss

                loss_photo = (photo(ret_self, pix_self, id_self)
                              + photo(ret_other, pix_other, id_other)) / 2.0
                loss_dict["render_matches"] = loss_photo * gate

            stats = {
                "depth_in_corr_loss": jax.lax.stop_gradient(jnp.mean(ret_self["depth"])),
                "perc_valid_corr_mask": count.astype(jnp.float32)
                / float(pools_np["pool_pix_self"].shape[1]),
            }
            return loss_dict, stats

        return builder

    return make
