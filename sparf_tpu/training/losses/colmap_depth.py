"""DS-NeRF sparse COLMAP depth loss (reference base_losses.py:327-402).

Renders at pixels where a (triangulated) COLMAP depth exists and penalizes the
squared difference weighted by the COLMAP confidence, x0.1 as in DS-NeRF.
Requires scene['colmap_depth'] (B,H,W) + scene['colmap_conf'] (B,H,W)
(produced by sparf_tpu.colmap_init triangulation / sfm with load_colmap_depth).

TPU-native: per-image valid-pixel pools padded to one fixed size, sampled with
traced randints.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sparf_tpu.models import renderer as renderer_mod

Array = jax.Array


def make_colmap_depth_loss_builder(trainer):
    cfg = trainer.cfg
    scene = trainer.train_scene
    scene_np = trainer.train_scene_np

    if "colmap_depth" not in scene and cfg.model == "nerf_gt_poses":
        # DS-NeRF use case: triangulate matches with the (ground-truth) poses
        # to produce the sparse depth supervision (reference
        # nerf_trainer.get_colmap_triangulation, triangulation_w_known_poses.py)
        from sparf_tpu.colmap_init.triangulation import compute_triangulation_from_matches

        trainer.logger.info("triangulating matches with known poses for SparseCOLMAPDepthLoss")
        out = compute_triangulation_from_matches(cfg, scene_np)
        scene["colmap_depth"] = jnp.asarray(out["colmap_depth"])
        scene["colmap_conf"] = jnp.asarray(out["colmap_conf"])

    if "colmap_depth" not in scene:
        trainer.logger.warning(
            "SparseCOLMAPDepthLoss requested but scene has no colmap_depth; loss is 0"
        )

        def make_empty(fine_enabled):
            def builder(nerf_params, poses_w2c, key, iteration, progress):
                return {"colmap_depth": jnp.asarray(0.0)}, {}
            return builder

        return make_empty

    colmap_depth = np.asarray(jax.device_get(scene["colmap_depth"]))  # (B,H,W)
    colmap_conf = np.asarray(jax.device_get(scene["colmap_conf"]))
    B, H, W = colmap_depth.shape
    pools, counts = [], []
    for b in range(B):
        ys, xs = np.where(colmap_depth[b] > 1e-6)
        pools.append(np.stack([xs, ys], -1).astype(np.int32))
        counts.append(len(ys))
    Pmax = max(max(counts), 1)
    pool = np.zeros((B, Pmax, 2), np.int32)
    for b in range(B):
        pool[b, : counts[b]] = pools[b]
    pool_j = jnp.asarray(pool)
    counts_j = jnp.asarray(np.maximum(np.asarray(counts, np.int32), 1))
    depth_j = jnp.asarray(colmap_depth.reshape(B, -1))
    conf_j = jnp.asarray(colmap_conf.reshape(B, -1))
    have_any = jnp.asarray((np.asarray(counts) > 0).astype(np.float32))

    render_cfg = trainer.render_cfg
    impl = trainer.mlp_impl
    N = max(int(cfg.nerf.rand_rays) // B, 1)
    perc = float(np.mean(colmap_depth > 0))

    def make(fine_enabled: bool):
        def builder(nerf_params, poses_w2c, key, iteration, progress):
            k_sub, k_r = jax.random.split(key)
            idx = jax.random.randint(k_sub, (B, N), 0, 2**31 - 1) % counts_j[:, None]
            pix = jnp.take_along_axis(pool_j, idx[..., None], axis=1).astype(jnp.float32)  # (B,N,2)
            flat = (pix[..., 1] * W + pix[..., 0]).astype(jnp.int32)  # (B,N)
            gt_depth = jnp.take_along_axis(depth_j, flat, axis=1)
            weight = jnp.take_along_axis(conf_j, flat, axis=1) * have_any[:, None]

            (ret,) = yield [renderer_mod.RayBundle(
                pixels=pix, pose_w2c=poses_w2c, intr=scene["intr"],
                key=k_r, stratified=True,
            )]

            def term(key_name):
                pred = ret[key_name][..., 0]  # (B,N)
                per_img = jnp.mean(((gt_depth - pred) ** 2) * weight, axis=1)
                return jnp.sum(per_img)

            loss = term("depth")
            if "depth_fine" in ret:
                loss = loss + term("depth_fine")
            loss = 0.1 * loss / B
            stats = {"perc_col_depth": jnp.asarray(perc)}
            return {"colmap_depth": loss}, stats

        return builder

    return make
