"""Depth-consistency loss — SPARF Sec. 4.2 (reference depth_cons_loss.py:32-321).

Render depth from a training view, backproject to pseudo-GT 3D points (poses
detached), project into a virtual pose interpolated between the view and its
nearest-by-angle neighbour, and enforce the re-rendered depth there to agree —
weighted by a transmittance-based visibility estimate from the
render-to-max-depth pass (no-grad, thresholded at 0.2, times opacity).

TPU-native: every reference boolean-filtering step becomes mask arithmetic at
a static ray count; nearest-pose selection and the random interpolation weight
are traced ops inside the jitted step.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from sparf_tpu.models import renderer as renderer_mod
from sparf_tpu.training.losses import base as L
from sparf_tpu.utils import camera, geometry

Array = jax.Array


def nearest_pose_id_by_angle(poses_c2w: Array, id_self: Array) -> Array:
    """Angular 'vector' distance between camera positions (data_utils.py:248-312),
    excluding id_self; traced argmin."""
    centers = poses_c2w[:, :3, 3]  # (B,3)
    tar = jnp.take(centers, id_self, axis=0)
    tar_u = tar / (jnp.linalg.norm(tar) + 1e-12)
    ref_u = centers / (jnp.linalg.norm(centers, axis=-1, keepdims=True) + 1e-12)
    dists = jnp.arccos(jnp.clip(ref_u @ tar_u, -1, 1))
    B = centers.shape[0]
    dists = jnp.where(jnp.arange(B) == id_self, 1e10, dists)
    return jnp.argmin(dists)


def make_depth_cons_loss_builder(trainer):
    cfg = trainer.cfg
    scene = trainer.train_scene
    render_cfg = trainer.render_cfg
    impl = trainer.mlp_impl
    H, W = trainer.train_scene_np["image"].shape[-2:]
    B = trainer.train_scene_np["image"].shape[0]
    # reference hard-codes max(1024, rand_rays) (depth_cons_loss.py:185);
    # overridable for small-scale tests
    N = int(cfg.get("depth_cons_nbr_rays") or max(1024, int(cfg.nerf.rand_rays)))
    max_iter = float(cfg.max_iter)
    frac_center = float(cfg.get("sampled_fraction_in_center", 0.0))

    start_iter = (
        float(cfg.start_ratio.depth_cons) * max_iter
        if cfg.start_ratio.get("depth_cons") is not None
        else float(cfg.start_iter.get("depth_cons", 0) or 0)
    )
    # fine depth is used as supervision only once it has warmed up 5% past its
    # activation (depth_cons_loss.py:192-201)
    fine_ratio = cfg.nerf.get("ratio_start_fine_sampling_at_x")
    fine_warm_iter = (fine_ratio + 0.05) * max_iter if fine_ratio is not None else 0.0
    decay = bool(cfg.get("gradually_decrease_depth_cons_loss"))
    reduct_every = float(cfg.get("depth_cons_loss_reduct_at_x_iter", 10000))
    # visibility sampling starts at the near plane; inverse param uses the raw
    # config range's first entry (renderer.py:486-494)
    inverse_param = cfg.nerf.depth.param == "inverse"
    inv_depth_min = float(cfg.nerf.depth.range[0]) if inverse_param else None

    def make(fine_enabled: bool):
        def builder(nerf_params, poses_w2c, key, iteration, progress):
            k_img, k_pix, k_cx, k_cy, k_w, k_r1, k_r2 = jax.random.split(key, 7)
            id_self = jax.random.randint(k_img, (), 0, B)

            # pixel sampling: uniform + optional center fraction (sample_rays)
            n_center = int(N * frac_center)
            xs = jax.random.randint(k_pix, (N,), 0, W).astype(jnp.float32)
            ys = jax.random.randint(k_cy, (N,), 0, H).astype(jnp.float32)
            if n_center > 0:
                dH, dW = H // 4, W // 4
                cx = jax.random.randint(k_cx, (n_center,), W // 2 - dW, W // 2 + dW)
                cy = jax.random.randint(k_w, (n_center,), H // 2 - dH, H // 2 + dH)
                xs = xs.at[:n_center].set(cx.astype(jnp.float32))
                ys = ys.at[:n_center].set(cy.astype(jnp.float32))
            from sparf_tpu.parallel import mesh as mesh_mod

            pixels_ref = mesh_mod.shard_rays(jnp.stack([xs, ys], -1))  # (N,2)

            poses_det = jax.lax.stop_gradient(poses_w2c)
            poses_w2c_4 = geometry.pose_to_T4x4(poses_det)
            poses_c2w_4 = camera.pose_inverse_4x4(poses_w2c_4)

            pose_ref = jnp.take(poses_det, id_self, axis=0)[None]       # (1,3,4)
            pose_c2w_ref4 = jnp.take(poses_c2w_4, id_self, axis=0)
            intr_ref = jnp.take(scene["intr"], id_self, axis=0)[None]   # (1,3,3)
            near = scene["depth_range"][0, 0]

            # render ref view (with grad wrt nerf params; poses detached)
            (ret_ref,) = yield [renderer_mod.RayBundle(
                pixels=pixels_ref[None], pose_w2c=pose_ref, intr=intr_ref,
                key=k_r1, stratified=True,
            )]
            if fine_enabled and "depth_fine" in ret_ref:
                use_fine = (iteration >= fine_warm_iter).astype(jnp.float32)
                depth_ref = (
                    use_fine * ret_ref["depth_fine"][0, :, 0]
                    + (1 - use_fine) * ret_ref["depth"][0, :, 0]
                )
            else:
                depth_ref = ret_ref["depth"][0, :, 0]

            pts3d_w = geometry.batch_backproject_to_3d(
                pixels_ref[None], depth_ref[None], intr_ref, pose_c2w_ref4[None]
            )[0]  # (N,3)

            # virtual pose: linear interpolation of c2w matrices (depth_cons:45-63)
            id_other = nearest_pose_id_by_angle(poses_c2w_4, id_self)
            w = jax.random.uniform(k_w)
            c2w_unseen = w * pose_c2w_ref4 + (1 - w) * jnp.take(poses_c2w_4, id_other, axis=0)
            w2c_unseen4 = camera.pose_inverse_4x4(c2w_unseen)
            w2c_unseen = w2c_unseen4[:3][None]  # (1,3,4)

            pts_cam = camera.world2cam(pts3d_w[None], w2c_unseen)
            pseudo_depth = pts_cam[0, :, 2]  # (N,)
            uv_hom = camera.cam2img(pts_cam, intr_ref)
            pts2d = (uv_hom[..., :2] / (uv_hom[..., 2:] + 1e-6))[0]  # (N,2)

            valid = (
                (pts2d[:, 0] >= 0) & (pts2d[:, 1] >= 0)
                & (pts2d[:, 0] <= W - 1) & (pts2d[:, 1] <= H - 1)
                & (pseudo_depth >= near)
            )
            pts2d_safe = jnp.stack(
                [jnp.clip(pts2d[:, 0], 0, W - 1), jnp.clip(pts2d[:, 1], 0, H - 1)], -1
            )
            vis_depth_min = jnp.asarray(inv_depth_min) if inverse_param else near
            depth_max_safe = jnp.maximum(pseudo_depth, vis_depth_min + 1e-3)

            # visibility from render-to-max transmittance (no grad) + render at
            # the projected pixels in the virtual view (with grad) — one round
            ret_vis, ret_unseen = yield [
                renderer_mod.RayBundle(
                    pixels=pts2d_safe[None], pose_w2c=w2c_unseen, intr=intr_ref,
                    kind="tomax", depth_min=vis_depth_min,
                    depth_max=depth_max_safe[None], no_grad=True,
                ),
                renderer_mod.RayBundle(
                    pixels=pts2d_safe[None], pose_w2c=w2c_unseen, intr=intr_ref,
                    key=k_r2, stratified=True,
                ),
            ]
            ac_key = "all_cumulated_fine" if "all_cumulated_fine" in ret_vis else "all_cumulated"
            visibility = jax.lax.stop_gradient(ret_vis[ac_key][0])  # (N,)
            vis_ok = visibility >= 0.2

            mask = (valid & vis_ok)[:, None].astype(jnp.float32)

            def term(depth_key, opacity_key):
                d = ret_unseen[depth_key][0, :, 0]
                acc = jax.lax.stop_gradient(ret_unseen[opacity_key][0, :, 0])
                wgt = visibility * acc
                return L.compute_diff_loss(
                    cfg.get("diff_loss_type", "huber"),
                    (pseudo_depth - d)[:, None],
                    weights=wgt[:, None],
                    mask=mask,
                ), wgt

            loss, wgt = term("depth", "opacity")
            if "depth_fine" in ret_unseen:
                lf, _ = term("depth_fine", "opacity_fine")
                loss = loss + lf

            gate = L.iteration_gate(iteration, start_iter)
            # zero out when no point survives (reference early-returns)
            gate = gate * (jnp.sum(mask) > 0).astype(jnp.float32)
            if decay:
                gamma = 2.0 ** jnp.floor(iteration / reduct_every)
                loss = loss / gamma
            stats = {
                "avg_vis_weight": jnp.sum(wgt * mask[:, 0]) / (jnp.sum(mask) + 1e-6),
                "nbr_px_sampling": jnp.sum(mask),
            }
            return {"depth_cons": loss * gate}, stats

        return builder

    return make
