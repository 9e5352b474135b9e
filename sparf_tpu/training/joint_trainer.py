"""Joint pose + NeRF trainer (SPARF main) and the fixed-noisy-poses ablation.

Parity with reference source/training/joint_pose_nerf_trainer.py:39-749 and
nerf_trainer_w_fixed_colmap_poses.py:29-188:
  - initial poses: identity (+translation centering), noisy GT (se3 noise),
    or COLMAP/SfM from matches (sparf_tpu.colmap_init);
  - pose parametrization from sparf_tpu.models.pose_params;
  - dual optimizers (separate Adam + exponential decay + optional warmup);
  - two-stage schedule joint -> frozen poses (+ optional NeRF re-init);
  - pose evaluation via sim3/pairwise alignment, test poses backtracked
    through the saved sim3 for val/eval rendering;
  - test-time photometric pose refinement: a jitted Adam loop over a 6-dof
    twist per test image (lax-friendly; reference runs 100 python steps).
"""
from __future__ import annotations

import functools
import json
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sparf_tpu.models import pose_params as pose_mod
from sparf_tpu.models import renderer as renderer_mod
from sparf_tpu.models.pose_params import PoseConfig
from sparf_tpu.training import engine
from sparf_tpu.training.losses import base as loss_base
from sparf_tpu.training.trainer import NerfTrainerPerScene
from sparf_tpu.utils import alignment, camera

Array = jax.Array


def _refine_stats(pose_pre: Array, pose_post: Array) -> Dict[str, object]:
    """How far test-time photometric refinement moved a test pose: rotation
    (deg) + camera-center distance, plus the pre-refinement pose so eval can
    measure the w/-vs-w/o metric delta (reference dual-eval, eval.py:81-106)."""
    pre = np.asarray(jax.device_get(pose_pre)).reshape(3, 4)
    post = np.asarray(jax.device_get(pose_post)).reshape(3, 4)
    rot = float(alignment.rotation_distance_np(pre[None, :, :3], post[None, :, :3])[0])
    c_pre = -pre[:, :3].T @ pre[:, 3]
    c_post = -post[:, :3].T @ post[:, 3]
    return {
        "rot_deg": rot * 180.0 / np.pi,
        "trans": float(np.linalg.norm(c_post - c_pre)),
        "pose_pre": jnp.asarray(pre[None]),
    }


class PoseAndNerfTrainerPerScene(NerfTrainerPerScene):
    """Joint pose-NeRF optimization (SPARF's main trainer)."""

    model_name = "joint_pose_nerf_training"

    # ------------------------------------------------------------------ build

    def build_networks(self):
        super().build_networks()
        cfg = self.cfg
        initial_poses_w2c, valid_idx, excluded = self.set_initial_poses()
        self.initial_poses_w2c = jnp.asarray(initial_poses_w2c[:, :3], jnp.float32)
        self.valid_poses_idx = valid_idx
        self.index_images_excluded = excluded

        pose_GT = np.asarray(self.train_scene_np["pose"])
        self.initial_pose_error = alignment.evaluate_any_poses(
            np.asarray(initial_poses_w2c[:, :3]), pose_GT
        )
        self.logger.info(f"initial pose error: {self.initial_pose_error}")

        self.pose_cfg = PoseConfig.from_config(cfg, nbr_poses=self.n_train_views)
        self.sim3_est_to_gt_c2w = alignment.identity_sim3()

    def set_initial_poses(self) -> Tuple[np.ndarray, list, list]:
        """(joint_pose_nerf_trainer.py:41-125)."""
        cfg = self.cfg
        pose_GT_w2c = np.asarray(self.train_scene_np["pose"])  # (N,3,4)
        n_poses = pose_GT_w2c.shape[0]
        valid_idx = list(range(n_poses))
        excluded: list = []
        initial_pose = cfg.camera.get("initial_pose", "identity")
        key = jax.random.PRNGKey(cfg.get("seed", 0))

        if initial_pose == "identity":
            init = np.broadcast_to(np.eye(3, 4, dtype=np.float32), (n_poses, 3, 4)).copy()
            init, _ = alignment.align_translations(pose_GT_w2c, init)
        elif initial_pose == "noisy_gt":
            n_fixed = cfg.camera.get("n_first_fixed_poses", 0) if cfg.camera.get("optimize_relative_poses") else 0
            n_opt = n_poses - n_fixed
            se3_noise = jax.random.normal(key, (n_opt, 6)) * cfg.camera.noise
            pose_noise = np.asarray(camera.se3_to_SE3(se3_noise))
            if n_fixed > 0:
                eye = np.broadcast_to(np.eye(3, 4, dtype=np.float32), (n_fixed, 3, 4))
                pose_noise = np.concatenate([eye, pose_noise], axis=0)
            init = np.asarray(
                camera.pose_compose([jnp.asarray(pose_noise), jnp.asarray(pose_GT_w2c)])
            )
            init = alignment.pad_poses(init)
        elif initial_pose == "given":
            init = alignment.pad_poses(np.asarray(self.train_scene_np["pose_initial"]))
        elif "sfm" in initial_pose:
            from sparf_tpu.colmap_init import sfm

            result = sfm.compute_sfm_from_matches(
                cfg, self.train_scene_np,
                save_dir=cfg.get("sfm_cache_dir") or f"{self.workspace}/init_sfm",
                load_colmap_depth=bool(cfg.get("load_colmap_depth")),
            )
            init = result.poses_w2c
            valid_idx = result.valid_poses_idx
            excluded = result.index_images_excluded
            init_aligned, sim3 = alignment.prealign_w2c_small_camera_systems(
                init[:, :3], pose_GT_w2c
            )
            init = alignment.pad_poses(init_aligned)
            if result.colmap_depth is not None:
                self.train_scene["colmap_depth"] = jnp.asarray(result.colmap_depth * sim3.s)
                self.train_scene["colmap_conf"] = jnp.asarray(result.colmap_conf)
        else:
            raise ValueError(initial_pose)

        if init.shape[-2] == 3:
            init = alignment.pad_poses(init)
        return init.astype(np.float32), valid_idx, excluded

    def setup_optimizer(self):
        super().setup_optimizer()
        cfg = self.cfg
        lr_pose_fn = engine.pose_lr_schedule(
            cfg.optim.lr_pose, cfg.optim.get("lr_pose_end"),
            cfg.max_iter, cfg.optim.get("warmup_pose"),
        )
        self.tx_pose = engine.make_optimizer(lr_pose_fn, cfg.get("pose_gradient_clipping"))
        self.lr_pose_fn = lr_pose_fn

    # -------------------------------------------------------------- schedules

    @property
    def iter_end_joint(self) -> Optional[int]:
        cfg = self.cfg
        if not cfg.get("first_joint_pose_nerf_then_nerf"):
            return None
        ratio = cfg.get("ratio_end_joint_nerf_pose_refinement")
        if ratio is not None:
            return int(cfg.max_iter * ratio)
        return int(cfg.get("end_joint_nerf_pose_refinement"))

    def optimize_poses_at(self, iteration: int) -> bool:
        end = self.iter_end_joint
        return True if end is None else iteration < end

    def on_iteration_start(self, iteration: int):
        end = self.iter_end_joint
        if end is not None and iteration == end and self.cfg.get("restart_nerf"):
            # re-initialize NeRF weights + optimizer at the stage switch
            # (base.py:160-166). iteration_nerf keeps counting.
            self.logger.info("stage switch: re-initializing NeRF and its optimizer")
            k = jax.random.fold_in(self.base_key, 1)
            nerf_params = renderer_mod.init_graph_params(k, self.render_cfg)
            self.state = self.state.replace(
                nerf_params=nerf_params, opt_state_nerf=self.tx_nerf.init(nerf_params)
            )
        rr = self.cfg.get("rematch_at_ratio")
        if (rr is not None and not getattr(self, "_rematched", False)
                and iteration >= int(float(rr) * self.cfg.max_iter) > 0):
            self._rematched = True
            self.refresh_correspondence_pools()

    def refresh_correspondence_pools(self):
        """Mid-training matcher refresh — NO reference counterpart (the
        reference's pools are static for the whole run). Once the joint stage
        has pulled the poses from ~10 deg to ~2 deg, re-running the
        geometry-guided matcher with the CURRENT estimates as its SfM prior
        yields far cleaner pools (the matcher's own accuracy is bounded by
        its pose prior); the remaining joint iterations then converge on the
        better matches. Enable with cfg.rematch_at_ratio (e.g. 0.15).
        Triggers once, >= the boundary (covers resume past the boundary)."""
        self.logger.info("rematch: rebuilding correspondence pools with "
                         "current pose estimates as the geometry prior")
        self.matcher_prior_poses_w2c = np.asarray(self.current_poses_w2c())
        self.define_loss_module()
        self._step_cache = {}

    # ------------------------------------------------------------- pose state

    def current_poses_w2c(self) -> Array:
        return pose_mod.get_w2c_poses(self.pose_cfg, self.state.pose_params, self.pose_constants)

    def evaluate_poses(self) -> Dict[str, float]:
        """Rot/trans errors vs GT, before/after alignment (joint :256-311)."""
        pose = np.asarray(self.current_poses_w2c())
        pose_GT = np.asarray(self.train_scene_np["pose"])
        return alignment.evaluate_any_poses(pose, pose_GT)

    def make_results_dict_low_freq(self) -> Dict[str, float]:
        return self.evaluate_poses()

    def update_sim3(self):
        """Recompute the sim3 mapping optimized->GT c2w; saved for eval
        backtracking (joint inference() :560-575)."""
        pose = np.asarray(self.current_poses_w2c())
        pose_GT = np.asarray(self.train_scene_np["pose"])
        if pose.shape[0] > 9:
            _, self.sim3_est_to_gt_c2w = alignment.prealign_w2c_large_camera_systems(pose, pose_GT)
        else:
            _, self.sim3_est_to_gt_c2w = alignment.prealign_w2c_small_camera_systems(pose, pose_GT)

    # -------------------------------------------------------------- val / eval

    def val_pose_and_scale(self, idx: int) -> Tuple[Array, float]:
        self.update_sim3()
        pose_GT = np.asarray(self.val_scene_np["pose"][idx : idx + 1])
        pose = alignment.backtrack_gt_through_sim3(pose_GT, self.sim3_est_to_gt_c2w)
        return jnp.asarray(pose), float(self.sim3_est_to_gt_c2w.s)

    def test_pose_and_scale(self, test_scene, idx: int) -> Tuple[Array, float]:
        self.update_sim3()
        pose_GT = np.asarray(jax.device_get(test_scene["pose"][idx : idx + 1]))
        pose = jnp.asarray(
            alignment.backtrack_gt_through_sim3(pose_GT, self.sim3_est_to_gt_c2w)
        )
        scale = float(self.sim3_est_to_gt_c2w.s)
        self._last_refine = None
        if self.cfg.optim.get("test_photo", False) and self._test_optim_enabled:
            refine = self.run_test_time_photometric_optim(test_scene, idx, pose)
            pose_pre = pose
            pose = camera.pose_compose([camera.se3_to_SE3(refine), pose])
            self._last_refine = _refine_stats(pose_pre, pose)
        return pose, scale

    _test_optim_enabled = True
    _last_refine = None

    # ------------------------------------------------ test-time pose refinement

    @functools.cached_property
    def _test_optim_step(self):
        """Jitted (nerf_params, pose, image, intr, depth_range, key) ->
        refined twist. One compile, reused for every test image."""
        cfg = self.cfg
        render_cfg = self.render_cfg
        n_iter = int(cfg.optim.get("test_iter", 100))
        lr = float(cfg.optim.lr_pose)
        H, W = self.val_scene_np["image"].shape[-2:]
        rand_rays = int(cfg.nerf.rand_rays)
        tx = optax.adam(lr)
        huber = bool(cfg.huber_loss_for_photometric)
        fine_enabled = self.fine_enabled_at(self.cfg.max_iter)

        def loss_fn(twist, nerf_params, pose, image_flat, intr, depth_range, key):
            pose_refined = camera.pose_compose([camera.se3_to_SE3(twist), pose])
            ray_idx = jax.random.randint(key, (rand_rays,), 0, H * W)
            px = jnp.stack(
                [(ray_idx % W).astype(jnp.float32) + 0.5,
                 (ray_idx // W).astype(jnp.float32) + 0.5], axis=-1
            )
            out = renderer_mod.render_at_pixels(
                nerf_params, render_cfg, pose_refined, intr, px, depth_range,
                jnp.asarray(1.0), key=None, stratified=False, fine_enabled=fine_enabled,
            )
            gt = image_flat[:, ray_idx]
            loss = (loss_base.huber_loss if huber else loss_base.mse_loss)(out["rgb"], gt)
            if "rgb_fine" in out:
                loss = loss + (loss_base.huber_loss if huber else loss_base.mse_loss)(
                    out["rgb_fine"], gt
                )
            return loss

        @jax.jit
        def run(nerf_params, pose, image, intr, depth_range, key):
            image_flat = image.reshape(1, 3, -1).transpose(0, 2, 1)  # (1,HW,3)
            twist = jnp.zeros((1, 6))
            opt_state = tx.init(twist)

            def body(i, carry):
                twist, opt_state = carry
                k = jax.random.fold_in(key, i)
                g = jax.grad(loss_fn)(twist, nerf_params, pose, image_flat, intr, depth_range, k)
                upd, opt_state = tx.update(g, opt_state, twist)
                return optax.apply_updates(twist, upd), opt_state

            twist, _ = jax.lax.fori_loop(0, n_iter, body, (twist, opt_state))
            return twist

        return run

    def run_test_time_photometric_optim(self, test_scene, idx: int, pose: Array) -> Array:
        key = jax.random.fold_in(self.base_key, 1000 + idx)
        return self._test_optim_step(
            self.state.nerf_params, pose, test_scene["image"][idx : idx + 1],
            test_scene["intr"][idx : idx + 1],
            renderer_mod.render_depth_range(self.cfg, test_scene), key,
        )

    def evaluate_full(self, save_ind_files: bool = False, out_dir: Optional[str] = None,
                      with_test_optim: Optional[bool] = None, plot: bool = False) -> Dict:
        """Adds pose metrics to the eval bundle (joint :636-662)."""
        if with_test_optim is not None:
            self._test_optim_enabled = with_test_optim
        result = super().evaluate_full(save_ind_files, out_dir, plot=plot)
        pose_stats = self.evaluate_poses()
        result["mean"].update({"rot_error": pose_stats["error_R"],
                               "trans_error": pose_stats["error_t"]})
        result["mean"]["init_rot_error"] = self.initial_pose_error["error_R_before_align"]
        result["mean"]["init_trans_error"] = self.initial_pose_error["error_t_before_align"]
        # re-dump the JSON so the pose metrics land on disk too
        out_path = os.path.join(out_dir or self.workspace, f"{self.cfg.get('expname', 'eval')}.json")
        with open(out_path, "w") as f:
            json.dump(result, f, indent=2, default=float)
        return result


class NerfTrainerPerSceneWColmapFixedPoses(PoseAndNerfTrainerPerScene):
    """NeRF training with FROZEN noisy/COLMAP initial poses (ablation;
    nerf_trainer_w_fixed_colmap_poses.py:29-188)."""

    model_name = "nerf_fixed_noisy_poses"

    def optimize_poses_at(self, iteration: int) -> bool:
        return False

    def val_pose_and_scale(self, idx: int) -> Tuple[Array, float]:
        # GT test poses are used directly (the scene frame equals the GT frame
        # up to the fixed initial-pose error)
        return self.val_scene["pose"][idx : idx + 1], 1.0

    def test_pose_and_scale(self, test_scene, idx: int) -> Tuple[Array, float]:
        pose = test_scene["pose"][idx : idx + 1]
        self._last_refine = None
        if self.cfg.optim.get("test_photo", False) and self._test_optim_enabled:
            refine = self.run_test_time_photometric_optim(test_scene, idx, pose)
            pose_pre = pose
            pose = camera.pose_compose([camera.se3_to_SE3(refine), pose])
            self._last_refine = _refine_stats(pose_pre, pose)
        return pose, 1.0
