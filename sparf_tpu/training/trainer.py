"""Per-scene trainers (host orchestration around jitted steps).

Counterpart of the reference L4/L3 stack (source/training/base.py:38-800,
nerf_trainer.py:41-571, iter_based_trainer.py:50-445) redesigned TPU-first:
the per-iteration work is one compiled XLA program; the python loop only
feeds the step counter, swaps compiled variants at static schedule
boundaries, and runs periodic host-side actions (validation renders,
pose evaluation, snapshots, logging).
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sparf_tpu.datasets import create_dataset
from sparf_tpu.models import renderer as renderer_mod
from sparf_tpu.models.renderer import RenderConfig
from sparf_tpu.training import checkpointing, engine, metrics as metrics_mod
from sparf_tpu.training.logging_utils import SummaryBoard, TensorboardWriter, Timer, create_logger
from sparf_tpu.training.sampling import make_ray_sampler

Array = jax.Array


def scene_to_device(scene: Dict[str, Any]) -> Dict[str, Any]:
    """numpy Scene -> device arrays (single host->device transfer),
    non-array metadata kept host-side."""
    dev, host = {}, {}
    for k, v in scene.items():
        if isinstance(v, np.ndarray):
            dev[k] = jnp.asarray(v)
        else:
            host[k] = v
    return {**dev, **host}


class NerfTrainerPerScene:
    """NeRF training with fixed ground-truth poses (nerf_trainer.py:41-571)."""

    model_name = "nerf_gt_poses"

    def __init__(self, cfg, workspace: Optional[str] = None, debug: bool = False):
        self.cfg = cfg
        self.debug = debug
        self.workspace = workspace or cfg.get("workspace") or "./workspace"
        os.makedirs(self.workspace, exist_ok=True)
        self.logger = create_logger(os.path.join(self.workspace, "train.log"))
        self.writer = TensorboardWriter(cfg.get("tensorboard_dir") or os.path.join(self.workspace, "tb"))
        self.timer = Timer()
        self.summary = SummaryBoard(last_n=cfg.log_steps)

        if debug:
            cfg.max_iter = min(cfg.max_iter, 10)
            cfg.vis_steps, cfg.log_steps = 2, 2
            cfg.val_steps, cfg.snapshot_steps = 5, 5

        np.random.seed(cfg.get("seed", 0))
        self.base_key = jax.random.PRNGKey(cfg.get("seed", 0))

        # SPMD mesh over the ray batch (cfg.tpu.mesh_shape = [N] or 'auto')
        from sparf_tpu.parallel import mesh as mesh_mod

        mesh_shape = cfg.tpu.get("mesh_shape")
        if mesh_shape == "auto" and len(jax.devices()) > 1:
            mesh_shape = [len(jax.devices())]
        if mesh_shape and mesh_shape != "auto":
            self.mesh = mesh_mod.make_mesh(int(mesh_shape[0]))
            mesh_mod.set_active_mesh(self.mesh)
            self.logger.info(f"SPMD mesh: {self.mesh}")
        else:
            self.mesh = None

        self.load_dataset()
        self.build_networks()
        self.setup_optimizer()
        self.state, self.pose_constants = engine.init_train_state(
            self.base_key, self.render_cfg, self.tx_nerf,
            pose_cfg=getattr(self, "pose_cfg", None),
            initial_poses_w2c=getattr(self, "initial_poses_w2c", None),
            tx_pose=getattr(self, "tx_pose", None),
        )
        self.define_loss_module()

        self.best_val = float("inf")
        self.epoch_of_best_val = 0
        self._step_cache: Dict[Tuple, Any] = {}
        self._lpips = None

    # ------------------------------------------------------------------ setup

    def load_dataset(self):
        cfg = self.cfg
        self.train_scene_np = create_dataset(cfg, "train")
        self.val_scene_np = create_dataset(cfg, "val")
        self.train_scene = scene_to_device(self.train_scene_np)
        self.val_scene = scene_to_device(self.val_scene_np)
        self.sampler = make_ray_sampler(cfg, self.train_scene_np)
        self.H, self.W = self.train_scene_np["image"].shape[-2:]
        self.n_train_views = self.train_scene_np["image"].shape[0]
        self.logger.info(
            f"loaded scene {self.train_scene_np.get('scene')} "
            f"({self.n_train_views} train / {self.val_scene_np['image'].shape[0]} val views, "
            f"{self.H}x{self.W})"
        )

    def build_networks(self):
        self.render_cfg = RenderConfig.from_config(self.cfg)
        # fused Pallas fwd+bwd MLP kernel on real TPUs (1.4x render+grad,
        # PERF_NOTES.md); XLA path elsewhere and when disabled
        self.mlp_impl = "xla"
        if self.cfg.tpu.get("use_pallas") and jax.default_backend() not in ("cpu", "gpu"):
            import sparf_tpu.ops  # registers the pallas impls

            self.mlp_impl = "pallas_vjp"
            self.logger.info("using fused Pallas MLP kernels (impl=pallas_vjp)")

    def setup_optimizer(self):
        cfg = self.cfg
        lr_fn = engine.exponential_lr(cfg.optim.lr, cfg.optim.get("lr_end"), cfg.max_iter)
        clip = cfg.get("nerf_gradient_clipping") if cfg.get("clip_by_norm", True) else None
        self.tx_nerf = engine.make_optimizer(lr_fn, clip, int(cfg.get("grad_acc_steps", 1) or 1))
        self.lr_fn = lr_fn

    def define_loss_module(self):
        """String-driven loss composition (loss_factory.py:25-42): substrings
        of cfg.loss_type activate modules. Photometric is always present;
        corres/depth_cons are wired by the loss factory."""
        from sparf_tpu.training.losses.factory import build_extra_loss_builders

        self.extra_loss_builders = build_extra_loss_builders(self)

    # -------------------------------------------------------------- schedules

    @property
    def iteration(self) -> int:
        return int(np.asarray(self.state.iteration))

    def fine_enabled_at(self, iteration: int) -> bool:
        cfg = self.cfg
        if not cfg.nerf.fine_sampling:
            return False
        ratio = cfg.nerf.get("ratio_start_fine_sampling_at_x")
        if ratio is not None and iteration < cfg.max_iter * ratio:
            return False
        return True

    def optimize_poses_at(self, iteration: int) -> bool:
        return False

    def update_nerf_at(self, iteration: int) -> bool:
        return True

    def stage_signature(self, iteration: int) -> Tuple:
        return (
            iteration < self.cfg.get("precrop_iters", 0),
            self.fine_enabled_at(iteration),
            self.optimize_poses_at(iteration),
            self.update_nerf_at(iteration),
        )

    def make_loss_builder(self, sample_in_center: bool, fine_enabled: bool):
        cfg = self.cfg
        base = engine.default_photometric_loss_builder(
            cfg, self.render_cfg, self.train_scene, self.sampler,
            fine_enabled=fine_enabled, sample_in_center=sample_in_center,
            impl=self.mlp_impl,
        )
        builders = [base] + [mk(fine_enabled) for mk in self.extra_loss_builders]
        render_cfg = self.render_cfg
        scene = self.train_scene
        impl = self.mlp_impl
        # merged multi-loss rendering: every loss module's ray bundles of a
        # round share ONE MLP call per hierarchy level (renderer.render_bundles)
        # instead of one small kernel launch each. Numerically equivalent
        # (tests/test_merged_render.py); the per-bundle fallback remains for
        # density-noise training, whose in-MLP noise the merged call cannot
        # reproduce bundle-for-bundle.
        merge = bool(cfg.tpu.get("merged_render", True)) and not cfg.nerf.density_noise_reg

        def combined(nerf_params, poses_w2c, key, iteration, progress):
            import types

            keys = jax.random.split(key, len(builders))
            depth_range = renderer_mod.render_depth_range(cfg, scene)
            results: dict = {}
            gens: dict = {}
            pending: dict = {}
            for i, b in enumerate(builders):
                r = b(nerf_params, poses_w2c, keys[i], iteration, progress)
                if isinstance(r, types.GeneratorType):
                    gens[i] = r
                    pending[i] = r.send(None)
                else:
                    results[i] = r
            # drive all loss generators in lockstep rounds: each round batches
            # every requested bundle into one render_bundles call
            while pending:
                order = sorted(pending.keys())
                bundles = [bd for i in order for bd in pending[i]]
                outs = renderer_mod.render_bundles(
                    nerf_params, render_cfg, bundles, depth_range, progress,
                    fine_enabled=fine_enabled, impl=impl, merge=merge,
                )
                nxt: dict = {}
                ofs = 0
                for i in order:
                    n_i = len(pending[i])
                    try:
                        nxt[i] = gens[i].send(outs[ofs : ofs + n_i])
                    except StopIteration as e:
                        results[i] = e.value
                    ofs += n_i
                pending = nxt
            loss_dict: dict = {}
            stats: dict = {}
            for i in range(len(builders)):
                ld, st = results[i]
                loss_dict.update(ld)
                stats.update(st)
            return loss_dict, stats

        return combined

    def get_step(self, iteration: int):
        sig = self.stage_signature(iteration)
        if sig not in self._step_cache:
            sample_in_center, fine_enabled, optimize_poses, update_nerf = sig
            builder = self.make_loss_builder(sample_in_center, fine_enabled)
            self._step_cache[sig] = engine.make_train_step(
                self.cfg, self.render_cfg, self.train_scene, builder,
                tx_nerf=self.tx_nerf,
                tx_pose=getattr(self, "tx_pose", None),
                pose_cfg=getattr(self, "pose_cfg", None),
                pose_constants=self.pose_constants,
                optimize_poses=optimize_poses,
                update_nerf=update_nerf,
                donate=bool(self.cfg.tpu.get("donate_state", True)),
            )
        return self._step_cache[sig]

    # ------------------------------------------------------------------- run

    def run(self, load_latest: bool = True):
        cfg = self.cfg
        if cfg.get("resume_snapshot"):
            # weights-only warm start from another run (base.py:341-346):
            # model parameters are taken, optimizers/iteration start fresh
            self.load_weights_only(cfg.resume_snapshot)
        if load_latest:
            self.load_snapshot("latest")
        self.logger.info(f"training from iteration {self.iteration} to {cfg.max_iter}")
        t_start = time.time()
        t_last_log = time.time()
        it_last_log = self.iteration
        it = self.iteration
        # optional device profiling window (SURVEY.md 5.1 TPU equivalent)
        profile_at = cfg.tpu.get("profile_at_iter")
        profile_n = int(cfg.tpu.get("profile_n_steps", 5) or 5)
        while it < cfg.max_iter:
            if profile_at is not None and it == profile_at:
                jax.profiler.start_trace(os.path.join(self.workspace, "profile"))
            if profile_at is not None and it == profile_at + profile_n:
                jax.block_until_ready(self.state.iteration)
                jax.profiler.stop_trace()
                self.logger.info(f"wrote profiler trace to {self.workspace}/profile")
            self.on_iteration_start(it)
            step = self.get_step(it)
            self.timer.add_prepare_time()
            self.state, stats = step(self.state)
            it += 1
            if it % cfg.log_steps == 0 or it == 1:
                stats_np = {k: float(np.asarray(v)) for k, v in stats.items()
                            if np.asarray(v).ndim == 0}
                stats_np["lr"] = float(self.lr_fn(it))
                stats_np.update(self.make_results_dict_low_freq())
                self.timer.add_process_time()
                self.summary.update_from_dict(stats_np)
                self.writer.write_event("train", stats_np, it)
                now = time.time()
                its = (it - it_last_log) / max(now - t_last_log, 1e-9)
                t_last_log, it_last_log = now, it
                self.logger.info(
                    f"iter {it}/{cfg.max_iter} "
                    + " ".join(f"{k}={v:.4g}" for k, v in sorted(stats_np.items())
                               if k in ("all", "render", "corres", "depth_cons", "mse",
                                         "lr", "error_R", "error_t", "psnr"))
                    + f" it/s={its:.1f}"
                )
                self.timer.reset()
            if it % cfg.vis_steps == 0:
                self.visualize_train_view(it)
            if it % cfg.val_steps == 0:
                self.record_pose_history(it)
                self.validate(it)
            if it % cfg.snapshot_steps == 0:
                self.save_snapshot()
        self.logger.info(f"training done in {time.time() - t_start:.1f}s")
        self.save_snapshot()
        if cfg.get("do_eval", True):
            self.validate(it)

    def on_iteration_start(self, iteration: int):
        pass

    def record_pose_history(self, iteration: int):
        """Append the current pose estimates to workspace/pose_history.npz.

        Each entry is (iteration, N x 3 x 4 w2c) — a few KB — so
        generate_videos_pose can animate the whole optimization trajectory.
        The reference walks surviving checkpoints instead
        (joint_pose_nerf_trainer.py:664-705), which its keep-2 GC reduces to
        ~2 frames; storing poses directly is strictly more informative.
        Only pose-optimizing trainers record (no-op otherwise)."""
        if not hasattr(self, "pose_cfg"):
            return
        path = os.path.join(self.workspace, "pose_history.npz")
        iters, poses = [], []
        if os.path.exists(path):
            try:
                with np.load(path) as z:
                    iters, poses = list(z["iters"]), list(z["poses"])
            except Exception:
                iters, poses = [], []
        if iters and int(iters[-1]) == int(iteration):
            return
        iters.append(int(iteration))
        poses.append(np.asarray(self.current_poses_w2c(), dtype=np.float32))
        np.savez(path, iters=np.asarray(iters), poses=np.stack(poses))

    def make_results_dict_low_freq(self) -> Dict[str, float]:
        return {}

    def visualize_train_view(self, iteration: int):
        """Render a random train view; log GT/render/error/depth panel
        (reference base.py:600-726 septych)."""
        from sparf_tpu.utils import vis

        H, W = self.train_scene_np["image"].shape[-2:]
        idx = int(np.random.randint(self.n_train_views))
        pose = self.current_poses_w2c()[idx : idx + 1]
        progress = jnp.asarray(
            min(1.0, int(np.asarray(self.state.iteration_nerf)) / self.cfg.max_iter)
            if self.cfg.get("barf_c2f") is not None else 1.0
        )
        out = renderer_mod.render_image_chunked(
            self.state.nerf_params, self.render_cfg, pose,
            self.train_scene["intr"][idx : idx + 1], H, W,
            renderer_mod.render_depth_range(self.cfg, self.train_scene), progress,
            fine_enabled=self.fine_enabled_at(iteration),
            chunk=self.cfg.nerf.rand_rays, impl=self.mlp_impl,
        )
        fine_row = None
        if "rgb_fine" in out:
            fine_row = dict(
                pred_rgb=np.asarray(out["rgb_fine"]).reshape(H, W, 3),
                pred_depth=np.asarray(out["depth_fine"]).reshape(H, W),
                opacity=np.asarray(out["opacity_fine"]).reshape(H, W),
                rgb_var=np.asarray(out["rgb_var_fine"]).reshape(H, W, -1).mean(-1)
                if "rgb_var_fine" in out else None,
                depth_var=np.asarray(out["depth_var_fine"]).reshape(H, W)
                if "depth_var_fine" in out else None,
            )
        panel = vis.render_panel(
            gt_rgb=self.train_scene_np["image"][idx].transpose(1, 2, 0),
            pred_rgb=np.asarray(out["rgb"]).reshape(H, W, 3),
            pred_depth=np.asarray(out["depth"]).reshape(H, W),
            opacity=np.asarray(out["opacity"]).reshape(H, W),
            rgb_var=np.asarray(out["rgb_var"]).reshape(H, W, -1).mean(-1)
            if "rgb_var" in out else None,
            depth_var=np.asarray(out["depth_var"]).reshape(H, W)
            if "depth_var" in out else None,
            gt_depth=self.train_scene_np.get("depth_gt", [None] * (idx + 1))[idx]
            if "depth_gt" in self.train_scene_np else None,
            fine_row=fine_row,
        )
        self.writer.write_image("train", {f"render_view{idx}": panel}, iteration)
        if hasattr(self, "pose_cfg"):
            frusta = vis.plot_camera_frusta(
                [("optimized", np.asarray(self.current_poses_w2c()), "tab:red"),
                 ("GT", self.train_scene_np["pose"], "tab:blue")],
                title=f"iter {iteration}",
            )
            self.writer.write_image("train", {"poses": frusta}, iteration)

    # ------------------------------------------------------------ validation

    def current_poses_w2c(self) -> Array:
        """Current w2c estimates for the train views (GT here)."""
        return self.train_scene["pose"]

    def val_pose_and_scale(self, idx: int) -> Tuple[Array, float]:
        """w2c pose used to render val image idx + depth scaling factor."""
        return self.val_scene["pose"][idx : idx + 1], 1.0

    def render_full_val_image(self, idx: int, fine_enabled: bool) -> Dict[str, Array]:
        pose, _ = self.val_pose_and_scale(idx)
        H, W = self.val_scene_np["image"].shape[-2:]
        progress = jnp.asarray(
            min(1.0, int(np.asarray(self.state.iteration_nerf)) / self.cfg.max_iter)
            if self.cfg.get("barf_c2f") is not None else 1.0
        )
        return renderer_mod.render_image_chunked(
            self.state.nerf_params, self.render_cfg, pose,
            self.val_scene["intr"][idx : idx + 1], H, W,
            renderer_mod.render_depth_range(self.cfg, self.val_scene), progress,
            fine_enabled=fine_enabled, chunk=self.cfg.nerf.rand_rays,
            impl=self.mlp_impl,
        )

    def get_lpips(self):
        if self._lpips is None:
            from sparf_tpu.training.lpips_jax import LPIPS

            self._lpips = LPIPS()
        return self._lpips

    def validate(self, iteration: int, max_views: Optional[int] = None) -> Dict[str, float]:
        """Full-image renders over the val split with the full metric set
        (PSNR/SSIM/LPIPS + masked + depth, coarse and _fine) and best-model
        tracking by -PSNR of the finest head (base.py:450-504)."""
        H, W = self.val_scene_np["image"].shape[-2:]
        n = self.val_scene_np["image"].shape[0]
        if self.debug:
            max_views = min(n, 2)
        n = min(n, max_views) if max_views else n
        fine_enabled = self.fine_enabled_at(iteration)
        lpips = self.get_lpips()
        results = []
        for idx in range(n):
            out = self.render_full_val_image(idx, fine_enabled)
            gt = self.val_scene["image"][idx : idx + 1]
            fg_mask = (self.val_scene["fg_mask"][idx : idx + 1]
                       if "fg_mask" in self.val_scene else None)
            depth_gt = (self.val_scene["depth_gt"][idx : idx + 1].reshape(1, -1, 1)
                        if "depth_gt" in self.val_scene else None)
            valid_depth = (self.val_scene["valid_depth_gt"][idx : idx + 1].reshape(1, -1)
                           if "valid_depth_gt" in self.val_scene else None)

            def metrics_of(key, dkey, suffix):
                pred = out[key].reshape(1, H, W, 3).transpose(0, 3, 1, 2)
                return metrics_mod.compute_metrics(
                    pred, gt, pred_depth=out[dkey].reshape(1, -1, 1),
                    depth_gt=depth_gt, valid_depth_gt=valid_depth,
                    fg_mask=fg_mask, lpips_fn=lpips, suffix=suffix,
                )

            res = metrics_of("rgb", "depth", "")
            if "rgb_fine" in out:
                res.update(metrics_of("rgb_fine", "depth_fine", "_fine"))
            results.append(res)
        mean = {
            k: float(np.mean([r[k] for r in results]))
            for k in results[0]
            if not np.isnan(np.mean([r[k] for r in results]))
        } if results else {}
        self.writer.write_event("val", mean, iteration)
        self.logger.info(f"validation @ {iteration}: " + " ".join(f"{k}={v:.3f}" for k, v in mean.items()))
        val_score = -mean.get("psnr_fine", mean.get("psnr", 0.0))
        if val_score < self.best_val:
            self.best_val = val_score
            self.epoch_of_best_val = iteration
            self.save_snapshot(is_best=True)
        return mean

    # ------------------------------------------------------------ evaluation

    def evaluate_full(self, save_ind_files: bool = False, out_dir: Optional[str] = None,
                      plot: bool = False) -> Dict:
        """Test-set evaluation incl. depth metrics and masked metrics; JSON dump
        (nerf_trainer.py:342-485). `plot` saves a qualitative panel per test
        image (reference eval.py --plot / base.py plotting path)."""
        cfg = self.cfg
        test_scene_np = create_dataset(cfg, "test")
        test_scene = scene_to_device(test_scene_np)
        H, W = test_scene_np["image"].shape[-2:]
        fine_enabled = self.fine_enabled_at(self.iteration)
        lpips = self.get_lpips()
        per_image = []
        # PE progress travels with the checkpoint (reference keeps it as a
        # checkpointed parameter, frequency_nerf.py:79-85)
        progress = jnp.asarray(
            min(1.0, int(np.asarray(self.state.iteration_nerf)) / cfg.max_iter)
            if cfg.get("barf_c2f") is not None else 1.0
        )
        for idx in range(test_scene_np["image"].shape[0]):
            pose, depth_scale = self.test_pose_and_scale(test_scene, idx)
            out = renderer_mod.render_image_chunked(
                self.state.nerf_params, self.render_cfg, pose,
                test_scene["intr"][idx : idx + 1], H, W,
                renderer_mod.render_depth_range(cfg, test_scene), progress,
                fine_enabled=fine_enabled, chunk=cfg.nerf.rand_rays, impl=self.mlp_impl,
            )
            key = "rgb_fine" if "rgb_fine" in out else "rgb"
            dkey = "depth_fine" if "depth_fine" in out else "depth"
            pred_rgb = out[key].reshape(1, H, W, 3).transpose(0, 3, 1, 2)
            gt_rgb = test_scene["image"][idx : idx + 1]
            res = metrics_mod.compute_metrics(
                pred_rgb, gt_rgb,
                pred_depth=out[dkey].reshape(1, -1, 1),
                depth_gt=test_scene["depth_gt"][idx : idx + 1].reshape(1, -1, 1)
                if "depth_gt" in test_scene else None,
                valid_depth_gt=test_scene["valid_depth_gt"][idx : idx + 1].reshape(1, -1)
                if "valid_depth_gt" in test_scene else None,
                fg_mask=test_scene["fg_mask"][idx : idx + 1] if "fg_mask" in test_scene else None,
                lpips_fn=lpips,
                scaling_factor_for_pred_depth=depth_scale,
            )
            refine = getattr(self, "_last_refine", None)
            if refine is not None:
                # test-time pose-refinement efficacy, per view (reference
                # dual-eval w/ vs w/o test-optim, eval.py:81-106): how far the
                # refinement moved the pose + the PSNR it bought vs rendering
                # at the unrefined (backtracked-GT) pose
                res["refine_rot_deg"] = refine["rot_deg"]
                res["refine_trans"] = refine["trans"]
                out_pre = renderer_mod.render_image_chunked(
                    self.state.nerf_params, self.render_cfg, refine["pose_pre"],
                    test_scene["intr"][idx : idx + 1], H, W,
                    renderer_mod.render_depth_range(cfg, test_scene), progress,
                    fine_enabled=fine_enabled, chunk=cfg.nerf.rand_rays,
                    impl=self.mlp_impl,
                )
                pre_rgb = out_pre[key].reshape(1, H, W, 3).transpose(0, 3, 1, 2)
                mse_pre = float(jnp.mean((pre_rgb - gt_rgb) ** 2))
                res["psnr_no_refine"] = -10.0 * np.log10(max(mse_pre, 1e-12))
                res["refine_psnr_delta"] = res["psnr"] - res["psnr_no_refine"]
            per_image.append(res)
            if plot:
                import imageio.v2 as imageio

                from sparf_tpu.utils import vis

                pdir = os.path.join(out_dir or self.workspace, "plots")
                os.makedirs(pdir, exist_ok=True)
                panel = vis.render_panel(
                    gt_rgb=np.asarray(gt_rgb[0]).transpose(1, 2, 0),
                    pred_rgb=np.asarray(pred_rgb[0]).transpose(1, 2, 0),
                    pred_depth=np.asarray(out[dkey]).reshape(H, W),
                    opacity=np.asarray(
                        out["opacity_fine" if "opacity_fine" in out else "opacity"]
                    ).reshape(H, W),
                    gt_depth=np.asarray(test_scene_np["depth_gt"][idx])
                    if "depth_gt" in test_scene_np else None,
                )
                imageio.imwrite(os.path.join(pdir, f"eval_{idx:03d}.png"),
                                (np.clip(panel, 0, 1) * 255).astype(np.uint8))
            if save_ind_files:
                # per-image renders (reference save_ind_files, base.py:506-597)
                import imageio.v2 as imageio

                from sparf_tpu.utils import vis

                rdir = os.path.join(out_dir or self.workspace, "renders")
                os.makedirs(rdir, exist_ok=True)
                name = test_scene_np.get("rgb_path", [f"{i:03d}" for i in range(999)])[idx]
                stem = os.path.splitext(os.path.basename(str(name)))[0]
                pred_hwc = np.asarray(pred_rgb[0]).transpose(1, 2, 0)
                imageio.imwrite(os.path.join(rdir, f"{stem}_pred.png"),
                                (np.clip(pred_hwc, 0, 1) * 255).astype(np.uint8))
                depth_img = vis.colorize(np.asarray(out[dkey]).reshape(H, W))
                imageio.imwrite(os.path.join(rdir, f"{stem}_depth.png"),
                                (depth_img * 255).astype(np.uint8))
        mean = {
            k: float(np.mean([r[k] for r in per_image]))
            for k in per_image[0]
            if not np.isnan(np.mean([r[k] for r in per_image]))
        } if per_image else {}
        mean["iteration"] = self.iteration
        mean["lpips_tag"] = lpips.weight_tag
        result = {"mean": mean, "per_image": per_image}
        out_dir = out_dir or self.workspace
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, f"{cfg.get('expname', 'eval')}.json"), "w") as f:
            json.dump(result, f, indent=2, default=float)
        self.logger.info("eval: " + " ".join(f"{k}={v:.4g}" for k, v in mean.items()
                                             if isinstance(v, float)))
        return result

    def test_pose_and_scale(self, test_scene, idx: int) -> Tuple[Array, float]:
        return test_scene["pose"][idx : idx + 1], 1.0

    # ---------------------------------------------------------- checkpointing

    def save_snapshot(self, is_best: bool = False):
        path = checkpointing.save_snapshot(
            self.workspace, self.state, self.best_val, self.epoch_of_best_val, is_best=is_best
        )
        self.logger.info(f"saved snapshot {os.path.basename(path)}")

    def load_weights_only(self, snapshot_path: str) -> bool:
        """Partial warm start: copy nerf/pose params from a snapshot, keep
        fresh optimizers and iteration 0 (reference resume_snapshot semantics,
        base.py:341-346 incl. PE-progress backfill via iteration_nerf)."""
        workspace, which = os.path.split(os.path.abspath(snapshot_path))
        loaded = checkpointing.load_snapshot(workspace, self.state, which)
        if loaded is None:
            self.logger.warning(f"resume_snapshot: nothing at {snapshot_path}")
            return False
        other, meta = loaded
        self.state = self.state.replace(
            nerf_params=other.nerf_params,
            pose_params=other.pose_params,
            # PE progress considered converged for old checkpoints
            iteration_nerf=jnp.asarray(self.cfg.max_iter, jnp.int32)
            if self.cfg.get("barf_c2f") is None else other.iteration_nerf,
        )
        self.logger.info(f"warm-started weights from {snapshot_path} (iter {meta['iteration']})")
        return True

    def load_snapshot(self, which: str = "latest") -> bool:
        loaded = checkpointing.load_snapshot(self.workspace, self.state, which)
        if loaded is None:
            return False
        self.state, meta = loaded
        self.best_val = meta["best_val"]
        self.epoch_of_best_val = meta["epoch_of_best_val"]
        self.logger.info(f"resumed from snapshot at iteration {meta['iteration']}")
        return True
