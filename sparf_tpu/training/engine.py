"""Training engine: TrainState, optimizers, jitted train-step factory.

TPU-native redesign of the reference's BaseTrainer/IterBasedTrainer
(base_trainer.py:62-466, iter_based_trainer.py:50-445): instead of a python
object mutating .grad buffers, the whole iteration is ONE jitted function
  state, stats = step(state)
over a TrainState pytree. Schedules the reference implements as stateful
LR schedulers / warmups / weight-decays become closed-form functions of the
iteration counter (the reference itself fast-forwards LR in closed form on
resume, base_trainer.py:336-360 — we just make that the only representation).

Host-side control (python) only at *static* boundaries: stage switches
(joint->nerf-only), precrop window, fine-sampling start — each selects a
different compiled step, swapped at most a handful of times per run.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from sparf_tpu.models import pose_params as pose_mod
from sparf_tpu.models import renderer as renderer_mod
from sparf_tpu.models.renderer import RenderConfig
from sparf_tpu.training.losses import base as loss_base
from sparf_tpu.training.losses import photometric as photo_mod

Array = jax.Array


class TrainState(struct.PyTreeNode):
    """All mutable training state as one pytree (jit/donate-friendly)."""

    nerf_params: Any
    pose_params: Any            # {} when poses are not optimized
    opt_state_nerf: Any
    opt_state_pose: Any
    iteration: Array            # int32 scalar — global step
    iteration_nerf: Array       # int32 scalar — NeRF-update counter (PE progress)
    key: Array                  # PRNG key
    nan_count: Array            # int32 — skipped updates due to non-finite grads

    @property
    def progress(self) -> Array:
        return self.iteration_nerf.astype(jnp.float32)


def exponential_lr(lr_init: float, lr_end: Optional[float], max_iter: int) -> Callable:
    """lr(t) = lr_init * gamma^t with gamma = (lr_end/lr_init)^(1/max_iter)
    (reference nerf_trainer.py:196-203)."""
    if not lr_end:
        return lambda step: lr_init
    gamma = (lr_end / lr_init) ** (1.0 / max_iter)
    return lambda step: lr_init * gamma**step


def pose_lr_schedule(
    lr_pose: float, lr_pose_end: Optional[float], max_iter: int, warmup_pose: Optional[int]
) -> Callable:
    """Exponential decay x linear warmup (joint_pose_nerf_trainer.py:494-534)."""
    base = exponential_lr(lr_pose, lr_pose_end, max_iter)
    if not warmup_pose:
        return base
    return lambda step: base(step) * jnp.minimum(1.0, step / warmup_pose)


def make_optimizer(
    lr_fn: Callable, clip_norm: Optional[float], grad_acc_steps: int = 1
) -> optax.GradientTransformation:
    chain = []
    if clip_norm:
        chain.append(optax.clip_by_global_norm(clip_norm))
    chain.append(optax.scale_by_adam(b1=0.9, b2=0.999))
    chain.append(optax.scale_by_schedule(lambda step: -lr_fn(step)))
    tx = optax.chain(*chain)
    if grad_acc_steps and grad_acc_steps > 1:
        # gradient accumulation (reference grad_acc_steps, base_trainer.py:395-403)
        tx = optax.MultiSteps(tx, every_k_schedule=grad_acc_steps)
    return tx


def tree_all_finite(tree) -> Array:
    leaves = jax.tree_util.tree_leaves(tree)
    ok = jnp.asarray(True)
    for leaf in leaves:
        ok = ok & jnp.all(jnp.isfinite(leaf))
    return ok


def apply_updates_if_finite(params, updates, is_finite: Array):
    """Skip the whole update when any grad is non-finite
    (reference check_invalid_gradients, base_trainer.py:411-426)."""
    zero = jax.tree_util.tree_map(jnp.zeros_like, updates)
    safe = jax.tree_util.tree_map(
        lambda u, z: jnp.where(is_finite, u, z), updates, zero
    )
    return optax.apply_updates(params, safe)


def select_tree(pred: Array, new, old):
    """Elementwise where() over a whole pytree (same structure/shapes)."""
    return jax.tree_util.tree_map(lambda n, o: jnp.where(pred, n, o), new, old)


# ---------------------------------------------------------------------------
# step factory
# ---------------------------------------------------------------------------

# LossBuilder signature:
#   (nerf_params, poses_w2c, key, iteration, state) -> (loss_dict, stats_dict)
LossBuilder = Callable[..., Tuple[Dict[str, Array], Dict[str, Array]]]


def default_photometric_loss_builder(cfg, render_cfg: RenderConfig, scene, sampler, *,
                                     fine_enabled: bool, sample_in_center: bool,
                                     impl: str = "xla") -> LossBuilder:
    """Photometric(+mask+regu) loss over freshly sampled rays — the base
    train_step of nerf_trainer.py:207-280."""
    H, W = scene["image"].shape[-2:]
    start_iter_photo = float(cfg.start_iter.get("photometric", 0) or 0)
    if cfg.start_ratio.get("photometric") is not None:
        start_iter_photo = max(start_iter_photo, float(cfg.start_ratio.photometric) * cfg.max_iter)

    def builder(nerf_params, poses_w2c, key, iteration, progress):
        from sparf_tpu.parallel import mesh as mesh_mod

        k_sample, k_render = jax.random.split(key)
        ray_idx = sampler(k_sample, cfg.nerf.rand_rays, sample_in_center=sample_in_center)
        ray_idx = mesh_mod.shard_rays(ray_idx, axis=ray_idx.ndim - 1)
        pix_x = (ray_idx % W).astype(jnp.float32) + 0.5
        pix_y = (ray_idx // W).astype(jnp.float32) + 0.5
        pixels = jnp.stack([pix_x, pix_y], axis=-1)

        (out,) = yield [renderer_mod.RayBundle(
            pixels=pixels, pose_w2c=poses_w2c, intr=scene["intr"],
            key=k_render, stratified=True,
        )]
        out = dict(out)
        out["ray_idx"] = ray_idx

        image_at_rays = photo_mod.gather_pixels_at_rays(scene["image"], ray_idx)
        fg_at_rays = None
        if cfg.loss_weight.get("fg_mask") is not None and "fg_mask" in scene:
            fg_at_rays = photo_mod.gather_mask_at_rays(scene["fg_mask"], ray_idx)

        gate = loss_base.iteration_gate(iteration, start_iter_photo)
        loss_dict = photo_mod.photometric_and_regu_loss(
            out, image_at_rays,
            fg_mask_at_rays=fg_at_rays,
            huber_photometric=bool(cfg.huber_loss_for_photometric),
            loss_weight=cfg.loss_weight,
            depth_regu_patch_size=int(cfg.get("depth_regu_patch_size", 2)),
            gate=gate,
        )
        B = image_at_rays.shape[0]
        stats = {
            "mse": jnp.mean((out["rgb"].reshape(B, -1, 3) - image_at_rays) ** 2),
            "avg_pred_depth": jnp.mean(out["depth"]),
        }
        if "rgb_fine" in out:
            stats["mse_fine"] = jnp.mean((out["rgb_fine"].reshape(B, -1, 3) - image_at_rays) ** 2)
        return loss_dict, stats

    return builder


def make_train_step(
    cfg,
    render_cfg: RenderConfig,
    scene,
    loss_builder: LossBuilder,
    tx_nerf: optax.GradientTransformation,
    tx_pose: Optional[optax.GradientTransformation] = None,
    pose_cfg: Optional[pose_mod.PoseConfig] = None,
    pose_constants: Optional[Dict] = None,
    optimize_poses: bool = False,
    update_nerf: bool = True,
    donate: bool = True,
) -> Callable[[TrainState], Tuple[TrainState, Dict[str, Array]]]:
    """Compile one full training iteration into a single XLA program.

    optimize_poses=False freezes the pose branch (GT-pose training or the
    frozen-pose stage of the joint schedule).
    """
    max_iter = float(cfg.max_iter)
    apply_c2f = cfg.get("barf_c2f") is not None and cfg.get("apply_cf_pe", True)
    # optional large-gradient step skipping (iter_based_trainer.py:133-163)
    skip_large = cfg.get("skip_large_gradients")

    def get_poses(pose_params):
        if pose_cfg is not None:
            return pose_mod.get_w2c_poses(pose_cfg, pose_params, pose_constants)
        return scene["pose"]

    def loss_fn(trainable, key, iteration, progress):
        nerf_params, pose_params = trainable
        poses_w2c = get_poses(pose_params)
        if not optimize_poses:
            poses_w2c = jax.lax.stop_gradient(poses_w2c)
        loss_dict, stats = loss_builder(nerf_params, poses_w2c, key, iteration, progress)
        if cfg.loss_weight.get("equalize_losses"):
            summed = loss_base.summarize_loss_w_equal_weights(loss_dict, cfg.loss_weight)
        else:
            summed = loss_base.summarize_loss_w_predefined_weights(
                loss_dict, cfg.loss_weight,
                parametrization=cfg.loss_weight.get("parametrization", "exp"),
            )
        return summed["all"], (summed, stats)

    def step(state: TrainState) -> Tuple[TrainState, Dict[str, Array]]:
        key, key_loss = jax.random.split(state.key)
        iteration = state.iteration.astype(jnp.float32)
        progress = (
            state.iteration_nerf.astype(jnp.float32) / max_iter if apply_c2f else jnp.asarray(1.0)
        )

        grads, (loss_dict, stats) = jax.grad(loss_fn, has_aux=True)(
            (state.nerf_params, state.pose_params), key_loss, iteration, progress
        )
        g_nerf, g_pose = grads

        finite = tree_all_finite(grads)
        if skip_large:
            finite = finite & (optax.global_norm(g_nerf) <= float(skip_large))

        new_nerf = state.nerf_params
        new_opt_nerf = state.opt_state_nerf
        if update_nerf:
            upd, opt_nerf_cand = tx_nerf.update(g_nerf, state.opt_state_nerf, state.nerf_params)
            new_nerf = apply_updates_if_finite(state.nerf_params, upd, finite)
            new_opt_nerf = select_tree(finite, opt_nerf_cand, state.opt_state_nerf)

        new_pose = state.pose_params
        new_opt_pose = state.opt_state_pose
        if optimize_poses and tx_pose is not None:
            upd_p, opt_pose_cand = tx_pose.update(g_pose, state.opt_state_pose, state.pose_params)
            new_pose = apply_updates_if_finite(state.pose_params, upd_p, finite)
            new_opt_pose = select_tree(finite, opt_pose_cand, state.opt_state_pose)

        stats = dict(stats)
        stats.update({k: v for k, v in loss_dict.items()})
        stats["grad_norm_nerf"] = optax.global_norm(g_nerf)
        if optimize_poses:
            stats["grad_norm_pose"] = optax.global_norm(g_pose)
        if cfg.get("print_gradients"):
            # reference print_gradients: max-abs + total norm every step
            # (iter_based_trainer.py:152-163); lands in the logged stats line
            leaves = jax.tree_util.tree_leaves(g_nerf)
            if optimize_poses:
                leaves = leaves + jax.tree_util.tree_leaves(g_pose)
            stats["grad_max"] = jnp.max(
                jnp.stack([jnp.max(jnp.abs(l)) for l in leaves])
            )

        new_state = state.replace(
            nerf_params=new_nerf,
            pose_params=new_pose,
            opt_state_nerf=new_opt_nerf,
            opt_state_pose=new_opt_pose,
            iteration=state.iteration + 1,
            iteration_nerf=state.iteration_nerf + (1 if update_nerf else 0),
            key=key,
            nan_count=state.nan_count + (1 - finite.astype(jnp.int32)),
        )
        return new_state, stats

    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def init_train_state(
    key: Array,
    render_cfg: RenderConfig,
    tx_nerf: optax.GradientTransformation,
    pose_cfg: Optional[pose_mod.PoseConfig] = None,
    initial_poses_w2c=None,
    tx_pose: Optional[optax.GradientTransformation] = None,
) -> Tuple[TrainState, Optional[Dict]]:
    """Returns (state, pose_constants)."""
    k_nerf, k_state = jax.random.split(key)
    nerf_params = renderer_mod.init_graph_params(k_nerf, render_cfg)
    pose_parameters: Dict = {}
    pose_constants = None
    if pose_cfg is not None:
        pose_parameters, pose_constants = pose_mod.init_pose_params(pose_cfg, initial_poses_w2c)
    state = TrainState(
        nerf_params=nerf_params,
        pose_params=pose_parameters,
        opt_state_nerf=tx_nerf.init(nerf_params),
        opt_state_pose=tx_pose.init(pose_parameters) if tx_pose is not None else (),
        iteration=jnp.asarray(0, jnp.int32),
        iteration_nerf=jnp.asarray(0, jnp.int32),
        key=k_state,
        nan_count=jnp.asarray(0, jnp.int32),
    )
    return state, pose_constants
