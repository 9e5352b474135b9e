"""Learnable camera-pose parametrizations (pure-JAX pytrees).

Three interchangeable parametrizations, parity with
reference source/models/poses_models/:
  - 'two_columns' (default): 9D = translation + first two ROWS of R,
    Gram-Schmidt r6d2mat (two_columns.py:23-194, Zhou et al. 6D rotation);
  - 'axis_angle': 6D se(3) correction composed with initial poses
    (axis_rotation.py:24-71, BARF-style);
  - 'quaternion': 4D quat (renormalized) + 3D translation (quaternion.py:31-147).

Design: a pose "module" is (PoseConfig, params pytree, constants pytree).
`get_w2c_poses(cfg, params, constants)` is pure/differentiable; the split of
trainable vs. fixed leaves is expressed by which dict they live in — the
optimizer only sees `params`. Fixed-first-N poses are concatenated from
constants inside the getter (static shapes).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from sparf_tpu.utils import camera

Array = jax.Array


@dataclass(frozen=True)
class PoseConfig:
    parametrization: str = "two_columns"  # 'two_columns' | 'axis_angle' | 'quaternion'
    optimize_c2w: bool = False
    optimize_trans: bool = True
    optimize_rot: bool = True
    optimize_relative_poses: bool = False
    n_first_fixed_poses: int = 0
    nbr_poses: int = 0

    @classmethod
    def from_config(cls, cfg, nbr_poses: int) -> "PoseConfig":
        cam = cfg.camera
        return cls(
            parametrization=cam.get("pose_parametrization", "two_columns"),
            optimize_c2w=bool(cam.get("optimize_c2w", False)),
            optimize_trans=bool(cam.get("optimize_trans", True)),
            optimize_rot=bool(cam.get("optimize_rot", True)),
            optimize_relative_poses=bool(cam.get("optimize_relative_poses", False)),
            n_first_fixed_poses=int(cam.get("n_first_fixed_poses", 0)),
            nbr_poses=nbr_poses,
        )

    @property
    def n_fixed(self) -> int:
        return self.n_first_fixed_poses if self.optimize_relative_poses else 0


def pose_to_d9(pose: Array) -> Array:
    """(N,3,4) -> (N,9): translation + first two rows of R (two_columns.py:23-40)."""
    R = pose[:, :3, :3]
    t = pose[:, :3, -1]
    r6 = R[:, :2, :3].reshape(pose.shape[0], -1)
    return jnp.concatenate([t, r6], axis=-1)


def r6d2mat(d6: Array) -> Array:
    """Zhou et al. 6D -> rotation via Gram-Schmidt; rows b1,b2,b3 (two_columns.py:42-62)."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / (jnp.linalg.norm(a1, axis=-1, keepdims=True) + 1e-12)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = b2 / (jnp.linalg.norm(b2, axis=-1, keepdims=True) + 1e-12)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def init_pose_params(
    cfg: PoseConfig, initial_poses_w2c: Array
) -> Tuple[Dict[str, Array], Dict[str, Array]]:
    """Returns (trainable params, constants).

    constants always holds `initial_poses_w2c` (N,3,4); non-optimized
    embeddings (e.g. fixed translation when optimize_trans=False) also live
    there so the getter stays a pure function of both dicts.
    """
    initial_poses_w2c = jnp.asarray(initial_poses_w2c, jnp.float32)
    constants: Dict[str, Array] = {"initial_poses_w2c": initial_poses_w2c}
    params: Dict[str, Array] = {}
    n_fixed = cfg.n_fixed

    if cfg.parametrization == "axis_angle":
        n_opt = cfg.nbr_poses - n_fixed
        params["se3_embedding"] = jnp.zeros((n_opt, 6), jnp.float32)
        return params, constants

    base = camera.pose_invert(initial_poses_w2c) if cfg.optimize_c2w else initial_poses_w2c
    base_opt = base[n_fixed:]

    if cfg.parametrization == "two_columns":
        embed = pose_to_d9(base_opt)
        if cfg.optimize_rot and cfg.optimize_trans:
            params["pose_embedding"] = embed
        elif cfg.optimize_rot:
            params["rot_embedding"] = embed[:, 3:]
            constants["trans_embedding"] = embed[:, :3]
        elif cfg.optimize_trans:
            params["trans_embedding"] = embed[:, :3]
            constants["rot_embedding"] = embed[:, 3:]
        else:
            raise ValueError("either trans or rot must be optimized")
        return params, constants

    if cfg.parametrization == "quaternion":
        q = camera.R_to_quaternion(base_opt[:, :3, :3])
        t = base_opt[:, :3, -1]
        (params if cfg.optimize_rot else constants)["rot_embedding"] = q
        (params if cfg.optimize_trans else constants)["trans_embedding"] = t
        return params, constants

    raise ValueError(f"unknown pose parametrization {cfg.parametrization}")


def _poses_from_embeddings(cfg: PoseConfig, params: Dict, constants: Dict) -> Array:
    """Decode the optimized (non-fixed) poses in their native frame (w2c or c2w)."""
    if cfg.parametrization == "axis_angle":
        refine = camera.se3_to_SE3(params["se3_embedding"])
        init = constants["initial_poses_w2c"][cfg.n_fixed :]
        return camera.pose_compose([refine, init])

    if cfg.parametrization == "two_columns":
        if cfg.optimize_rot and cfg.optimize_trans:
            t = params["pose_embedding"][:, :3]
            r = params["pose_embedding"][:, 3:]
        else:
            t = (params if cfg.optimize_trans else constants)["trans_embedding"]
            r = (params if cfg.optimize_rot else constants)["rot_embedding"]
        R = r6d2mat(r)
        return jnp.concatenate([R, t[..., None]], axis=-1)

    if cfg.parametrization == "quaternion":
        t = (params if cfg.optimize_trans else constants)["trans_embedding"]
        q = (params if cfg.optimize_rot else constants)["rot_embedding"]
        q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
        R = camera.quaternion_to_R(q)
        return jnp.concatenate([R, t[..., None]], axis=-1)

    raise ValueError(cfg.parametrization)


def get_w2c_poses(cfg: PoseConfig, params: Dict, constants: Dict) -> Array:
    """Current w2c pose estimates (N,3,4); differentiable w.r.t. params."""
    decoded = _poses_from_embeddings(cfg, params, constants)
    init_w2c = constants["initial_poses_w2c"]
    if cfg.parametrization == "axis_angle":
        poses_w2c = decoded  # already composed in w2c
    elif cfg.optimize_c2w:
        poses_w2c = camera.pose_invert(decoded)
    else:
        poses_w2c = decoded
    if cfg.n_fixed > 0:
        poses_w2c = jnp.concatenate([init_w2c[: cfg.n_fixed], poses_w2c], axis=0)
    return poses_w2c


def get_c2w_poses(cfg: PoseConfig, params: Dict, constants: Dict) -> Array:
    return camera.pose_invert(get_w2c_poses(cfg, params, constants))
