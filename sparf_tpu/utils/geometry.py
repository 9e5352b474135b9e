"""Batched projective geometry (pure JAX).

Parity with reference source/utils/geometry/batched_geometry_utils.py:
back-projection by depth, cross-image reprojection, depth-map sampling with
bilinear/nearest fallback. All functions are jit/vmap safe and shape-static;
"invalid" is expressed through boolean masks, never NaN control flow.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from sparf_tpu.utils.camera import f32_matmuls

Array = jax.Array


def to_homogeneous(points: Array) -> Array:
    return jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)


def from_homogeneous(points: Array) -> Array:
    return points[..., :-1] / (points[..., -1:] + 1e-6)


@f32_matmuls
def batch_backproject_to_3d(kpi: Array, di: Array, Ki: Array, T_itoj: Array) -> Array:
    """Backproject pixels of image i by depth, express in frame j.

    Args:
      kpi: (B,N,2) pixel coords; di: (B,N) depths; Ki: (B,3,3);
      T_itoj: (B,4,4) rigid transform i->j (use identity-block 4x4).
    Returns: (B,N,3) 3D points in frame j.
    (reference batched_geometry_utils.py:225-244)
    """
    pts3d_i = to_homogeneous(kpi) @ jnp.swapaxes(jnp.linalg.inv(Ki), -1, -2)
    pts3d_i = pts3d_i * di[..., None]
    return from_homogeneous(to_homogeneous(pts3d_i) @ jnp.swapaxes(T_itoj, -1, -2))


@f32_matmuls
def batch_project(kpi_3d: Array, T_itoj: Array, Kj: Array) -> Array:
    """Project 3D points in frame i into image j. (B,N,3)->(B,N,2)."""
    kpi_3d_j = from_homogeneous(to_homogeneous(kpi_3d) @ jnp.swapaxes(T_itoj, -1, -2))
    return from_homogeneous(kpi_3d_j @ jnp.swapaxes(Kj, -1, -2))


@f32_matmuls
def batch_project_to_other_img(
    kpi: Array,
    di: Array,
    Ki: Array,
    Kj: Array,
    T_itoj: Array,
    return_depth: bool = False,
):
    """Project pixels of image i (with depth) into image j.

    Args: kpi (B,N,2), di (B,N), Ki/Kj (B,3,3), T_itoj (B,4,4).
    Returns kpi_j (B,N,2) [, di_j (B,N) depth in frame j].
    (reference batched_geometry_utils.py:199-222)
    """
    kpi_3d_i = to_homogeneous(kpi) @ jnp.swapaxes(jnp.linalg.inv(Ki), -1, -2)
    kpi_3d_i = kpi_3d_i * di[..., None]
    kpi_3d_j = from_homogeneous(to_homogeneous(kpi_3d_i) @ jnp.swapaxes(T_itoj, -1, -2))
    kpi_j = from_homogeneous(kpi_3d_j @ jnp.swapaxes(Kj, -1, -2))
    if return_depth:
        return kpi_j, kpi_3d_j[..., -1]
    return kpi_j


def sample_depth_at(pts: Array, depth: Array) -> Tuple[Array, Array]:
    """Sample a depth map at float pixel coords with validity handling.

    Bilinear interpolation treating depth<=0 as holes; where any bilinear
    neighbour is a hole, fall back to nearest-neighbour (reference
    batched_geometry_utils.py:128-154, align_corners=True semantics:
    grid point k maps to pixel index k directly when normalizing by (size-1)).

    Args:
      pts: (B,N,2) xy pixel coords (integer-indexed convention, like the
        reference which normalizes by (W-1, H-1)).
      depth: (B,H,W).
    Returns: (interp (B,N), valid (B,N)).
    """
    B, H, W = depth.shape
    x = pts[..., 0]
    y = pts[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1
    y1 = y0 + 1

    def gather(yi, xi):
        yi_c = jnp.clip(yi.astype(jnp.int32), 0, H - 1)
        xi_c = jnp.clip(xi.astype(jnp.int32), 0, W - 1)
        d = jax.vmap(lambda dm, yy, xx: dm[yy, xx])(depth, yi_c, xi_c)
        inb = (yi >= 0) & (yi <= H - 1) & (xi >= 0) & (xi <= W - 1)
        return d, inb & (d > 0)

    d00, v00 = gather(y0, x0)
    d01, v01 = gather(y0, x1)
    d10, v10 = gather(y1, x0)
    d11, v11 = gather(y1, x1)

    wx = x - x0
    wy = y - y0
    w00 = (1 - wy) * (1 - wx)
    w01 = (1 - wy) * wx
    w10 = wy * (1 - wx)
    w11 = wy * wx
    interp_lin = d00 * w00 + d01 * w01 + d10 * w10 + d11 * w11
    lin_valid = v00 & v01 & v10 & v11

    # nearest fallback
    xn = jnp.round(x)
    yn = jnp.round(y)
    d_nn, nn_valid = gather(yn, xn)

    interp = jnp.where(lin_valid, interp_lin, d_nn)
    valid = lin_valid | nn_valid
    return jnp.where(valid, interp, 0.0), valid


@f32_matmuls
def batch_project_to_other_img_and_check_depth(
    kpi: Array,
    di: Array,
    depthj: Array,
    Ki: Array,
    Kj: Array,
    T_itoj: Array,
    validi: Array,
    rth: float = 0.1,
    return_repro_error: bool = False,
):
    """Project pixels i->j and keep those whose projected depth agrees with
    image j's depth map within relative threshold rth.
    (reference batched_geometry_utils.py:156-197)
    """
    kpi_j, di_j = batch_project_to_other_img(kpi, di, Ki, Kj, T_itoj, return_depth=True)
    dj, validj = sample_depth_at(kpi_j, depthj)
    repro_error = jnp.abs(di_j - dj) / jnp.maximum(dj, 1e-8)
    consistent = repro_error < rth
    visible = validi & consistent & validj
    if return_repro_error:
        return kpi_j, visible, repro_error
    return kpi_j, visible


def pose_to_T4x4(pose_w2c: Array) -> Array:
    """(...,3,4) -> (...,4,4)."""
    bottom = jnp.zeros((*pose_w2c.shape[:-2], 1, 4), pose_w2c.dtype)
    bottom = bottom.at[..., 0, 3].set(1.0)
    return jnp.concatenate([pose_w2c, bottom], axis=-2)


@f32_matmuls
def relative_transform_i_to_j(pose_i_w2c: Array, pose_j_w2c: Array) -> Array:
    """T_i->j = P_j @ P_i^{-1} as 4x4 (reference corres_loss.py:181-190)."""
    from sparf_tpu.utils import camera

    rel = camera.pose_compose_pair(camera.pose_invert(pose_i_w2c), pose_j_w2c)
    return pose_to_T4x4(rel)
