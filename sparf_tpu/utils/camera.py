"""Camera poses, Lie-group math, quaternions and ray generation (pure JAX).

Conventions (parity with reference source/utils/camera.py):
  - poses are world-to-camera (w2c) ``[R|t]`` matrices of shape ``(..., 3, 4)``,
    OpenCV axes [right, down, forward]; projection is ``u = K (R x + t)``
    (reference README.md:440).
  - pixel centers sit at integer+0.5 (reference camera.py:347 ``get_center_and_ray``).
  - ``compose([p1, p2, ..., pN])(x) = pN(... p2(p1(x)))`` (reference camera.py:100-115).

Everything here is shape-polymorphic over leading batch dims, differentiable,
and jit-safe (no data-dependent Python control flow).
"""
from __future__ import annotations

import functools
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def f32_matmuls(fn):
    """Force full-f32 matmuls inside `fn`.

    The TPU MXU default is a single bf16 pass; on the tiny 3x3/3x4 pose
    algebra here that rounds operands to 8 mantissa bits and corrupts the
    results at the ~2e-3 level — measured: ``wx @ wx`` inside the exp map
    alone makes rotations non-orthonormal (||RR^T-I|| ~ 2e-3) and moves them
    by up to 1.9 DEGREES, which surfaced as a 0.79->2.17 deg SfM export
    discrepancy (results/sfm_init, round 4). These ops are negligible FLOPs
    next to the MLP, so full precision is free; the MLP/conv compute path
    keeps the bf16 MXU default.
    """

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapped

# ---------------------------------------------------------------------------
# homogeneous helpers
# ---------------------------------------------------------------------------


def to_hom(x: Array) -> Array:
    """Append a 1 to the last dim: (..., K) -> (..., K+1)."""
    return jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)


# ---------------------------------------------------------------------------
# Pose ([R|t], (...,3,4)) operations  (reference camera.py Pose class :67-115)
# ---------------------------------------------------------------------------


def pose_from_rt(R: Optional[Array] = None, t: Optional[Array] = None) -> Array:
    """Construct (...,3,4) pose from R (...,3,3) and/or t (...,3)."""
    assert R is not None or t is not None
    if R is None:
        t = jnp.asarray(t, jnp.float32)
        R = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (*t.shape[:-1], 3, 3))
    elif t is None:
        R = jnp.asarray(R, jnp.float32)
        t = jnp.zeros(R.shape[:-1], jnp.float32)
    else:
        R = jnp.asarray(R, jnp.float32)
        t = jnp.asarray(t, jnp.float32)
        t = jnp.broadcast_to(t, R.shape[:-1])
    return jnp.concatenate([R, t[..., None]], axis=-1)


@f32_matmuls
def pose_invert(pose: Array) -> Array:
    """Invert (...,3,4) rigid pose: R' = R^T, t' = -R^T t."""
    R, t = pose[..., :3], pose[..., 3:]
    R_inv = jnp.swapaxes(R, -1, -2)
    t_inv = -(R_inv @ t)[..., 0]
    return pose_from_rt(R_inv, t_inv)


@f32_matmuls
def pose_compose_pair(pose_a: Array, pose_b: Array) -> Array:
    """pose_new(x) = pose_b(pose_a(x)): R = R_b R_a, t = R_b t_a + t_b."""
    R_a, t_a = pose_a[..., :3], pose_a[..., 3:]
    R_b, t_b = pose_b[..., :3], pose_b[..., 3:]
    R_new = R_b @ R_a
    t_new = (R_b @ t_a + t_b)[..., 0]
    return pose_from_rt(R_new, t_new)


def pose_compose(pose_list: Sequence[Array]) -> Array:
    """compose([p1..pN])(x) = pN(...p1(x)) (first pose applied first)."""
    out = pose_list[0]
    for p in pose_list[1:]:
        out = pose_compose_pair(out, p)
    return out


def pose_to_4x4(pose: Array) -> Array:
    """(...,3,4) -> (...,4,4) homogeneous."""
    bottom = jnp.zeros((*pose.shape[:-2], 1, 4), pose.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([pose, bottom], axis=-2)


@f32_matmuls
def pose_inverse_4x4(mat: Array) -> Array:
    """Invert (...,4,4) rigid transform without matrix inverse (camera.py:40-64)."""
    R, t = mat[..., :3, :3], mat[..., :3, 3:]
    R_inv = jnp.swapaxes(R, -1, -2)
    t_inv = -(R_inv @ t)
    top = jnp.concatenate([R_inv, t_inv], axis=-1)
    return pose_to_4x4(top)


# ---------------------------------------------------------------------------
# world/camera/image transforms (reference camera.py:296-335)
# ---------------------------------------------------------------------------


@f32_matmuls
def world2cam(x_world: Array, pose_w2c: Array) -> Array:
    """(..., N, 3) world points -> camera frame via (...,3,4) w2c pose."""
    return to_hom(x_world) @ jnp.swapaxes(pose_w2c, -1, -2)


@f32_matmuls
def cam2world(x_cam: Array, pose_w2c: Array) -> Array:
    """(..., N, 3) camera points -> world frame via (...,3,4) w2c pose."""
    pose_c2w = pose_invert(pose_w2c)
    return to_hom(x_cam) @ jnp.swapaxes(pose_c2w, -1, -2)


@f32_matmuls
def cam2img(x: Array, intr: Array) -> Array:
    """(..., N, 3) camera points -> homogeneous image coords via K (...,3,3)."""
    return x @ jnp.swapaxes(intr, -1, -2)


@f32_matmuls
def img2cam(x: Array, intr: Array) -> Array:
    """(..., N, 3) homogeneous pixels -> camera coords via K^-1."""
    return x @ jnp.swapaxes(jnp.linalg.inv(intr), -1, -2)


# ---------------------------------------------------------------------------
# Lie algebra so(3)/SO(3), se(3)/SE(3) (reference camera.py Lie class :117-205)
# ---------------------------------------------------------------------------


def skew_symmetric(w: Array) -> Array:
    """(...,3) -> (...,3,3) cross-product matrix."""
    w0, w1, w2 = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(w0)
    return jnp.stack(
        [
            jnp.stack([zeros, -w2, w1], axis=-1),
            jnp.stack([w2, zeros, -w0], axis=-1),
            jnp.stack([-w1, w0, zeros], axis=-1),
        ],
        axis=-2,
    )


def _taylor_poly_sq(x2: Array, coeff_denoms: Sequence[float]) -> Array:
    """sum_i (-1)^i x2^i / denom_i — even polynomial evaluated from x^2.

    Taking x^2 (not x) keeps gradients finite at the identity: it avoids the
    non-differentiable sqrt in ||w|| that the reference hits via w.norm().
    Accurate for |x| <= pi at 10th order.
    """
    out = jnp.zeros_like(x2)
    term = jnp.ones_like(x2)
    for i, denom in enumerate(coeff_denoms):
        out = out + ((-1.0) ** i) * term / denom
        term = term * x2
    return out


def _taylor_poly(x: Array, coeff_denoms: Sequence[float]) -> Array:
    return _taylor_poly_sq(x * x, coeff_denoms)


def _denoms(kind: str, nth: int = 10):
    denoms = []
    acc = 1.0
    for i in range(nth + 1):
        if kind == "A":  # sin(x)/x
            if i > 0:
                acc *= (2 * i) * (2 * i + 1)
        elif kind == "B":  # (1-cos x)/x^2
            acc *= (2 * i + 1) * (2 * i + 2)
        elif kind == "C":  # (x-sin x)/x^3
            acc *= (2 * i + 2) * (2 * i + 3)
        denoms.append(acc)
    return denoms


_DENOMS_A = _denoms("A")
_DENOMS_B = _denoms("B")
_DENOMS_C = _denoms("C")


def taylor_A(x: Array) -> Array:
    """sin(x)/x as a 10th-order even polynomial (smooth at 0)."""
    return _taylor_poly(x, _DENOMS_A)


def taylor_B(x: Array) -> Array:
    """(1-cos(x))/x^2."""
    return _taylor_poly(x, _DENOMS_B)


def taylor_C(x: Array) -> Array:
    """(x-sin(x))/x^3."""
    return _taylor_poly(x, _DENOMS_C)


@f32_matmuls
def so3_to_SO3(w: Array) -> Array:
    """Rodrigues: (...,3) axis-angle -> (...,3,3) rotation."""
    wx = skew_symmetric(w)
    theta_sq = jnp.sum(w * w, axis=-1)[..., None, None]
    eye = jnp.eye(3, dtype=w.dtype)
    A = _taylor_poly_sq(theta_sq, _DENOMS_A)
    B = _taylor_poly_sq(theta_sq, _DENOMS_B)
    return eye + A * wx + B * (wx @ wx)


def SO3_to_so3(R: Array, eps: float = 1e-7) -> Array:
    """Log map: (...,3,3) -> (...,3). theta wrapped mod pi as in reference."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    theta = jnp.arccos(jnp.clip((trace - 1) / 2, -1 + eps, 1 - eps))
    theta = jnp.mod(theta, math.pi)[..., None, None]
    lnR = 1 / (2 * taylor_A(theta) + 1e-8) * (R - jnp.swapaxes(R, -2, -1))
    return jnp.stack([lnR[..., 2, 1], lnR[..., 0, 2], lnR[..., 1, 0]], axis=-1)


@f32_matmuls
def se3_to_SE3(wu: Array) -> Array:
    """(...,6) [w|u] twist -> (...,3,4) pose."""
    w, u = wu[..., :3], wu[..., 3:]
    wx = skew_symmetric(w)
    theta_sq = jnp.sum(w * w, axis=-1)[..., None, None]
    eye = jnp.eye(3, dtype=wu.dtype)
    A = _taylor_poly_sq(theta_sq, _DENOMS_A)
    B = _taylor_poly_sq(theta_sq, _DENOMS_B)
    C = _taylor_poly_sq(theta_sq, _DENOMS_C)
    R = eye + A * wx + B * (wx @ wx)
    V = eye + B * wx + C * (wx @ wx)
    return jnp.concatenate([R, V @ u[..., None]], axis=-1)


@f32_matmuls
def SE3_to_se3(Rt: Array, eps: float = 1e-8) -> Array:
    """(...,3,4) pose -> (...,6) twist."""
    R, t = Rt[..., :3], Rt[..., 3:]
    w = SO3_to_so3(R)
    wx = skew_symmetric(w)
    theta = jnp.linalg.norm(w, axis=-1)[..., None, None]
    eye = jnp.eye(3, dtype=Rt.dtype)
    A, B = taylor_A(theta), taylor_B(theta)
    invV = eye - 0.5 * wx + (1 - A / (2 * B)) / (theta**2 + eps) * (wx @ wx)
    u = (invV @ t)[..., 0]
    return jnp.concatenate([w, u], axis=-1)


# ---------------------------------------------------------------------------
# Quaternions (reference camera.py Quaternion class :207-290)
# ---------------------------------------------------------------------------


def quaternion_to_R(q: Array) -> Array:
    """Unit quaternion (...,4) [w,x,y,z] -> rotation matrix (...,3,3)."""
    qa, qb, qc, qd = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            jnp.stack(
                [
                    1 - 2 * (qc**2 + qd**2),
                    2 * (qb * qc - qa * qd),
                    2 * (qa * qc + qb * qd),
                ],
                axis=-1,
            ),
            jnp.stack(
                [
                    2 * (qb * qc + qa * qd),
                    1 - 2 * (qb**2 + qd**2),
                    2 * (qc * qd - qa * qb),
                ],
                axis=-1,
            ),
            jnp.stack(
                [
                    2 * (qb * qd - qa * qc),
                    2 * (qa * qb + qc * qd),
                    1 - 2 * (qb**2 + qc**2),
                ],
                axis=-1,
            ),
        ],
        axis=-2,
    )
    return R


def R_to_quaternion(R: Array) -> Array:
    """Rotation matrix (...,3,3) -> unit quaternion (...,4) [w,x,y,z].

    Branchless Shepperd method (jnp.where over the 4 candidate decompositions),
    jit/vmap safe, unlike the reference's numpy eigh path (camera.py:230-258).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    # candidate 0: trace-dominant
    s0 = safe_sqrt(tr + 1.0) * 2
    q0 = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0], -1)
    # candidate 1: m00-dominant
    s1 = safe_sqrt(1.0 + m00 - m11 - m22) * 2
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1], -1)
    # candidate 2: m11-dominant
    s2 = safe_sqrt(1.0 + m11 - m00 - m22) * 2
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2], -1)
    # candidate 3: m22-dominant
    s3 = safe_sqrt(1.0 + m22 - m00 - m11) * 2
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3], -1)

    cond0 = (tr > 0)[..., None]
    cond1 = ((m00 >= m11) & (m00 >= m22))[..., None]
    cond2 = (m11 >= m22)[..., None]
    q = jnp.where(cond0, q0, jnp.where(cond1, q1, jnp.where(cond2, q2, q3)))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quaternion_product(q1: Array, q2: Array) -> Array:
    """Hamilton product (...,4)x(...,4) -> (...,4)."""
    q1a, q1b, q1c, q1d = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    q2a, q2b, q2c, q2d = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            q1a * q2a - q1b * q2b - q1c * q2c - q1d * q2d,
            q1a * q2b + q1b * q2a + q1c * q2d - q1d * q2c,
            q1a * q2c - q1b * q2d + q1c * q2a + q1d * q2b,
            q1a * q2d + q1b * q2c - q1c * q2b + q1d * q2a,
        ],
        axis=-1,
    )


# ---------------------------------------------------------------------------
# rays (reference camera.py:349-437)
# ---------------------------------------------------------------------------


def get_pixel_grid(H: int, W: int, dtype=jnp.float32) -> Array:
    """(H*W, 2) pixel-center coordinates (x+0.5, y+0.5), row-major over y."""
    y = jnp.arange(H, dtype=dtype) + 0.5
    x = jnp.arange(W, dtype=dtype) + 0.5
    Y, X = jnp.meshgrid(y, x, indexing="ij")
    return jnp.stack([X, Y], axis=-1).reshape(-1, 2)


@f32_matmuls
def get_center_and_ray_at_pixels(
    pose_w2c: Array, pixels: Array, intr: Array
) -> Tuple[Array, Array]:
    """Camera centers + (unnormalized) ray directions at given pixels.

    Args:
      pose_w2c: (B,3,4)
      pixels: (N,2) shared across batch or (B,N,2)
      intr: (B,3,3)
    Returns:
      center, ray: (B,N,3) each; ray = R_c2w K^-1 [u,v,1] (NOT normalized), so
      ``depth`` below always means z-like distance along the ray parameter t.
    """
    B = pose_w2c.shape[0]
    if pixels.ndim == 2:
        pixels = jnp.broadcast_to(pixels[None], (B, *pixels.shape))
    grid_3d = img2cam(to_hom(pixels), intr)  # (B,N,3)
    center = cam2world(jnp.zeros_like(grid_3d), pose_w2c)
    grid_world = cam2world(grid_3d, pose_w2c)
    return center, grid_world - center


@f32_matmuls
def get_center_and_ray(pose_w2c: Array, H: int, W: int, intr: Array) -> Tuple[Array, Array]:
    """Centers + rays at every pixel of an (H,W) image. Returns (B,HW,3) pairs."""
    pixels = get_pixel_grid(H, W)
    return get_center_and_ray_at_pixels(pose_w2c, pixels, intr)


def get_3d_points_from_depth(
    center: Array, ray: Array, depth: Array, multi_samples: bool = False
) -> Array:
    """x = c + t*d. depth: (B,N,S,1) if multi_samples else broadcastable to ray."""
    if multi_samples:
        center, ray = center[:, :, None], ray[:, :, None]
    return center + ray * depth


@f32_matmuls
def convert_NDC(center: Array, ray: Array, intr: Array, near: float = 1.0) -> Tuple[Array, Array]:
    """Shift ray origins to the near plane and map to NDC (camera.py:439-470)."""
    center = center + (near - center[..., 2:]) / ray[..., 2:] * ray
    cx, cy, cz = center[..., 0], center[..., 1], center[..., 2]
    rx, ry, rz = ray[..., 0], ray[..., 1], ray[..., 2]
    scale_x = (intr[:, 0, 0] / intr[:, 0, 2])[:, None]
    scale_y = (intr[:, 1, 1] / intr[:, 1, 2])[:, None]
    cnx = scale_x * (cx / cz)
    cny = scale_y * (cy / cz)
    cnz = 1 - 2 * near / cz
    rnx = scale_x * (rx / rz - cx / cz)
    rny = scale_y * (ry / rz - cy / cz)
    rnz = 2 * near / cz
    return jnp.stack([cnx, cny, cnz], -1), jnp.stack([rnx, rny, rnz], -1)


# ---------------------------------------------------------------------------
# distances & alignment primitives (reference camera.py:472-519)
# ---------------------------------------------------------------------------


@f32_matmuls
def rotation_distance(R1: Array, R2: Array, eps: float = 1e-7) -> Array:
    """Geodesic angle between rotation matrices, radians."""
    R_diff = R1 @ jnp.swapaxes(R2, -2, -1)
    trace = R_diff[..., 0, 0] + R_diff[..., 1, 1] + R_diff[..., 2, 2]
    return jnp.arccos(jnp.clip((trace - 1) / 2, -1 + eps, 1 - eps))


def angle_to_rotation_matrix(a: Array, axis: str) -> Array:
    """Rotation matrix around axis in {X,Y,Z} (camera.py:337-347)."""
    roll = dict(X=1, Y=2, Z=0)[axis]
    zeros, ones = jnp.zeros_like(a), jnp.ones_like(a)
    M = jnp.stack(
        [
            jnp.stack([jnp.cos(a), -jnp.sin(a), zeros], -1),
            jnp.stack([jnp.sin(a), jnp.cos(a), zeros], -1),
            jnp.stack([zeros, zeros, ones], -1),
        ],
        axis=-2,
    )
    return jnp.roll(M, shift=(roll, roll), axis=(-2, -1))


def procrustes_analysis(X0: np.ndarray, X1: np.ndarray) -> dict:
    """sim3 {t0,t1,s0,s1,R} aligning point sets; X1->X0 is ((X1-t1)/s1)R^T s0+t0.

    Host-side numpy (float64 SVD) — eval/alignment path only, matching the
    reference's .cpu().double() SVD (camera.py:498-517).
    """
    X0 = np.asarray(X0, np.float64)
    X1 = np.asarray(X1, np.float64)
    t0 = X0.mean(axis=0)
    t1 = X1.mean(axis=0)
    X0c, X1c = X0 - t0, X1 - t1
    s0 = np.sqrt((X0c**2).sum(-1).mean())
    s1 = np.sqrt((X1c**2).sum(-1).mean())
    s0 = max(s0, 1e-12)
    s1 = max(s1, 1e-12)
    U, _, Vh = np.linalg.svd((X0c / s0).T @ (X1c / s1), full_matrices=False)
    R = U @ Vh
    if np.linalg.det(R) < 0:
        R[2] *= -1
    return dict(
        t0=t0.astype(np.float32),
        t1=t1.astype(np.float32),
        s0=np.float32(s0),
        s1=np.float32(s1),
        R=R.astype(np.float32),
    )


@f32_matmuls
def get_novel_view_poses(pose_anchor: Array, N: int = 60, scale: float = 1.0) -> Array:
    """Small oscillations around an anchor w2c pose (camera.py:521-541)."""
    theta = jnp.arange(N) / N * 2 * math.pi
    R_x = angle_to_rotation_matrix(jnp.arcsin(jnp.sin(theta) * 0.1), "X")
    R_y = angle_to_rotation_matrix(jnp.arcsin(jnp.cos(theta) * 0.1), "Y")
    pose_rot = pose_from_rt(R=R_y @ R_x)
    pose_shift = pose_from_rt(t=jnp.array([0, 0, -4 * scale], jnp.float32))
    pose_shift2 = pose_from_rt(t=jnp.array([0, 0, 3.8 * scale], jnp.float32))
    pose_oscil = pose_compose([pose_shift, pose_rot, pose_shift2])
    return pose_compose([pose_oscil, pose_anchor[None]])
