"""Unit tests for sparf_tpu.utils.camera against closed forms and scipy."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as R_scipy

from sparf_tpu.utils import camera


def random_rotation(rng, n=()):
    q = rng.randn(*n, 4)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return R_scipy.from_quat(q.reshape(-1, 4)).as_matrix().reshape(*n, 3, 3).astype(np.float32)


def test_pose_invert_compose(rng):
    R = random_rotation(rng, (5,))
    t = rng.randn(5, 3).astype(np.float32)
    pose = camera.pose_from_rt(R, t)
    assert pose.shape == (5, 3, 4)
    inv = camera.pose_invert(pose)
    comp = camera.pose_compose([pose, inv])
    np.testing.assert_allclose(comp[:, :, :3], np.broadcast_to(np.eye(3), (5, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(comp[:, :, 3], 0, atol=1e-5)


def test_pose_compose_order(rng):
    """compose([a,b]) must equal b(a(x))."""
    Ra, Rb = random_rotation(rng), random_rotation(rng)
    ta, tb = rng.randn(3).astype(np.float32), rng.randn(3).astype(np.float32)
    a = camera.pose_from_rt(Ra, ta)
    b = camera.pose_from_rt(Rb, tb)
    x = rng.randn(7, 3).astype(np.float32)
    via_compose = camera.world2cam(jnp.asarray(x), camera.pose_compose([a, b]))
    step = camera.world2cam(camera.world2cam(jnp.asarray(x), a), b)
    np.testing.assert_allclose(via_compose, step, atol=1e-5)


def test_so3_roundtrip(rng):
    w = rng.randn(10, 3).astype(np.float32) * 0.5
    R = camera.so3_to_SO3(jnp.asarray(w))
    R_ref = R_scipy.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)
    w_back = camera.SO3_to_so3(R)
    np.testing.assert_allclose(w_back, w, atol=1e-4)


def test_so3_small_angle_gradients():
    """Gradients of the Rodrigues map must be finite at w=0."""
    g = jax.grad(lambda w: camera.so3_to_SO3(w).sum())(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_se3_roundtrip(rng):
    wu = rng.randn(8, 6).astype(np.float32) * 0.3
    Rt = camera.se3_to_SE3(jnp.asarray(wu))
    wu_back = camera.SE3_to_se3(Rt)
    np.testing.assert_allclose(wu_back, wu, atol=1e-4)
    # check SE3 exp against scipy for the rotation block
    R_ref = R_scipy.from_rotvec(wu[:, :3]).as_matrix()
    np.testing.assert_allclose(Rt[..., :3], R_ref, atol=1e-5)


def test_quaternion_roundtrip(rng):
    R = random_rotation(rng, (20,))
    q = camera.R_to_quaternion(jnp.asarray(R))
    R_back = camera.quaternion_to_R(q)
    np.testing.assert_allclose(R_back, R, atol=1e-4)
    norms = np.linalg.norm(np.asarray(q), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_quaternion_product(rng):
    R1 = random_rotation(rng, (4,))
    R2 = random_rotation(rng, (4,))
    q1 = camera.R_to_quaternion(jnp.asarray(R1))
    q2 = camera.R_to_quaternion(jnp.asarray(R2))
    q12 = camera.quaternion_product(q1, q2)
    R12 = camera.quaternion_to_R(q12)
    np.testing.assert_allclose(R12, R1 @ R2, atol=1e-4)


def test_rays_pinhole(rng):
    """Rays through pixel centers must project back to those pixels."""
    H, W = 12, 16
    K = np.array([[20.0, 0, W / 2], [0, 20.0, H / 2], [0, 0, 1]], np.float32)[None]
    Rm = random_rotation(rng, (1,))
    t = rng.randn(1, 3).astype(np.float32) * 0.1
    pose = camera.pose_from_rt(Rm, t)
    center, ray = camera.get_center_and_ray(pose, H, W, jnp.asarray(K))
    assert center.shape == (1, H * W, 3) and ray.shape == (1, H * W, 3)
    # camera center must be -R^T t
    c_expected = -(np.swapaxes(Rm, -1, -2) @ t[..., None])[..., 0]
    np.testing.assert_allclose(center[:, 0], c_expected, atol=1e-5)
    # project a point at depth 2 along each ray back into the image
    depth = jnp.full((1, H * W, 1), 2.0)
    pts = camera.get_3d_points_from_depth(center, ray, depth)
    uv_hom = camera.cam2img(camera.world2cam(pts, pose), jnp.asarray(K))
    uv = uv_hom[..., :2] / uv_hom[..., 2:]
    grid = camera.get_pixel_grid(H, W)[None]
    np.testing.assert_allclose(uv, grid, atol=1e-3)
    # z-depth along the ray parameter equals t because dirs are K^-1-scaled
    z = camera.world2cam(pts, pose)[..., 2]
    np.testing.assert_allclose(z, 2.0, atol=1e-4)


def test_rays_at_pixels_match_full_grid(rng):
    H, W = 8, 10
    K = np.array([[15.0, 0, 5.0], [0, 15.0, 4.0], [0, 0, 1]], np.float32)[None]
    pose = camera.pose_from_rt(random_rotation(rng, (1,)), rng.randn(1, 3).astype(np.float32))
    center_all, ray_all = camera.get_center_and_ray(pose, H, W, jnp.asarray(K))
    idx = np.array([3, 17, 42])
    pix = camera.get_pixel_grid(H, W)[idx]
    center_px, ray_px = camera.get_center_and_ray_at_pixels(pose, pix, jnp.asarray(K))
    np.testing.assert_allclose(center_px, center_all[:, idx], atol=1e-5)
    np.testing.assert_allclose(ray_px, ray_all[:, idx], atol=1e-5)


def test_rotation_distance(rng):
    w = rng.randn(3).astype(np.float32)
    w = w / np.linalg.norm(w) * 0.7
    R1 = np.eye(3, dtype=np.float32)
    R2 = R_scipy.from_rotvec(w).as_matrix().astype(np.float32)
    d = camera.rotation_distance(jnp.asarray(R1), jnp.asarray(R2))
    np.testing.assert_allclose(d, 0.7, atol=1e-4)


def test_procrustes(rng):
    X0 = rng.randn(30, 3)
    R = random_rotation(rng)
    s, t = 2.5, rng.randn(3)
    X1 = (X0 - X0.mean(0)) @ R.T * s + t
    sim3 = camera.procrustes_analysis(X0, X1)
    X1to0 = (X1 - sim3["t1"]) / sim3["s1"] @ sim3["R"].T * sim3["s0"] + sim3["t0"]
    np.testing.assert_allclose(X1to0, X0, atol=1e-4)


def test_ndc_rays(rng):
    H, W = 8, 8
    K = np.array([[10.0, 0, 4.0], [0, 10.0, 4.0], [0, 0, 1]], np.float32)[None]
    pose = camera.pose_from_rt(np.eye(3, dtype=np.float32)[None], np.zeros((1, 3), np.float32))
    center, ray = camera.get_center_and_ray(pose, H, W, jnp.asarray(K))
    c_ndc, r_ndc = camera.convert_NDC(center, ray, jnp.asarray(K))
    assert np.all(np.isfinite(np.asarray(c_ndc)))
    # origin z must be at the -1..1 mapped near plane: 1 - 2*near/cz with cz=near -> -1
    np.testing.assert_allclose(c_ndc[..., 2], -1.0, atol=1e-5)


def test_novel_view_poses(rng):
    anchor = camera.pose_from_rt(random_rotation(rng), rng.randn(3).astype(np.float32))
    poses = camera.get_novel_view_poses(jnp.asarray(anchor), N=12, scale=1.0)
    assert poses.shape == (12, 3, 4)
    # rotations must stay orthonormal
    RtR = np.swapaxes(np.asarray(poses[..., :3]), -1, -2) @ np.asarray(poses[..., :3])
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), RtR.shape), atol=1e-4)


def test_pose_math_survives_bf16_matmul_default(rng):
    """Exp map + composition stay orthonormal under a bf16 matmul default.

    The TPU MXU runs matmuls as a single bf16 pass by default; round 4
    measured that this corrupts the 3x3 pose algebra by up to 1.9 deg
    (``wx @ wx`` in the exp map -> ||RR^T-I|| ~ 2e-3, surfaced as a
    0.79 -> 2.17 deg SfM pose-export discrepancy). camera.f32_matmuls must
    override any ambient precision default. On CPU the precision setting is
    a no-op, so this test pins the contract for TPU suite runs.
    """
    tw = jnp.asarray(rng.standard_normal((16, 6)).astype(np.float32))
    with jax.default_matmul_precision("bfloat16"):
        pose = camera.se3_to_SE3(tw)
        comp = camera.pose_compose([pose, pose])
        inv = camera.pose_invert(comp)
    for p in (pose, comp, inv):
        R = np.asarray(p)[..., :3]  # (...,3,4) -> rotation block
        gram = R @ np.swapaxes(R, -1, -2)
        assert np.abs(gram - np.eye(3)).max() < 1e-5
