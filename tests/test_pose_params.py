"""Pose parametrization tests: init exactness, gradients, fixed poses."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as R_scipy

from sparf_tpu.models import pose_params
from sparf_tpu.models.pose_params import PoseConfig
from sparf_tpu.utils import camera


def make_poses(rng, n=4):
    Rm = R_scipy.from_rotvec(rng.randn(n, 3) * 0.3).as_matrix().astype(np.float32)
    t = rng.randn(n, 3).astype(np.float32)
    return np.concatenate([Rm, t[..., None]], axis=-1)


@pytest.mark.parametrize("param", ["two_columns", "axis_angle", "quaternion"])
def test_init_reproduces_initial_poses(rng, param):
    init = make_poses(rng)
    cfg = PoseConfig(parametrization=param, nbr_poses=4)
    params, consts = pose_params.init_pose_params(cfg, init)
    w2c = pose_params.get_w2c_poses(cfg, params, consts)
    np.testing.assert_allclose(np.asarray(w2c), init, atol=1e-4)
    c2w = pose_params.get_c2w_poses(cfg, params, consts)
    roundtrip = camera.pose_invert(c2w)
    np.testing.assert_allclose(np.asarray(roundtrip), init, atol=1e-4)


@pytest.mark.parametrize("param", ["two_columns", "axis_angle", "quaternion"])
def test_gradients_flow(rng, param):
    init = make_poses(rng)
    cfg = PoseConfig(parametrization=param, nbr_poses=4)
    params, consts = pose_params.init_pose_params(cfg, init)

    def loss(p):
        w2c = pose_params.get_w2c_poses(cfg, p, consts)
        return jnp.sum(w2c**2)

    g = jax.grad(loss)(params)
    flat, _ = jax.tree_util.tree_flatten(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)
    assert any(np.abs(np.asarray(x)).max() > 0 for x in flat)


def test_fixed_first_poses(rng):
    init = make_poses(rng)
    cfg = PoseConfig(
        parametrization="two_columns", nbr_poses=4,
        optimize_relative_poses=True, n_first_fixed_poses=1,
    )
    params, consts = pose_params.init_pose_params(cfg, init)
    assert params["pose_embedding"].shape == (3, 9)
    # perturb the embedding: pose 0 must stay exactly fixed
    params2 = {"pose_embedding": params["pose_embedding"] + 0.1}
    w2c = pose_params.get_w2c_poses(cfg, params2, consts)
    np.testing.assert_allclose(np.asarray(w2c[0]), init[0], atol=1e-6)
    assert np.abs(np.asarray(w2c[1]) - init[1]).max() > 1e-3


def test_rot_only_and_trans_only(rng):
    init = make_poses(rng)
    for opt_rot, opt_trans in [(True, False), (False, True)]:
        cfg = PoseConfig(
            parametrization="two_columns", nbr_poses=4,
            optimize_rot=opt_rot, optimize_trans=opt_trans,
        )
        params, consts = pose_params.init_pose_params(cfg, init)
        w2c = pose_params.get_w2c_poses(cfg, params, consts)
        np.testing.assert_allclose(np.asarray(w2c), init, atol=1e-4)
        trainable = set(params.keys())
        if opt_rot:
            assert trainable == {"rot_embedding"}
        else:
            assert trainable == {"trans_embedding"}


def test_optimize_c2w(rng):
    init = make_poses(rng)
    cfg = PoseConfig(parametrization="two_columns", nbr_poses=4, optimize_c2w=True)
    params, consts = pose_params.init_pose_params(cfg, init)
    w2c = pose_params.get_w2c_poses(cfg, params, consts)
    np.testing.assert_allclose(np.asarray(w2c), init, atol=1e-4)


def test_r6d2mat_orthonormal(rng):
    d6 = jnp.asarray(rng.randn(10, 6).astype(np.float32))
    R = pose_params.r6d2mat(d6)
    RtR = np.swapaxes(np.asarray(R), -1, -2) @ np.asarray(R)
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), RtR.shape), atol=1e-5)
    det = np.linalg.det(np.asarray(R))
    np.testing.assert_allclose(det, 1.0, atol=1e-5)


def test_pose_to_d9_roundtrip(rng):
    poses = make_poses(rng)
    d9 = pose_params.pose_to_d9(jnp.asarray(poses))
    R = pose_params.r6d2mat(d9[:, 3:])
    np.testing.assert_allclose(np.asarray(R), poses[:, :, :3], atol=1e-5)
