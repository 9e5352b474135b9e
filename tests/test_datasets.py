"""Dataset loader tests with on-the-fly fixture scenes."""
import os

import numpy as np
import pytest

from sparf_tpu.configs.config import ConfigDict
from sparf_tpu.datasets import base, create_dataset
from sparf_tpu.datasets.synthetic import load_synthetic_scene, render_view
from sparf_tpu.utils import alignment


# ---------------------------------------------------------------------------
# synthetic analytic scene
# ---------------------------------------------------------------------------


def test_synthetic_scene_fields():
    sc = load_synthetic_scene(split="train", H=32, W=40, n_train=4, n_test=2)
    assert sc["image"].shape == (4, 3, 32, 40)
    assert sc["pose"].shape == (4, 3, 4)
    assert sc["intr"].shape == (4, 3, 3)
    assert sc["depth_gt"].shape == (4, 32, 40)
    assert sc["fg_mask"].shape == (4, 1, 32, 40)
    assert sc["depth_range"].shape == (4, 2)
    assert sc["image"].min() >= 0 and sc["image"].max() <= 1
    # cameras must look at the scene: some foreground in every view
    assert sc["valid_depth_gt"].reshape(4, -1).mean(-1).min() > 0.05


def test_synthetic_depth_consistency():
    """GT depth must reproject consistently between two synthetic views."""
    import jax.numpy as jnp
    from sparf_tpu.utils import geometry

    sc = load_synthetic_scene(split="train", H=48, W=64, n_train=3, n_test=1)
    K = jnp.asarray(sc["intr"][:1])
    pose_i, pose_j = sc["pose"][0], sc["pose"][1]
    T = geometry.relative_transform_i_to_j(jnp.asarray(pose_i), jnp.asarray(pose_j))[None]
    H, W = 48, 64
    ys, xs = np.where(sc["valid_depth_gt"][0])
    sel = np.random.RandomState(0).choice(len(ys), 100)
    kpi = np.stack([xs[sel] + 0.5, ys[sel] + 0.5], -1).astype(np.float32)[None]
    di = sc["depth_gt"][0][ys[sel], xs[sel]][None]
    kpj, vis = geometry.batch_project_to_other_img_and_check_depth(
        jnp.asarray(kpi), jnp.asarray(di), jnp.asarray(sc["depth_gt"][1:2]),
        K, K, T, jnp.ones_like(jnp.asarray(di), bool), rth=0.03,
    )
    # most points visible in view i are depth-consistent in view j (minus occlusions)
    assert np.asarray(vis).mean() > 0.5


def test_synthetic_splits_disjoint():
    tr = load_synthetic_scene(split="train", n_train=4, n_test=2, H=16, W=16)
    te = load_synthetic_scene(split="test", n_train=4, n_test=2, H=16, W=16)
    assert set(tr["rgb_path"]).isdisjoint(set(te["rgb_path"]))
    sub = load_synthetic_scene(split="train", train_sub=2, n_train=4, n_test=2, H=16, W=16)
    assert sub["image"].shape[0] == 2


# ---------------------------------------------------------------------------
# LLFF with a generated fixture
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def llff_fixture(tmp_path_factory):
    """Fabricate an LLFF scene dir: images_8/*.png + poses_bounds.npy."""
    import imageio.v2 as imageio

    root = tmp_path_factory.mktemp("llff")
    scene_dir = root / "fern"
    img_dir = scene_dir / "images_8"
    img_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)

    n = 10
    raw_H, raw_W, focal = 3024.0, 4032.0, 3260.0
    rows = []
    for i in range(n):
        # random-ish c2w in LLFF convention [down, right, backwards]
        from scipy.spatial.transform import Rotation as R_scipy

        R = R_scipy.from_rotvec(rng.randn(3) * 0.1).as_matrix()
        t = rng.randn(3) * 0.2 + np.array([0, 0, 4.0])
        pose_llff = np.concatenate([R, t[:, None]], 1)  # (3,4)
        hwf = np.array([raw_H, raw_W, focal])[:, None]
        row = np.concatenate([pose_llff, hwf], axis=1).reshape(-1)  # (15,)
        bounds = np.array([2.0 + 0.1 * i, 8.0 - 0.1 * i])
        rows.append(np.concatenate([row, bounds]))
        img = (rng.rand(378, 504, 3) * 255).astype(np.uint8)
        imageio.imwrite(str(img_dir / f"img{i:03d}.png"), img)
    np.save(str(scene_dir / "poses_bounds.npy"), np.stack(rows))
    return str(root)


def test_llff_loader(llff_fixture):
    cfg = ConfigDict(
        dataset="llff", scene="fern", train_sub=3,
        env=ConfigDict(llff=llff_fixture),
        llff_img_factor=8, resize=None,
    )
    train = create_dataset(cfg, "train")
    test = create_dataset(cfg, "test")
    # 10 images, llffhold=8 -> test = indices {0, 8}, train = rest (8), sub->3
    assert test["image"].shape[0] == 2
    assert train["image"].shape[0] == 3
    assert train["image"].shape[1] == 3
    # intrinsics scaled by factor 8
    np.testing.assert_allclose(train["intr"][0, 0, 0], 3260.0 / 8, rtol=1e-5)
    # poses are near-rotations: the reference's center_camera_poses averages
    # non-orthogonal v1/v2 (llff.py:133-143), so small skew is parity behavior
    R = train["pose"][:, :, :3]
    RtR = np.swapaxes(R, -1, -2) @ R
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), RtR.shape), atol=1e-2)
    # depth range: near = 0.9*min(bounds*scale); scale = 1/(0.75*min_bound)
    assert train["depth_range"].shape == (3, 2)
    min_b = 2.0  # min over fabricated bounds
    scale = 1.0 / (min_b * 0.75)
    np.testing.assert_allclose(train["depth_range"][0, 0], min_b * scale * 0.9, rtol=1e-4)


def test_llff_poses_face_plus_z(llff_fixture):
    """After the +z flip, cameras looking at the scene have +z forward —
    the mean camera-frame z-axis in world coords points toward the scene."""
    cfg = ConfigDict(
        dataset="llff", scene="fern", env=ConfigDict(llff=llff_fixture), llff_img_factor=8
    )
    train = create_dataset(cfg, "train")
    c2w = alignment.invert_poses(train["pose"])
    fwd = c2w[:, :, 2]  # camera z-axis in world
    centers = c2w[:, :, 3]
    # cameras recentered near origin and facing roughly the same direction
    assert np.linalg.norm(centers.mean(0)) < 2.0
    mean_fwd = fwd.mean(0)
    assert np.linalg.norm(mean_fwd) > 0.5  # coherent facing direction


# ---------------------------------------------------------------------------
# DTU with a generated fixture
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def dtu_fixture(tmp_path_factory):
    import imageio.v2 as imageio

    root = tmp_path_factory.mktemp("dtu")
    scene_dir = root / "scan82"
    img_dir = scene_dir / "image"
    img_dir.mkdir(parents=True)
    rng = np.random.RandomState(1)
    cams = {}
    n = 49
    K = np.array([[360.0, 0, 200.0], [0, 360.0, 150.0], [0, 0, 1]])
    for i in range(n):
        from scipy.spatial.transform import Rotation as R_scipy

        R = R_scipy.from_rotvec(rng.randn(3) * 0.2).as_matrix()
        t = rng.randn(3) * 50 + np.array([0, 0, 600.0])
        w2c = np.concatenate([R, t[:, None]], 1)
        P = K @ w2c
        cams[f"world_mat_{i}"] = np.concatenate([P, [[0, 0, 0, 1]]], 0)
        scale_mat = np.eye(4)
        scale_mat[0, 0] = scale_mat[1, 1] = scale_mat[2, 2] = 300.0
        cams[f"scale_mat_{i}"] = scale_mat
        imageio.imwrite(str(img_dir / f"{i:06d}.png"), (rng.rand(300, 400, 3) * 255).astype(np.uint8))
    np.savez(str(scene_dir / "cameras.npz"), **cams)
    return str(root)


def test_dtu_loader(dtu_fixture):
    cfg = ConfigDict(
        dataset="dtu", scene="scan82", train_sub=3,
        env=ConfigDict(dtu=dtu_fixture),
    )
    train = create_dataset(cfg, "train")
    assert train["image"].shape[0] == 3
    # pixelnerf split: first 3 of [25, 22, 28, ...]
    assert train["rgb_path"] == ["000025.png", "000022.png", "000028.png"]
    np.testing.assert_allclose(train["depth_range"][0], [1.2, 5.2], atol=1e-5)
    test = create_dataset(cfg, "test")
    assert test["image"].shape[0] == 49 - 9 - 15
    # intrinsics recovered from the projection matrix
    np.testing.assert_allclose(train["intr"][0][0, 0], 360.0, rtol=1e-3)
    # rotations orthonormal
    R = train["pose"][:, :, :3]
    RtR = np.swapaxes(R, -1, -2) @ R
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), RtR.shape), atol=1e-4)


def test_increase_depth_range():
    sc = load_synthetic_scene(split="train", H=8, W=8, n_train=2, n_test=1,
                              increase_depth_range_by_x_percent=0.2)
    from sparf_tpu.datasets.synthetic import NEAR, FAR

    np.testing.assert_allclose(sc["depth_range"][0, 0], NEAR - 0.2 * NEAR, rtol=1e-5)
    np.testing.assert_allclose(sc["depth_range"][0, 1], FAR + 0.2 * FAR, rtol=1e-5)


def test_nearest_pose_ids():
    sc = load_synthetic_scene(split="train", H=8, W=8, n_train=4, n_test=2)
    c2w = alignment.pad_poses(alignment.invert_poses(sc["pose"]))
    ids = base.get_nearest_pose_ids(c2w[0], c2w, num_select=2, tar_id=0)
    assert 0 not in ids and len(ids) == 2
