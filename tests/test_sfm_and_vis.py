"""Mini-SfM, triangulation, rendering paths, vis and video tests."""
import os

import numpy as np
import pytest

from sparf_tpu.colmap_init import sfm, triangulation
from sparf_tpu.configs.config import ConfigDict
from sparf_tpu.datasets.synthetic import load_synthetic_scene
from sparf_tpu.utils import alignment, rendering_paths, vis


@pytest.fixture(scope="module")
def scene():
    return load_synthetic_scene(split="train", H=64, W=80, n_train=4, n_test=1)


def test_mini_sfm_recovers_poses(scene, tmp_path_factory):
    """SfM from GT matches must recover the camera geometry up to sim3."""
    cfg = ConfigDict(use_gt_correspondences=True, flow_backbone="zncc")
    result = sfm.compute_sfm_from_matches(
        cfg, scene, str(tmp_path_factory.mktemp("sfm")), load_colmap_depth=True
    )
    assert len(result.valid_poses_idx) == 4, result.index_images_excluded
    aligned, sim3 = alignment.prealign_w2c_small_camera_systems(
        result.poses_w2c[:, :3], scene["pose"]
    )
    err = alignment.evaluate_camera_alignment(aligned, scene["pose"])
    assert err["R"].mean() * 57.3 < 2.0, err["R"] * 57.3
    assert err["t"].mean() < 0.1 * np.linalg.norm(
        alignment.invert_poses(scene["pose"])[:, :, 3].std(0)
    ) + 0.05
    # depth maps: sparse but non-empty, confidences in (0,1]
    assert result.colmap_depth is not None
    n_px = (result.colmap_depth > 0).sum()
    assert n_px > 100
    conf_vals = result.colmap_conf[result.colmap_conf > 0]
    assert conf_vals.max() <= 1.0


def test_prior_init_sfm_recovers_relative_poses(scene):
    """run_prior_init_sfm from ~9-deg-noisy priors + GT matches must reach
    sub-degree RELATIVE poses — the regime where essential-matrix init
    degenerates on clustered near-planar matches (flow_net._sfm_from_matches
    prefers this path whenever SPARF's noisy init poses exist)."""
    import jax.numpy as jnp

    from sparf_tpu.models import flow_net as F
    from sparf_tpu.utils import camera as cam

    n = scene["image"].shape[0]
    H, W = scene["image"].shape[-2:]
    combi = F.get_combi_list(n, "all")
    gt_c, gt_f = F.compute_gt_flow_of_combi_list(scene, combi)

    kps = sfm.grid_keypoints(H, W, 2, margin=4)
    kx, ky = kps[:, 0].astype(int), kps[:, 1].astype(int)
    pidx = {(int(t), int(s)): p for p, (t, s) in enumerate(combi.T)}
    pair_matches = {}
    for i in range(n):
        for j in range(i + 1, n):
            p = pidx[(i, j)]
            sel = np.where(gt_f[p, 0][ky, kx] > 0.5)[0]
            xy = gt_c[p][:, ky[sel], kx[sel]].T
            inb = ((xy[:, 0] >= 0) & (xy[:, 0] <= W - 1)
                   & (xy[:, 1] >= 0) & (xy[:, 1] <= H - 1))
            pair_matches[(i, j)] = (sel[inb], xy[inb].astype(np.float32))

    import jax

    se3_noise = jax.random.normal(jax.random.PRNGKey(2), (n, 6)) * 0.12
    noise44 = np.asarray(cam.se3_to_SE3(se3_noise))
    priors = np.asarray(cam.pose_compose(
        [jnp.asarray(noise44), jnp.asarray(scene["pose"])]
    ))

    res = sfm.run_prior_init_sfm(
        {"image": scene["image"], "intr": scene["intr"]},
        (kps, pair_matches), priors, ba_iters=1500,
    )
    assert not res.index_images_excluded

    def rel_rot_err(poses):
        errs = []
        for t in range(n):
            for s in range(t + 1, n):
                Rg = scene["pose"][s][:3, :3] @ scene["pose"][t][:3, :3].T
                Re = poses[s][:3, :3] @ poses[t][:3, :3].T
                c = (np.trace(Rg.T @ Re) - 1) / 2
                errs.append(np.degrees(np.arccos(np.clip(c, -1, 1))))
        return np.asarray(errs)

    errs = rel_rot_err(res.poses_w2c)
    prior_errs = rel_rot_err(priors)
    assert errs.mean() < 1.0, (errs, prior_errs)
    assert errs.mean() < prior_errs.mean() / 5


def test_mini_sfm_cache_roundtrip(scene, tmp_path):
    cfg = ConfigDict(use_gt_correspondences=True)
    r1 = sfm.compute_sfm_from_matches(cfg, scene, str(tmp_path), load_colmap_depth=False)
    assert os.path.exists(os.path.join(tmp_path, "sfm_result.npz"))
    r2 = sfm.compute_sfm_from_matches(cfg, scene, str(tmp_path), load_colmap_depth=False)
    np.testing.assert_allclose(r1.poses_w2c, r2.poses_w2c)


def test_triangulation_known_poses(scene):
    """Triangulated depth with GT poses must agree with GT depth."""
    cfg = ConfigDict(use_gt_correspondences=True)
    out = triangulation.compute_triangulation_from_matches(cfg, scene)
    d = out["colmap_depth"]
    m = d > 0
    assert m.sum() > 100
    gt = scene["depth_gt"]
    rel_err = np.abs(d[m] - gt[m]) / gt[m]
    assert np.median(rel_err) < 0.02, np.median(rel_err)


def test_spiral_paths(scene):
    c2w = alignment.invert_poses(scene["pose"])
    bounds = scene["depth_range"]
    path = rendering_paths.generate_spiral_path(c2w, bounds, n_frames=20)
    assert path.shape == (20, 3, 4)
    path_dtu = rendering_paths.generate_spiral_path_dtu(c2w, n_frames=15)
    assert path_dtu.shape == (15, 3, 4)
    for p in (path, path_dtu):
        R = p[:, :, :3]
        RtR = np.swapaxes(R, -1, -2) @ R
        np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), RtR.shape), atol=1e-4)


def test_vis_colorize_and_panels(scene):
    depth = scene["depth_gt"][0]
    img = vis.colorize(depth, invalid_mask=depth <= 0)
    assert img.shape == (*depth.shape, 3)
    assert img.min() >= 0 and img.max() <= 1
    gt = scene["image"][0].transpose(1, 2, 0)
    panel = vis.render_panel(gt, gt * 0.9, depth, opacity=(depth > 0).astype(np.float32),
                             gt_depth=depth)
    assert panel.ndim == 3 and panel.shape[-1] == 3


def test_frusta_plot(scene):
    img = vis.plot_camera_frusta([("gt", scene["pose"], "tab:blue")])
    assert img.ndim == 3 and img.shape[-1] == 3


def test_write_video(tmp_path):
    from sparf_tpu.utils.video import write_video

    frames = [np.random.rand(32, 40, 3).astype(np.float32) for _ in range(5)]
    path = write_video(frames, str(tmp_path / "test.mp4"), fps=5)
    assert os.path.exists(path)
    assert os.path.getsize(path) > 0


def test_pose_history_video_animates_trajectory(scene, tmp_path):
    """record_pose_history + generate_videos_pose: poses stored at val steps
    become an animated frusta trajectory (reference joint trainer :664-705
    walks checkpoints; keep-2 GC leaves it ~2 frames — history is richer)."""
    from types import SimpleNamespace

    from sparf_tpu.training.trainer import NerfTrainerPerScene
    from sparf_tpu.utils.video import generate_videos_pose

    gt = np.asarray(scene["pose"])

    def noisy(it):
        # converge linearly toward GT over 100 iters
        out = gt.copy()
        out[:, :, 3] += 0.3 * (1 - min(it, 100) / 100.0)
        return out

    trainer = SimpleNamespace(
        pose_cfg=object(), workspace=str(tmp_path), iteration=100,
        train_scene_np={"pose": gt},
        current_poses_w2c=lambda: noisy(trainer.iteration),
    )
    for it in (0, 50, 100):
        trainer.iteration = it
        NerfTrainerPerScene.record_pose_history(trainer, it)
    # duplicate-iteration guard: re-recording the same iter is a no-op
    NerfTrainerPerScene.record_pose_history(trainer, 100)
    z = np.load(os.path.join(str(tmp_path), "pose_history.npz"))
    assert list(z["iters"]) == [0, 50, 100]
    assert z["poses"].shape == (3, *gt.shape)

    path = generate_videos_pose(trainer, out_dir=str(tmp_path))
    assert path is not None and os.path.exists(path) and os.path.getsize(path) > 0


def test_homography_fit_robust_to_outliers():
    """IRLS-DLT recovers a known homography from a 30%-outlier flow field
    (the use_homography_flow pre-alignment, reference base_corres_loss.py:107)."""
    import jax.numpy as jnp

    from sparf_tpu.models import flow_net as F

    H, W = 60, 80
    rng = np.random.RandomState(0)
    Hm_true = np.array([[1.05, 0.03, 2.0], [-0.02, 0.98, -1.5], [1e-4, -2e-4, 1.0]])
    xx, yy = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32))
    grid = np.stack([xx, yy], -1)
    gt = np.asarray(F._apply_homography(jnp.asarray(Hm_true), jnp.asarray(grid)))
    corres = gt + rng.randn(H, W, 2) * 0.3
    out = rng.rand(H, W) < 0.3
    corres[out] += rng.randn(out.sum(), 2) * 25
    Hm = F._fit_homography_weighted(
        jnp.asarray(corres, jnp.float32), jnp.ones((H, W), jnp.float32)
    )
    est = np.asarray(F._apply_homography(Hm, jnp.asarray(grid)))
    err = np.linalg.norm(est - gt, axis=-1)
    assert np.median(err) < 0.5, np.median(err)
    # identity warp is a no-op
    img = jnp.asarray(rng.rand(3, H, W).astype(np.float32))
    warped = F._warp_image_by_homography(img, jnp.eye(3))
    assert float(jnp.abs(warped - img).max()) == 0.0
