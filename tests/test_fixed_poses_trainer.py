"""Fixed-noisy-poses ablation trainer (nerf_trainer_w_fixed_colmap_poses parity)."""
import numpy as np
import pytest

from sparf_tpu.configs.config import ConfigDict, override_options
from sparf_tpu.configs.presets import PRESETS
from sparf_tpu.training.joint_trainer import NerfTrainerPerSceneWColmapFixedPoses


def test_fixed_poses_trainer_smoke(tmp_path):
    cfg = PRESETS["nerf_fixed_noisy_poses/synthetic/sparf"]()
    cfg = override_options(
        cfg,
        ConfigDict(
            env=ConfigDict(),
            scene="spheres",
            synthetic=dict(H=24, W=32, n_train=3, n_test=1),
            max_iter=6,
            log_steps=3, val_steps=1000, snapshot_steps=1000, vis_steps=1000,
            arch=dict(layers_feat=[None, 32, 32, 32], layers_rgb=[None, 16, 3], skip=[1]),
            nerf=ConfigDict(sample_intvs=16, sample_intvs_fine=8, rand_rays=128,
                            fine_sampling=False, ratio_start_fine_sampling_at_x=None),
            depth_cons_nbr_rays=64,
            min_nbr_matches=20,
            use_gt_correspondences=True,
            loss_type="photometric",
            camera=ConfigDict(initial_pose="noisy_gt", noise=0.1),
            optim=ConfigDict(test_iter=3),
        ),
    )
    tr = NerfTrainerPerSceneWColmapFixedPoses(cfg, workspace=str(tmp_path))
    # poses must stay frozen through training
    p_before = np.asarray(tr.current_poses_w2c())
    tr.run(load_latest=False)
    p_after = np.asarray(tr.current_poses_w2c())
    np.testing.assert_allclose(p_before, p_after, atol=1e-7)
    assert not tr.optimize_poses_at(0)
    # eval path: GT test poses + test-time refinement
    result = tr.evaluate_full()
    assert "psnr" in result["mean"]
    assert tr.state.nan_count == 0


def test_refine_stats_conventions():
    """_refine_stats pins the w2c OpenCV convention: rotation delta in deg
    and the CAMERA-CENTER distance (c = -R^T t), not the raw t delta."""
    from sparf_tpu.training.joint_trainer import _refine_stats
    from sparf_tpu.utils import camera
    import jax.numpy as jnp

    th = np.deg2rad(2.5)
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0],
                  [0, 0, 1]], np.float32)
    pre = np.concatenate([np.eye(3, dtype=np.float32),
                          np.array([[0.1], [0.0], [1.0]], np.float32)], axis=1)
    post = pre.copy()
    post[:, :3] = R @ pre[:, :3]
    # shift the camera center by a known world-space offset
    c_pre = -pre[:, :3].T @ pre[:, 3]
    c_post = c_pre + np.array([0.03, -0.04, 0.0], np.float32)
    post[:, 3] = -post[:, :3] @ c_post
    stats = _refine_stats(jnp.asarray(pre[None]), jnp.asarray(post[None]))
    assert abs(stats["rot_deg"] - 2.5) < 0.05, stats["rot_deg"]
    assert abs(stats["trans"] - 0.05) < 1e-4, stats["trans"]
    np.testing.assert_allclose(np.asarray(stats["pose_pre"])[0], pre, atol=1e-6)
