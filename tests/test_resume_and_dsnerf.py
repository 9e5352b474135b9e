"""Weights-only warm start + DS-NeRF triangulated-depth loss wiring."""
import numpy as np
import jax.numpy as jnp

from sparf_tpu.configs import default as default_cfg
from sparf_tpu.configs.config import ConfigDict, override_options
from sparf_tpu.training.trainer import NerfTrainerPerScene


def small_cfg(tmp_path, **over):
    cfg = default_cfg.get_nerf_default_config_360_data()
    cfg = override_options(
        cfg,
        ConfigDict(
            env=ConfigDict(),
            dataset="synthetic", scene="spheres",
            synthetic=dict(H=24, W=32, n_train=3, n_test=1),
            max_iter=8, log_steps=4, val_steps=1000, snapshot_steps=4, vis_steps=1000,
            workspace=str(tmp_path / "ws"),
            arch=dict(layers_feat=[None, 32, 32, 32], layers_rgb=[None, 16, 3], skip=[1]),
            nerf=ConfigDict(sample_intvs=16, sample_intvs_fine=8, rand_rays=128,
                            fine_sampling=False),
        ),
    )
    return override_options(cfg, ConfigDict(over))


def test_weights_only_warm_start(tmp_path):
    cfg = small_cfg(tmp_path)
    tr1 = NerfTrainerPerScene(cfg, workspace=cfg.workspace)
    tr1.run(load_latest=False)
    snap = f"{cfg.workspace}/iter-8"

    cfg2 = small_cfg(tmp_path, workspace=str(tmp_path / "ws2"))
    cfg2.resume_snapshot = snap
    tr2 = NerfTrainerPerScene(cfg2, workspace=cfg2.workspace)
    tr2.run(load_latest=False)
    # weights were warm-started (first step params differ from fresh init),
    # but iteration restarted from 0 and trained to 8
    assert tr2.iteration == 8


def test_dsnerf_triangulated_depth_loss(tmp_path):
    """loss_type with SparseCOLMAPDepthLoss + GT poses triggers triangulation."""
    cfg = small_cfg(tmp_path, workspace=str(tmp_path / "ws3"))
    cfg.loss_type = "photometric_and_SparseCOLMAPDepthLoss"
    cfg.loss_weight.colmap_depth = 0.0
    cfg.use_gt_correspondences = True  # oracle matches for triangulation
    cfg.min_nbr_matches = 20
    tr = NerfTrainerPerScene(cfg, workspace=cfg.workspace)
    assert "colmap_depth" in tr.train_scene
    n_px = int(np.asarray(tr.train_scene["colmap_depth"] > 0).sum())
    assert n_px > 50, n_px
    tr.run(load_latest=False)
    assert int(tr.state.nan_count) == 0
