"""End-to-end training-slice tests on the synthetic scene (CPU, tiny model)."""
import os

import numpy as np
import pytest

from sparf_tpu.configs import default as default_cfg
from sparf_tpu.configs.config import ConfigDict, override_options
from sparf_tpu.training.trainer import NerfTrainerPerScene


def tiny_config(tmp_path, max_iter=150, **over):
    cfg = default_cfg.get_nerf_default_config_360_data()
    cfg = override_options(
        cfg,
        ConfigDict(
            dataset="synthetic",
            scene="spheres",
            synthetic=dict(H=32, W=40, n_train=3, n_test=2),
            train_sub=3,
            max_iter=max_iter,
            log_steps=50,
            val_steps=max_iter,
            snapshot_steps=max_iter,
            vis_steps=max_iter,
            workspace=str(tmp_path / "ws"),
            arch=dict(layers_feat=[None, 64, 64, 64, 64], layers_rgb=[None, 32, 3], skip=[2]),
            nerf=dict(sample_intvs=32, rand_rays=512, sample_intvs_fine=16),
            optim=dict(lr=5.0e-4, lr_end=1.0e-4),
        ),
    )
    cfg = override_options(cfg, ConfigDict(over))
    # synthetic dataset needs no env paths
    cfg.env = ConfigDict()
    return cfg


@pytest.mark.slow
def test_nerf_gt_poses_training_improves(tmp_path):
    cfg = tiny_config(tmp_path, max_iter=300)
    trainer = NerfTrainerPerScene(cfg, workspace=cfg.workspace)
    # initial validation PSNR (untrained)
    psnr_before = trainer.validate(0)["psnr"]
    trainer.run(load_latest=False)
    psnr_after = trainer.validate(cfg.max_iter)["psnr"]
    assert psnr_after > psnr_before + 3.0, (psnr_before, psnr_after)
    assert trainer.state.nan_count == 0


def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_config(tmp_path, max_iter=20, snapshot_steps=10, val_steps=1000)
    trainer = NerfTrainerPerScene(cfg, workspace=cfg.workspace)
    trainer.run(load_latest=False)
    it = trainer.iteration
    assert it == 20

    # fresh trainer resumes from the snapshot
    trainer2 = NerfTrainerPerScene(cfg, workspace=cfg.workspace)
    assert trainer2.load_snapshot("latest")
    assert trainer2.iteration == it
    # params identical
    p1 = np.asarray(trainer.state.nerf_params["coarse"]["feat"][0][0])
    p2 = np.asarray(trainer2.state.nerf_params["coarse"]["feat"][0][0])
    np.testing.assert_allclose(p1, p2)
    # old checkpoints GC'd to last 2
    from sparf_tpu.training.checkpointing import list_snapshots

    snaps = list_snapshots(cfg.workspace)
    assert len(snaps) <= 2


def test_evaluate_full_writes_json(tmp_path):
    cfg = tiny_config(tmp_path, max_iter=5, val_steps=1000, snapshot_steps=1000)
    cfg.expname = "testeval"
    trainer = NerfTrainerPerScene(cfg, workspace=cfg.workspace)
    trainer.run(load_latest=False)
    result = trainer.evaluate_full()
    assert "psnr" in result["mean"]
    assert "ssim" in result["mean"]
    assert "lpips" in result["mean"]
    assert "abse_depth" in result["mean"]  # synthetic has GT depth
    assert "psnr_masked" in result["mean"]  # synthetic has fg masks
    import json

    with open(os.path.join(cfg.workspace, "testeval.json")) as f:
        saved = json.load(f)
    assert saved["mean"]["iteration"] == 5


def test_debug_mode_smoke(tmp_path):
    """--debug equivalent: 10 iterations end to end (reference run_debug)."""
    cfg = tiny_config(tmp_path, max_iter=100000)
    trainer = NerfTrainerPerScene(cfg, workspace=cfg.workspace, debug=True)
    trainer.run(load_latest=False)
    assert trainer.iteration == 10


def test_fine_sampling_path(tmp_path):
    cfg = tiny_config(tmp_path, max_iter=6, val_steps=1000, snapshot_steps=1000)
    cfg.nerf.fine_sampling = True
    trainer = NerfTrainerPerScene(cfg, workspace=cfg.workspace)
    trainer.run(load_latest=False)
    assert "fine" in trainer.state.nerf_params
    assert trainer.state.nan_count == 0
