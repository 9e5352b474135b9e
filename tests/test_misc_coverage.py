"""Coverage for admin settings, eval --which both, grad-skip knob."""
import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from sparf_tpu import admin
from sparf_tpu.configs.config import ConfigDict, override_options
from sparf_tpu.configs import default as default_cfg


def test_admin_local_file_roundtrip(tmp_path, monkeypatch):
    path = admin.create_default_local_file(str(tmp_path / "local_settings.py"),
                                           workspace_dir="/data/ws", llff="/data/llff")
    assert os.path.exists(path)
    text = open(path).read()
    assert "/data/ws" in text and "/data/llff" in text
    # env-var override wins
    monkeypatch.setenv("SPARF_DTU", "/mnt/dtu")
    env = admin.env_settings()
    assert env.dtu == "/mnt/dtu"


def test_skip_large_gradients(tmp_path):
    from sparf_tpu.training.trainer import NerfTrainerPerScene

    cfg = default_cfg.get_nerf_default_config_360_data()
    cfg = override_options(cfg, ConfigDict(
        env=ConfigDict(), dataset="synthetic", scene="spheres",
        synthetic=dict(H=16, W=20, n_train=2, n_test=1),
        max_iter=4, log_steps=2, val_steps=100, snapshot_steps=100, vis_steps=100,
        workspace=str(tmp_path),
        arch=dict(layers_feat=[None, 16, 16], layers_rgb=[None, 8, 3], skip=[1]),
        nerf=ConfigDict(sample_intvs=8, sample_intvs_fine=4, rand_rays=64,
                        fine_sampling=False),
        skip_large_gradients=1e-12,  # absurdly small -> every step skipped
    ))
    tr = NerfTrainerPerScene(cfg, workspace=cfg.workspace)
    p0 = np.asarray(tr.state.nerf_params["coarse"]["feat"][0][0]).copy()
    tr.run(load_latest=False)
    p1 = np.asarray(tr.state.nerf_params["coarse"]["feat"][0][0])
    np.testing.assert_allclose(p0, p1)  # all updates skipped
    assert int(tr.state.nan_count) == 4


def test_eval_which_both(tmp_path):
    """eval.py --which both evaluates latest + best like the reference."""
    from sparf_tpu.training.trainer import NerfTrainerPerScene
    import eval as eval_cli

    cfg = default_cfg.get_nerf_default_config_360_data()
    cfg = override_options(cfg, ConfigDict(
        env=ConfigDict(), dataset="synthetic", scene="spheres",
        synthetic=dict(H=16, W=20, n_train=2, n_test=1),
        max_iter=4, log_steps=2, val_steps=2, snapshot_steps=2, vis_steps=100,
        workspace=str(tmp_path / "ws"),
        arch=dict(layers_feat=[None, 16, 16], layers_rgb=[None, 8, 3], skip=[1]),
        nerf=ConfigDict(sample_intvs=8, sample_intvs_fine=4, rand_rays=64,
                        fine_sampling=False),
    ))
    from sparf_tpu.configs.config import save_options_file

    tr = NerfTrainerPerScene(cfg, workspace=cfg.workspace)
    save_options_file(cfg, cfg.workspace)
    tr.run(load_latest=False)

    out = tmp_path / "eval_out"
    argv = ["eval.py", "--ckpt_dir", cfg.workspace, "--out_dir", str(out),
            "--expname", "e", "--which", "both"]
    old = sys.argv
    try:
        sys.argv = argv
        eval_cli.main()
    finally:
        sys.argv = old
    assert (out / "e_latest.json").exists()
    assert (out / "e_best.json").exists()
