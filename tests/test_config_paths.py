"""E2E smoke tests for config paths not covered elsewhere: inverse-depth
parametrization (LLFF-style), depth-patch loss (patch ray expansion),
fg-mask-fraction sampling, distortion loss, mask_img compositing."""
import numpy as np
import pytest

from sparf_tpu.configs import default as default_cfg
from sparf_tpu.configs.config import ConfigDict, override_options
from sparf_tpu.training.trainer import NerfTrainerPerScene


def base_cfg(tmp_path, **over):
    cfg = default_cfg.get_nerf_default_config_llff()
    cfg = override_options(
        cfg,
        ConfigDict(
            env=ConfigDict(),
            dataset="synthetic",
            scene="spheres",
            synthetic=dict(H=24, W=32, n_train=3, n_test=1),
            max_iter=6,
            log_steps=3, val_steps=1000, snapshot_steps=1000, vis_steps=1000,
            workspace=str(tmp_path / "ws"),
            arch=dict(layers_feat=[None, 32, 32, 32], layers_rgb=[None, 16, 3], skip=[1]),
            nerf=ConfigDict(sample_intvs=16, sample_intvs_fine=8, rand_rays=192,
                            fine_sampling=False),
        ),
    )
    return override_options(cfg, ConfigDict(over))


def run_steps(cfg):
    tr = NerfTrainerPerScene(cfg, workspace=cfg.workspace)
    tr.run(load_latest=False)
    assert int(tr.state.nan_count) == 0
    return tr


def test_inverse_depth_param(tmp_path):
    """LLFF-style inverse-depth sampling: render range must be the config's
    [1, 0], not the scene's metric near/far (reference renderer.py:105-108)."""
    cfg = base_cfg(tmp_path)
    assert cfg.nerf.depth.param == "inverse"
    tr = run_steps(cfg)
    # validate renders finite images through the same range
    out = tr.validate(cfg.max_iter)
    assert np.isfinite(out["psnr"])


def test_depth_patch_loss(tmp_path):
    cfg = base_cfg(tmp_path)
    cfg.loss_weight.depth_patch = -2.0
    tr = run_steps(cfg)
    # sampler must be in patch mode: ray counts divisible by patch_size^2
    assert tr.sampler.depth_patch
    import jax

    rays = tr.sampler(jax.random.PRNGKey(0), cfg.nerf.rand_rays)
    assert rays.shape[-1] % cfg.depth_regu_patch_size**2 == 0


def test_distortion_loss(tmp_path):
    cfg = base_cfg(tmp_path)
    cfg.loss_weight.distortion = -3.0
    run_steps(cfg)


def test_fg_mask_fraction_sampling(tmp_path):
    """Per-image (B,N) ray indices through the whole photometric path."""
    cfg = base_cfg(tmp_path)
    cfg.sample_fraction_in_fg_mask = 0.5
    cfg.loss_weight.fg_mask = -1.0
    tr = run_steps(cfg)
    import jax

    rays = tr.sampler(jax.random.PRNGKey(0), cfg.nerf.rand_rays)
    assert rays.ndim == 2 and rays.shape[0] == 3  # per-image indices


def test_mask_img_composites_white(tmp_path):
    cfg = base_cfg(tmp_path)
    cfg.mask_img = True  # setbg_opaque path: rgb += (1-opacity)
    tr = run_steps(cfg)
    assert tr.render_cfg.setbg_opaque


def test_equalize_losses(tmp_path):
    cfg = base_cfg(tmp_path)
    cfg.loss_weight.equalize_losses = True
    cfg.loss_weight.distortion = 0.0
    run_steps(cfg)
