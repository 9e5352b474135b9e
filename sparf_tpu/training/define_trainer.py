"""Trainer factory (reference source/training/define_trainer.py:27-100)."""
from __future__ import annotations

from typing import Optional

from sparf_tpu.configs.config import ConfigDict, save_options_file
from sparf_tpu.configs.presets import apply_max_iter_schedule


def define_trainer(cfg: ConfigDict, workspace: Optional[str] = None,
                   debug: bool = False, save_option: bool = True):
    cfg = apply_max_iter_schedule(cfg)

    if save_option and workspace:
        save_options_file(cfg, workspace)

    model = cfg.model
    if model == "nerf_gt_poses":
        from sparf_tpu.training.trainer import NerfTrainerPerScene

        return NerfTrainerPerScene(cfg, workspace=workspace, debug=debug)
    if model == "joint_pose_nerf_training":
        from sparf_tpu.training.joint_trainer import PoseAndNerfTrainerPerScene

        return PoseAndNerfTrainerPerScene(cfg, workspace=workspace, debug=debug)
    if model == "nerf_fixed_noisy_poses":
        from sparf_tpu.training.joint_trainer import NerfTrainerPerSceneWColmapFixedPoses

        return NerfTrainerPerSceneWColmapFixedPoses(cfg, workspace=workspace, debug=debug)
    raise ValueError(f"unknown model {model!r}")
