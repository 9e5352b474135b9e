#!/usr/bin/env python
"""Train+eval driver (reference run_trainval.py:30-152).

Usage:
  python run_trainval.py joint_pose_nerf_training/synthetic sparf --scene spheres
  python run_trainval.py nerf_training_w_gt_poses/llff nerf --scene fern \
      --data_root /data/llff --train_sub 3
Extra config overrides: --k.k=v (dotted keys, yaml-parsed values).
"""
from __future__ import annotations

import argparse
import os
import sys


def build_env(args, cfg):
    """Machine-local paths: local_settings/env-vars, overridden by CLI args."""
    from sparf_tpu.admin import env_settings

    env = env_settings()
    if args.workspace_dir:
        env.workspace_dir = args.workspace_dir
    env.eval_dir = env.get("eval_dir") or os.path.join(env.workspace_dir, "eval")
    if args.data_root:
        env.llff = env.dtu = env.replica = args.data_root
    if args.dtu_mask_root:
        env.dtu_mask = args.dtu_mask_root
    if args.dtu_depth_root:
        env.dtu_depth = args.dtu_depth_root
    cfg.env = env
    return cfg


def run_training(args, extra_overrides):
    from sparf_tpu.configs.config import parse_dotted_args
    from sparf_tpu.configs.presets import get_config
    from sparf_tpu.training.define_trainer import define_trainer

    cfg = get_config(args.train_module, args.train_name)
    cfg.scene = args.scene
    if args.train_sub is not None:
        cfg.train_sub = args.train_sub if args.train_sub > 0 else None
    cfg.seed = args.seed
    cfg = build_env(args, cfg)
    if extra_overrides:
        parse_dotted_args(extra_overrides, base=cfg)

    project = os.path.join(args.train_module, args.train_name,
                           f"{args.scene}" + (f"_sub{args.train_sub}" if args.train_sub else ""))
    workspace = os.path.join(args.workspace_dir, project)

    trainer = define_trainer(cfg, workspace=workspace, debug=args.debug)

    if args.test_metrics_only:
        if not trainer.load_snapshot("latest"):
            raise FileNotFoundError(f"no snapshot to evaluate in {workspace}")
        trainer.evaluate_full(out_dir=os.path.join(cfg.env.eval_dir, project))
        return trainer
    if args.render_video_only:
        from sparf_tpu.utils.video import generate_videos_pose, generate_videos_synthesis

        if not trainer.load_snapshot("latest"):
            raise FileNotFoundError(f"no snapshot to render in {workspace}")
        generate_videos_synthesis(trainer)
        generate_videos_pose(trainer)
        return trainer

    trainer.run(load_latest=not args.no_resume)
    if cfg.get("do_eval", True) and not args.debug:
        trainer.evaluate_full(out_dir=os.path.join(cfg.env.eval_dir, project))
    return trainer


def main():
    parser = argparse.ArgumentParser(description="sparf_tpu train+eval")
    parser.add_argument("train_module", help="e.g. joint_pose_nerf_training/dtu")
    parser.add_argument("train_name", help="e.g. sparf | barf | nerf")
    parser.add_argument("--scene", required=True)
    parser.add_argument("--train_sub", type=int, default=None)
    parser.add_argument("--data_root", default="")
    parser.add_argument("--dtu_mask_root", default=None)
    parser.add_argument("--dtu_depth_root", default=None)
    parser.add_argument("--workspace_dir", default="./workspace")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--debug", type=lambda x: str(x).lower() in ("1", "true"), default=False)
    parser.add_argument("--no_resume", action="store_true")
    parser.add_argument("--render_video_only", action="store_true")
    parser.add_argument("--test_metrics_only", action="store_true")
    args, extra = parser.parse_known_args()
    run_training(args, extra)


if __name__ == "__main__":
    main()
