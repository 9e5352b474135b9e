#!/usr/bin/env python
"""Standalone evaluator (reference eval.py:34-127).

Rebuilds the trainer from a checkpoint dir's saved options.yaml, loads the
latest (or best) snapshot, runs evaluate_full with and without test-time pose
optimization, dumps JSON metrics.

  python eval.py --ckpt_dir workspace/joint_pose_nerf_training/... \
      --out_dir ./eval_out --expname myrun [--data_root ...] [--plot]
"""
from __future__ import annotations

import argparse
import json
import os


def load_model(ckpt_dir: str, data_root: str = "", which: str = "latest", debug: bool = False):
    from sparf_tpu.configs.config import ConfigDict, load_options
    from sparf_tpu.training.define_trainer import define_trainer

    options_path = os.path.join(ckpt_dir, "options.yaml")
    if not os.path.exists(options_path):
        raise FileNotFoundError(f"no options.yaml in {ckpt_dir}")
    cfg = load_options(options_path)
    if data_root:
        for k in ("llff", "dtu", "replica"):
            cfg.env[k] = data_root
    trainer = define_trainer(cfg, workspace=ckpt_dir, debug=debug, save_option=False)
    if not trainer.load_snapshot(which):
        raise FileNotFoundError(f"no snapshot found in {ckpt_dir}")
    return trainer, cfg


def run_eval(trainer, cfg, out_dir: str, expname: str, plot: bool = False,
             save_ind_files: bool = False):
    os.makedirs(out_dir, exist_ok=True)
    results = {}
    model = cfg.get("model")
    with_wo = [True, False] if model in ("joint_pose_nerf_training", "nerf_fixed_noisy_poses") \
        and cfg.optim.get("test_photo") else [False]
    for test_optim in with_wo:
        tag = "w_test_optim" if test_optim else "without_test_optim"
        if hasattr(trainer, "_test_optim_enabled"):
            res = trainer.evaluate_full(out_dir=out_dir, with_test_optim=test_optim,
                                        plot=plot, save_ind_files=save_ind_files)
        else:
            res = trainer.evaluate_full(out_dir=out_dir, plot=plot,
                                        save_ind_files=save_ind_files)
        results[tag] = res["mean"]
    results["iteration"] = trainer.iteration
    path = os.path.join(out_dir, f"{expname}.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=2, default=float)
    print(f"wrote {path}")
    return results


def main():
    parser = argparse.ArgumentParser(description="sparf_tpu standalone evaluation")
    parser.add_argument("--ckpt_dir", required=True)
    parser.add_argument("--out_dir", default="./eval_out")
    parser.add_argument("--expname", default="eval")
    parser.add_argument("--data_root", default="")
    parser.add_argument("--which", default="latest",
                        help="latest | best | iter-N | both (latest + best, "
                             "like the reference's eval_after_training x2)")
    parser.add_argument("--plot", action="store_true",
                        help="save qualitative panels per test image")
    parser.add_argument("--save_ind_files", action="store_true",
                        help="save individual pred/depth renders per test image")
    args = parser.parse_args()
    which_list = ["latest", "best"] if args.which == "both" else [args.which]
    for which in which_list:
        try:
            trainer, cfg = load_model(args.ckpt_dir, args.data_root, which)
        except FileNotFoundError as e:
            print(f"skipping {which}: {e}")
            continue
        suffix = "" if len(which_list) == 1 else f"_{which.replace('-', '')}"
        run_eval(trainer, cfg, args.out_dir, args.expname + suffix,
                 plot=args.plot, save_ind_files=args.save_ind_files)


if __name__ == "__main__":
    main()
