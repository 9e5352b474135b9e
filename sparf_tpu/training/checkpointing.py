"""Checkpoint save/load with orbax (reference base_trainer.py:162-360 semantics).

Snapshot contents mirror the reference: {iteration, iteration_nerf, state
(full TrainState incl. optimizer states), best_val, epoch_of_best_val}.
Cadence/GC: every snapshot_steps -> `iter-N/`, keep last 2; `model_best/` on
validation improvement. LR needs no fast-forward on resume — schedules are
closed-form in the step counter and optimizer counts are restored with the
state.
"""
from __future__ import annotations

import os
import re
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


def _ckpt_dir(workspace: str, name: str) -> str:
    return os.path.join(os.path.abspath(workspace), name)


def save_snapshot(
    workspace: str,
    state,
    best_val: float,
    epoch_of_best_val: int,
    keep_last: int = 2,
    is_best: bool = False,
) -> str:
    """Save `iter-N` snapshot (+ `model_best` when is_best); GC old ones."""
    iteration = int(np.asarray(state.iteration))
    payload = {
        "state": state,
        "meta": {
            "iteration": iteration,
            "iteration_nerf": int(np.asarray(state.iteration_nerf)),
            "best_val": float(best_val),
            "epoch_of_best_val": int(epoch_of_best_val),
        },
    }
    ckptr = ocp.StandardCheckpointer()
    path = _ckpt_dir(workspace, f"iter-{iteration}")
    if os.path.exists(path):
        shutil.rmtree(path)
    ckptr.save(path, payload)
    ckptr.wait_until_finished()
    if is_best:
        best_path = _ckpt_dir(workspace, "model_best")
        if os.path.exists(best_path):
            shutil.rmtree(best_path)
        ckptr.save(best_path, payload)
        ckptr.wait_until_finished()
    delete_old_checkpoints(workspace, keep_last)
    return path


def delete_old_checkpoints(workspace: str, keep_last: int = 2) -> None:
    """Keep only the newest `keep_last` iter-N snapshots (base_trainer.py:165-175)."""
    snaps = list_snapshots(workspace)
    for it, path in snaps[:-keep_last] if keep_last > 0 else snaps:
        shutil.rmtree(path, ignore_errors=True)


def list_snapshots(workspace: str):
    """Sorted [(iteration, path)] of iter-N snapshot dirs."""
    out = []
    if not os.path.isdir(workspace):
        return out
    for d in os.listdir(workspace):
        m = re.fullmatch(r"iter-(\d+)", d)
        if m:
            # absolute: orbax restore rejects relative paths (a run launched
            # from the repo root with the default relative workspace would
            # crash on resume otherwise)
            out.append((int(m.group(1)), os.path.join(os.path.abspath(workspace), d)))
    return sorted(out)


def load_snapshot(
    workspace: str,
    abstract_state,
    which: str = "latest",
) -> Optional[Tuple[Any, Dict]]:
    """Load ('latest' | 'best' | 'iter-N') into the abstract TrainState layout.

    Returns (state, meta) or None when no snapshot exists.
    """
    if which == "best":
        path = _ckpt_dir(workspace, "model_best")
        if not os.path.exists(path):
            return None
    elif which == "latest":
        snaps = list_snapshots(workspace)
        if not snaps:
            return None
        path = snaps[-1][1]
    else:
        path = _ckpt_dir(workspace, which)
        if not os.path.exists(path):
            return None
    ckptr = ocp.StandardCheckpointer()
    abstract = {
        "state": jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, abstract_state),
        "meta": {
            "iteration": 0,
            "iteration_nerf": 0,
            "best_val": 0.0,
            "epoch_of_best_val": 0,
        },
    }
    restored = ckptr.restore(path, abstract)
    return restored["state"], restored["meta"]
