"""Loss factory: maps cfg.loss_type substrings to loss builders
(reference loss_factory.py:25-42).

Each entry returns a `make(fine_enabled) -> LossBuilder` callable; the trainer
composes them with the always-on photometric builder inside the jitted step.
"""
from __future__ import annotations

from typing import Callable, List


def build_extra_loss_builders(trainer) -> List[Callable]:
    cfg = trainer.cfg
    loss_type = cfg.get("loss_type", "photometric") or "photometric"
    builders: List[Callable] = []

    if "corres" in loss_type:
        from sparf_tpu.training.losses.corres import make_corres_loss_builder

        builders.append(make_corres_loss_builder(trainer))

    if "depth_cons" in loss_type:
        from sparf_tpu.training.losses.depth_cons import make_depth_cons_loss_builder

        builders.append(make_depth_cons_loss_builder(trainer))

    if "SparseCOLMAPDepthLoss" in loss_type:
        from sparf_tpu.training.losses.colmap_depth import make_colmap_depth_loss_builder

        builders.append(make_colmap_depth_loss_builder(trainer))

    return builders
