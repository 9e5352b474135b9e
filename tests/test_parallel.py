"""SPMD-path tests on the conftest's 8 virtual CPU devices (VERDICT r4 #3).

Covers the three claims that previously lived only in markdown / manual
`bench.py --mesh` runs:
  (a) the sharded full train step is numerically equivalent to the unsharded
      one (same seed/config),
  (b) the compiled DTU-shape step contains no large partitioner all-gathers
      (the round-4 shard_map rework's ~55 KB/step collective budget),
  (c) `dryrun_multichip(8)` — the driver's multichip entry — runs end to end.
"""
import os
import re
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sparf_tpu.configs.config import ConfigDict, override_options
from sparf_tpu.configs.presets import PRESETS
from sparf_tpu.parallel import mesh as mesh_mod

N_DEV = 8


def _make_trainer(mesh_n, full_shape: bool = False):
    import tempfile

    from sparf_tpu.training.joint_trainer import PoseAndNerfTrainerPerScene

    cfg = PRESETS["joint_pose_nerf_training/synthetic/sparf"]()
    if full_shape:
        over = ConfigDict(
            env=ConfigDict(), scene="spheres", max_iter=1000,
            synthetic=dict(H=300, W=400, n_train=3, n_test=1),
            min_nbr_matches=50, use_gt_correspondences=True,
            tpu=ConfigDict(mesh_shape=[mesh_n] if mesh_n else None,
                           donate_state=False),
        )
    else:
        over = ConfigDict(
            env=ConfigDict(), scene="spheres", max_iter=1000,
            synthetic=dict(H=24, W=32, n_train=3, n_test=1),
            arch=dict(layers_feat=[None, 64, 64, 64, 64],
                      layers_rgb=[None, 32, 3], skip=[2]),
            nerf=ConfigDict(sample_intvs=32, sample_intvs_fine=16,
                            rand_rays=16 * N_DEV),
            depth_cons_nbr_rays=16 * N_DEV,
            min_nbr_matches=50, use_gt_correspondences=True,
            tpu=ConfigDict(mesh_shape=[mesh_n] if mesh_n else None,
                           donate_state=False),
        )
    cfg = override_options(cfg, over)
    mesh_mod.set_active_mesh(None)
    return PoseAndNerfTrainerPerScene(cfg, workspace=tempfile.mkdtemp())


@pytest.fixture(autouse=True)
def _reset_mesh():
    yield
    mesh_mod.set_active_mesh(None)


def test_sharded_step_matches_unsharded():
    """Full train step on the 8-device mesh == unsharded step (same seed)."""
    assert jax.device_count() >= N_DEV
    tr = _make_trainer(N_DEV)
    assert tr.mesh is not None and tr.mesh.devices.size == N_DEV
    state1, stats1 = tr.get_step(0)(tr.state)
    loss_sharded = float(np.asarray(stats1["all"]))

    tr0 = _make_trainer(None)
    state0, stats0 = tr0.get_step(0)(tr0.state)
    loss_ref = float(np.asarray(stats0["all"]))

    assert np.isfinite(loss_sharded)
    assert abs(loss_sharded - loss_ref) < 1e-4, (loss_sharded, loss_ref)
    # the updated parameters must agree too (grad agreement, not just loss)
    flat1 = jax.tree_util.tree_leaves(jax.device_get(state1.nerf_params))
    flat0 = jax.tree_util.tree_leaves(jax.device_get(state0.nerf_params))
    for a, b in zip(flat1, flat0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def _collective_payload_bytes(hlo: str):
    """Per-collective-kind payload bytes parsed from compiled HLO text."""
    dtype_bytes = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                   "pred": 1, "f64": 8, "s64": 8}
    out = {}
    for kind in ("all-reduce", "all-gather", "reduce-scatter",
                 "collective-permute"):
        total, largest = 0, 0
        for m in re.finditer(
            r"= (?:\()?([a-z0-9]+)\[([0-9,]*)\][^=]*? " + kind + r"\(", hlo
        ):
            dt, dims = m.group(1), m.group(2)
            n_elem = 1
            for d in dims.split(","):
                if d:
                    n_elem *= int(d)
            nbytes = n_elem * dtype_bytes.get(dt, 4)
            total += nbytes
            largest = max(largest, nbytes)
        out[kind] = (total, largest)
    return out


def test_dtu_shape_collectives_bounded():
    """Compiled DTU-shape fine-stage step: no all-gather above 1 MB and a
    bounded total collective payload (the 244 MB -> ~55 KB shard_map rework,
    renderer.py shard_map MLP path; PERF_NOTES round-4 findings)."""
    tr = _make_trainer(N_DEV, full_shape=True)
    step = tr.get_step(int(tr.cfg.max_iter * 0.35))  # fine stage
    hlo = jax.jit(lambda s: step(s)).lower(tr.state).compile().as_text()
    payload = _collective_payload_bytes(hlo)
    ag_total, ag_largest = payload["all-gather"]
    assert ag_largest < 1 << 20, f"largest all-gather {ag_largest} bytes"
    total = sum(t for t, _ in payload.values())
    assert total < 4 << 20, f"total collective payload {total} bytes: {payload}"
    # sanity: the step IS sharded (some cross-device communication exists)
    assert total > 0, "no collectives at all — sharding did not engage?"


def test_dryrun_multichip_smoke():
    """The driver's multichip dryrun, in-process on the virtual CPU mesh."""
    root = os.path.join(os.path.dirname(__file__), "..")
    sys.path.insert(0, root)
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(N_DEV)
