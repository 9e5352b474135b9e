"""SPMD scale-out over a 1-D device mesh.

Design (SURVEY.md section 5.8): the workload is embarrassingly parallel over
rays — each chip renders a shard of the ray batch; the loss reduction becomes
a psum XLA inserts automatically. Parameters (~600k-param MLP + a few pose
vectors) are replicated; no TP/PP needed at this scale. The whole scene fits
in every chip's HBM, so scene tensors are replicated too.

Mechanism: the jitted train step is annotated with
`jax.lax.with_sharding_constraint` on the sampled ray tensors (axis 0 sharded
over 'data'); GSPMD propagates the sharding through PE->MLP->compositing and
inserts the cross-chip reduction for the scalar loss. A module-level active
mesh keeps the loss builders free of plumbing; `None` means single-device.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_ACTIVE_MESH: Optional[Mesh] = None


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over the ray-batch ('data') axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("data",))


def set_active_mesh(mesh: Optional[Mesh]) -> None:
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def active_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH


def shard_rays(x: jax.Array, axis: int = 0) -> jax.Array:
    """Constrain a per-ray tensor to be sharded over 'data' along `axis`.

    No-op without an active mesh. Call inside jit on the sampled ray indices /
    pixels; GSPMD propagates to everything downstream.
    """
    mesh = _ACTIVE_MESH
    if mesh is None:
        return x
    spec = [None] * x.ndim
    spec[axis] = "data"
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))


def replicate_tree(tree, mesh: Optional[Mesh] = None):
    """Place a pytree fully replicated on the mesh."""
    mesh = mesh or _ACTIVE_MESH
    if mesh is None:
        return tree
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def pad_to_multiple(n: int, mesh: Optional[Mesh] = None) -> int:
    """Round a ray count up so it divides evenly across the mesh."""
    mesh = mesh or _ACTIVE_MESH
    if mesh is None:
        return n
    d = mesh.devices.size
    return -(-n // d) * d
