"""Fused NeRF-MLP forward as a Pallas TPU kernel.

Motivation: the XLA path writes each layer's activations to HBM between the
10 matmuls of the trunk+rgb chain (~(T,256) f32 per layer). For the typical
eval tile (T = rays x samples ~ 2.6e5) that's ~2 GB of HBM round-trips per
forward — comparable to the MXU time, i.e. the forward is ~2x memory-bound.
This kernel keeps ALL weights and the activation tile resident in VMEM and
streams only the encoded points in and 4 output lanes out.

Scope: forward only (no custom VJP yet) — used on the no-grad paths: full
image rendering at val/eval time, and the depth-consistency visibility pass
(whose params are stop_gradient'ed). Training matmuls stay on the XLA path.

Layout: feature dims padded to 128-lane multiples; weights are packed into
right-padded (in,out) matrices once per call (XLA hoists the padding). The
kernel grid tiles the flattened point dimension.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparf_tpu.models import nerf_mlp
from sparf_tpu.models import renderer as renderer_mod
from sparf_tpu.models.nerf_mlp import MLPConfig

Array = jax.Array

TILE_T = 512


def _pad_to(x: int, m: int = 128) -> int:
    return -(-x // m) * m


def pack_weights(params: Dict[str, Any], cfg: MLPConfig) -> Tuple[List[Array], dict]:
    """Pack (out,in) torch-style weights into padded (in_pad, out_pad) matmul
    operands + (1, out_pad) biases. Returns (flat operand list, static meta).

    Skip layers get their input rows laid out as [feat | pts_enc] to match the
    kernel's concat order.
    """
    d_in = cfg.input_3d_dim
    d_view = cfg.input_view_dim
    d_in_p = _pad_to(d_in)
    d_view_p = _pad_to(max(d_view, 1))
    feat_dim = cfg.layers_feat[-1]

    ops: List[Array] = []
    meta = dict(d_in=d_in, d_in_p=d_in_p, d_view=d_view, d_view_p=d_view_p,
                feat_dim=feat_dim, skip=tuple(cfg.skip), n_feat=len(params["feat"]),
                n_rgb=len(params["rgb"]))

    in_dim_p = d_in_p
    for li, (W, b) in enumerate(params["feat"]):
        out_dim, in_dim = W.shape
        out_p = _pad_to(out_dim)
        if li in cfg.skip:
            # real in = prev_feat + d_in; kernel concat is [feat | pts_enc]
            prev = in_dim - d_in
            in_p = _pad_to(prev) + d_in_p
            Wp = jnp.zeros((in_p, out_p), W.dtype)
            Wp = Wp.at[:prev, :out_dim].set(W[:, :prev].T)
            Wp = Wp.at[_pad_to(prev) : _pad_to(prev) + d_in, :out_dim].set(W[:, prev:].T)
        else:
            in_p = in_dim_p
            Wp = jnp.zeros((in_p, out_p), W.dtype)
            Wp = Wp.at[:in_dim, :out_dim].set(W.T)
        bp = jnp.zeros((1, out_p), b.dtype).at[0, :out_dim].set(b)
        ops += [Wp, bp]
        in_dim_p = _pad_to(out_dim)

    # rgb head: input = [feat | view_enc] (feat only when not view_dep)
    in_dim_p = _pad_to(feat_dim) + (d_view_p if cfg.view_dep else 0)
    for li, (W, b) in enumerate(params["rgb"]):
        out_dim, in_dim = W.shape
        out_p = _pad_to(out_dim)
        Wp = jnp.zeros((in_dim_p, out_p), W.dtype)
        if li == 0 and cfg.view_dep:
            Wp = Wp.at[:feat_dim, :out_dim].set(W[:, :feat_dim].T)
            Wp = Wp.at[_pad_to(feat_dim) : _pad_to(feat_dim) + d_view, :out_dim].set(
                W[:, feat_dim:].T
            )
        else:
            Wp = Wp.at[:in_dim, :out_dim].set(W.T)
        bp = jnp.zeros((1, out_p), b.dtype).at[0, :out_dim].set(b)
        ops += [Wp, bp]
        in_dim_p = out_p
    return ops, meta


def _kernel(cfg: MLPConfig, meta: dict, compute_dtype, *refs):
    """refs = [pts_enc, view_enc, W0,b0,...,Wk,bk, out]."""
    pts_ref, view_ref = refs[0], refs[1]
    n_feat, n_rgb = meta["n_feat"], meta["n_rgb"]
    w_refs = refs[2 : 2 + 2 * (n_feat + n_rgb)]
    out_ref = refs[-1]

    def mm(x, w_ref, b_ref):
        y = jnp.dot(
            x.astype(compute_dtype),
            w_ref[:].astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        return y + b_ref[:]

    pts_enc = pts_ref[:]  # (T, d_in_p)
    feat = pts_enc
    raw_density = None
    for li in range(n_feat):
        W, b = w_refs[2 * li], w_refs[2 * li + 1]
        if li in meta["skip"]:
            feat = jnp.concatenate([feat, pts_enc], axis=-1)
        feat = mm(feat, W, b)
        if li == n_feat - 1:
            raw_density = feat[:, 0:1]  # (T,1)
            # drop the density unit; repad feature lanes
            feat = feat[:, 1 : 1 + meta["feat_dim"]]
            pad = _pad_to(meta["feat_dim"]) - meta["feat_dim"]
            if pad:
                feat = jnp.concatenate(
                    [feat, jnp.zeros((feat.shape[0], pad), feat.dtype)], axis=-1
                )
        feat = jnp.maximum(feat, 0.0)

    if cfg.view_dep:
        feat = jnp.concatenate([feat, view_ref[:]], axis=-1)
    for li in range(n_rgb):
        W, b = w_refs[2 * (n_feat + li)], w_refs[2 * (n_feat + li) + 1]
        feat = mm(feat, W, b)
        if li != n_rgb - 1:
            feat = jnp.maximum(feat, 0.0)

    T = feat.shape[0]
    zeros_pad = jnp.zeros((T, 128 - 4), jnp.float32)
    out_ref[:] = jnp.concatenate(
        [raw_density.astype(jnp.float32), feat[:, :3].astype(jnp.float32), zeros_pad],
        axis=-1,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def fused_mlp_forward(
    params: Dict[str, Any], cfg: MLPConfig, pts_enc: Array, view_enc: Array,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """(raw_density (T,), raw_rgb (T,3)) from encoded points/views (T, d)."""
    T = pts_enc.shape[0]
    ops, meta = pack_weights(params, cfg)
    d_in_p = meta["d_in_p"]
    d_view_p = meta["d_view_p"]

    T_pad = -(-T // TILE_T) * TILE_T
    pts_enc = jnp.pad(pts_enc, ((0, T_pad - T), (0, d_in_p - pts_enc.shape[1])))
    view_enc = jnp.pad(view_enc, ((0, T_pad - T), (0, d_view_p - view_enc.shape[1])))

    grid = (T_pad // TILE_T,)
    in_specs = [
        pl.BlockSpec((TILE_T, d_in_p), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE_T, d_view_p), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    for w in ops:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((TILE_T, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)

    kernel = functools.partial(_kernel, cfg, meta, cfg.compute_dtype)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((T_pad, 128), jnp.float32),
        interpret=interpret,
    )(pts_enc, view_enc, *ops)
    return out[:T, 0], out[:T, 1:4]


def nerf_apply_pallas(
    params: Dict[str, Any],
    cfg: MLPConfig,
    pts: Array,
    ray: Array,
    progress: Array,
    density_noise_key: Optional[Array] = None,
    interpret: bool = False,
) -> Dict[str, Array]:
    """Drop-in replacement for nerf_mlp.nerf_apply using the fused kernel.

    PE stays in XLA (fuses into the kernel's input producer); the 10-matmul
    chain runs in one Pallas program.
    """
    B, R, S, _ = pts.shape
    pts_enc = nerf_mlp.encode_points(cfg, pts, progress).reshape(B * R * S, -1)
    if cfg.view_dep:
        ray_unit = ray / (jnp.linalg.norm(ray, axis=-1, keepdims=True) + 1e-12)
        view = nerf_mlp.encode_views(cfg, ray_unit, progress)  # (B,R,dv)
        view_enc = jnp.broadcast_to(view[:, :, None, :], (B, R, S, view.shape[-1]))
        view_enc = view_enc.reshape(B * R * S, -1)
    else:
        view_enc = jnp.zeros((B * R * S, 1), pts_enc.dtype)

    raw_density, raw_rgb = fused_mlp_forward(params, cfg, pts_enc, view_enc,
                                             interpret=interpret)
    if density_noise_key is not None and cfg.density_noise_reg:
        raw_density = raw_density + (
            jax.random.normal(density_noise_key, raw_density.shape) * cfg.density_noise_reg
        )
    density = nerf_mlp.density_activation(raw_density, cfg.density_activ)
    rgb = jax.nn.sigmoid(raw_rgb)
    return dict(
        rgb_samples=rgb.reshape(B, R, S, 3),
        density_samples=density.reshape(B, R, S),
    )


def nerf_apply_pallas_interpret(params, cfg, pts, ray, progress, density_noise_key=None):
    return nerf_apply_pallas(params, cfg, pts, ray, progress, density_noise_key,
                             interpret=True)


renderer_mod.register_forward_impl("pallas", nerf_apply_pallas)
renderer_mod.register_forward_impl("pallas_interpret", nerf_apply_pallas_interpret)
