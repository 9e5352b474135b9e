"""Fused NeRF-MLP forward+backward as Pallas TPU kernels (custom VJP).

PERF_NOTES.md finding: XLA keeps the forward matmuls on the MXU but the
backward dW = acts^T @ grads contractions lower to HBM-bandwidth-bound kLoop
fusions (activations live in HBM between layers). This kernel pair removes the
HBM round-trips entirely:

  forward kernel:  stream encoded points in, weights VMEM-resident, emit only
                   [raw_density | raw_rgb] (4 lanes) — nothing else saved;
  backward kernel: per point-tile, RECOMPUTE the forward activations in VMEM
                   (flash-attention-style rematerialization), then run the
                   backward chain in VMEM: dW accumulated across grid steps in
                   the revisited output blocks (MXU GEMMs), dX streamed out.

Gradients flow to pts_enc / view_enc too, so pose gradients (which enter via
the encoded 3D points) are exact. PE and the output activations stay in XLA —
they're cheap and autodiff handles them around the custom_vjp boundary.

Bit-parity with the XLA path is tested in interpret mode and on device.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparf_tpu.models import nerf_mlp
from sparf_tpu.models import renderer as renderer_mod
from sparf_tpu.models.nerf_mlp import MLPConfig
from sparf_tpu.ops.fused_mlp import _pad_to, pack_weights

Array = jax.Array

TILE_T = 512  # 1024 exceeds VMEM (weights + dW + 10 activation tiles)


def _mm(x, w, dtype):
    return jnp.dot(x.astype(dtype), w.astype(dtype), preferred_element_type=jnp.float32)


def _forward_tile(cfg: MLPConfig, meta: dict, dtype, pts_enc, view_enc, w_list):
    """Forward over one tile keeping every layer INPUT in a python list.

    Returns (raw_density (T,1), raw_rgb (T,3), xs); relu masks for the
    backward are derived from the next layer's input (post-relu values > 0),
    so pre-activations never need to stay live.
    """
    n_feat, n_rgb = meta["n_feat"], meta["n_rgb"]
    feat_dim = meta["feat_dim"]
    xs = []
    feat = pts_enc
    raw_density = None
    for li in range(n_feat):
        W, b = w_list[2 * li], w_list[2 * li + 1]
        x = jnp.concatenate([feat, pts_enc], axis=-1) if li in meta["skip"] else feat
        z = _mm(x, W, dtype) + b
        xs.append(x)
        if li == n_feat - 1:
            raw_density = z[:, 0:1]
            body = z[:, 1 : 1 + feat_dim]
            pad = _pad_to(feat_dim) - feat_dim
            if pad:
                body = jnp.concatenate([body, jnp.zeros((z.shape[0], pad), z.dtype)], -1)
            feat = jnp.maximum(body, 0.0)
        else:
            feat = jnp.maximum(z, 0.0)

    if cfg.view_dep:
        feat = jnp.concatenate([feat, view_enc], axis=-1)
    raw_rgb = None
    for li in range(n_rgb):
        W, b = w_list[2 * (n_feat + li)], w_list[2 * (n_feat + li) + 1]
        z = _mm(feat, W, dtype) + b
        xs.append(feat)
        if li == n_rgb - 1:
            raw_rgb = z[:, :3]
        else:
            feat = jnp.maximum(z, 0.0)
    return raw_density, raw_rgb, xs


def _bwd_kernel(cfg: MLPConfig, meta: dict, dtype, *refs):
    """refs = [pts_enc, view_enc, gout, W0,b0..Wk,bk,
               d_pts, d_view, dW0, db0, .., dWk, dbk]."""
    n_feat, n_rgb = meta["n_feat"], meta["n_rgb"]
    n_layers = n_feat + n_rgb
    feat_dim = meta["feat_dim"]
    feat_dim_p = _pad_to(feat_dim)
    d_in_p = meta["d_in_p"]

    pts_ref, view_ref, gout_ref = refs[0], refs[1], refs[2]
    w_refs = refs[3 : 3 + 2 * n_layers]
    out_refs = refs[3 + 2 * n_layers :]
    d_pts_ref, d_view_ref = out_refs[0], out_refs[1]
    dw_refs = out_refs[2:]

    first_step = pl.program_id(0) == 0

    pts_enc = pts_ref[:]
    view_enc = view_ref[:]
    w_list = [r[:] for r in w_refs]
    raw_density, raw_rgb, xs = _forward_tile(cfg, meta, dtype, pts_enc, view_enc, w_list)

    def relu_mask_into_layer(li):
        """relu mask of z_{li-1} = (input of layer li, feature part) > 0."""
        x = xs[li]
        if li < n_feat and li in meta["skip"]:
            return x[:, : x.shape[1] - d_in_p] > 0
        if li == n_feat and cfg.view_dep:
            return x[:, :feat_dim_p] > 0
        return x > 0

    gout = gout_ref[:]
    g_density = gout[:, 0:1]   # (T,1)
    g_rgb = gout[:, 1:4]       # (T,3)

    T = pts_enc.shape[0]
    d_pts = jnp.zeros((T, d_in_p), jnp.float32)

    def accum(ref, val):
        @pl.when(first_step)
        def _():
            ref[:] = jnp.zeros_like(ref)
        ref[:] += val

    # ---- rgb head backward: last layer's z-grad lives on the rgb lanes only
    last_w = w_list[2 * (n_layers - 1)]
    g_z = jnp.concatenate(
        [g_rgb, jnp.zeros((T, last_w.shape[1] - 3), jnp.float32)], axis=-1
    )
    for li in range(n_layers - 1, n_feat - 1, -1):
        x = xs[li]
        accum(dw_refs[2 * li], _mm(x.T, g_z, dtype))
        accum(dw_refs[2 * li + 1], jnp.sum(g_z, axis=0, keepdims=True))
        g_x = _mm(g_z, w_list[2 * li].T, dtype)
        if li > n_feat:
            g_z = g_x * relu_mask_into_layer(li)
        else:
            # li == n_feat: first rgb layer; x was [feat_relu | view_enc]
            g_feat_relu = g_x[:, :feat_dim_p]
            if cfg.view_dep:
                d_view_ref[:] = g_x[:, feat_dim_p:]
            else:
                d_view_ref[:] = jnp.zeros_like(d_view_ref)
            g_feat = g_feat_relu * relu_mask_into_layer(n_feat)
            # rebuild gradient on the last trunk z: [g_density | g_feat | 0 pad]
            last_trunk_out = w_list[2 * (n_feat - 1)].shape[1]
            g_z = jnp.concatenate(
                [g_density, g_feat[:, :feat_dim],
                 jnp.zeros((T, last_trunk_out - 1 - feat_dim), jnp.float32)], axis=-1
            )

    # ---- trunk backward
    for li in range(n_feat - 1, -1, -1):
        x = xs[li]
        accum(dw_refs[2 * li], _mm(x.T, g_z, dtype))
        accum(dw_refs[2 * li + 1], jnp.sum(g_z, axis=0, keepdims=True))
        g_x = _mm(g_z, w_list[2 * li].T, dtype)
        if li in meta["skip"]:
            prev_p = x.shape[1] - d_in_p  # padded prev feat width
            g_feat_part = g_x[:, :prev_p]
            d_pts += g_x[:, prev_p:]
            g_x = g_feat_part
        if li > 0:
            g_z = g_x * relu_mask_into_layer(li)
        else:
            d_pts += g_x
    d_pts_ref[:] = d_pts


def _fwd_kernel(cfg: MLPConfig, meta: dict, dtype, *refs):
    pts_ref, view_ref = refs[0], refs[1]
    n_layers = meta["n_feat"] + meta["n_rgb"]
    w_refs = refs[2 : 2 + 2 * n_layers]
    out_ref = refs[-1]
    w_list = [r[:] for r in w_refs]
    raw_density, raw_rgb, _ = _forward_tile(
        cfg, meta, dtype, pts_ref[:], view_ref[:], w_list
    )
    T = raw_density.shape[0]
    out_ref[:] = jnp.concatenate(
        [raw_density, raw_rgb, jnp.zeros((T, 128 - 4), jnp.float32)], axis=-1
    )


def _pad_T(x: Array, T_pad: int, lane_pad: int) -> Array:
    return jnp.pad(x, ((0, T_pad - x.shape[0]), (0, lane_pad - x.shape[1])))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_mlp_core(cfg: MLPConfig, params: Dict[str, Any], pts_enc: Array, view_enc: Array):
    """(raw_density (T,), raw_rgb (T,3)) with a fully fused Pallas VJP."""
    return _core_forward(cfg, params, pts_enc, view_enc)


def _specs_and_ops(cfg, params):
    ops, meta = pack_weights(params, cfg)
    return ops, meta


def _core_forward(cfg, params, pts_enc, view_enc):
    ops, meta = _specs_and_ops(cfg, params)
    T = pts_enc.shape[0]
    T_pad = -(-T // TILE_T) * TILE_T
    d_in_p, d_view_p = meta["d_in_p"], meta["d_view_p"]
    pts_p = _pad_T(pts_enc, T_pad, d_in_p)
    view_p = _pad_T(view_enc, T_pad, d_view_p)
    grid = (T_pad // TILE_T,)
    in_specs = [
        pl.BlockSpec((TILE_T, d_in_p), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE_T, d_view_p), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for w in ops]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, cfg, meta, cfg.compute_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TILE_T, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T_pad, 128), jnp.float32),
    )(pts_p, view_p, *ops)
    return out[:T, 0], out[:T, 1:4]


def _core_fwd(cfg, params, pts_enc, view_enc):
    out = _core_forward(cfg, params, pts_enc, view_enc)
    return out, (params, pts_enc, view_enc)


def _core_bwd(cfg, residuals, grads):
    params, pts_enc, view_enc = residuals
    g_density, g_rgb = grads
    ops, meta = _specs_and_ops(cfg, params)
    n_layers = meta["n_feat"] + meta["n_rgb"]
    T = pts_enc.shape[0]
    T_pad = -(-T // TILE_T) * TILE_T
    d_in_p, d_view_p = meta["d_in_p"], meta["d_view_p"]

    pts_p = _pad_T(pts_enc, T_pad, d_in_p)
    view_p = _pad_T(view_enc, T_pad, d_view_p)
    gout = jnp.concatenate(
        [g_density[:, None], g_rgb, jnp.zeros((T, 124), jnp.float32)], axis=-1
    )
    gout = jnp.pad(gout, ((0, T_pad - T), (0, 0)))

    grid = (T_pad // TILE_T,)
    in_specs = [
        pl.BlockSpec((TILE_T, d_in_p), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE_T, d_view_p), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE_T, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for w in ops]

    out_shapes = [
        jax.ShapeDtypeStruct((T_pad, d_in_p), jnp.float32),
        jax.ShapeDtypeStruct((T_pad, d_view_p), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((TILE_T, d_in_p), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE_T, d_view_p), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    for w in ops:  # dW/db accumulated in revisited blocks
        out_shapes.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
        out_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, cfg, meta, cfg.compute_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
    )(pts_p, view_p, gout, *ops)

    d_pts = outs[0][:T, : pts_enc.shape[1]]
    d_view = outs[1][:T, : view_enc.shape[1]]
    d_ops = outs[2:]

    # unpack padded (in,out) grads back into the params pytree layout (out,in)
    d_params = _unpack_weight_grads(cfg, meta, params, d_ops)
    return d_params, d_pts, d_view


def _unpack_weight_grads(cfg, meta, params, d_ops):
    d_in = meta["d_in"]
    feat_dim = meta["feat_dim"]
    d_feat, d_rgb = [], []
    k = 0
    for li, (W, b) in enumerate(params["feat"]):
        out_dim, in_dim = W.shape
        dWp, dbp = d_ops[k], d_ops[k + 1]
        k += 2
        if li in cfg.skip:
            prev = in_dim - d_in
            dW = jnp.concatenate(
                [dWp[:prev, :out_dim].T,
                 dWp[_pad_to(prev) : _pad_to(prev) + d_in, :out_dim].T], axis=1
            )
        else:
            dW = dWp[:in_dim, :out_dim].T
        d_feat.append((dW, dbp[0, :out_dim]))
    for li, (W, b) in enumerate(params["rgb"]):
        out_dim, in_dim = W.shape
        dWp, dbp = d_ops[k], d_ops[k + 1]
        k += 2
        if li == 0 and cfg.view_dep:
            d_view_dim = in_dim - feat_dim
            dW = jnp.concatenate(
                [dWp[:feat_dim, :out_dim].T,
                 dWp[_pad_to(feat_dim) : _pad_to(feat_dim) + d_view_dim, :out_dim].T],
                axis=1,
            )
        else:
            dW = dWp[:in_dim, :out_dim].T
        d_rgb.append((dW, dbp[0, :out_dim]))
    return {"feat": d_feat, "rgb": d_rgb}


fused_mlp_core.defvjp(_core_fwd, _core_bwd)


def nerf_apply_fused_vjp(
    params: Dict[str, Any],
    cfg: MLPConfig,
    pts: Array,
    ray: Array,
    progress: Array,
    density_noise_key: Optional[Array] = None,
) -> Dict[str, Array]:
    """Drop-in nerf_apply with the fused custom-VJP kernel for the MLP chain."""
    B, R, S, _ = pts.shape
    pts_enc = nerf_mlp.encode_points(cfg, pts, progress).reshape(B * R * S, -1)
    if cfg.view_dep:
        ray_unit = ray / (jnp.linalg.norm(ray, axis=-1, keepdims=True) + 1e-12)
        view = nerf_mlp.encode_views(cfg, ray_unit, progress)
        view_enc = jnp.broadcast_to(view[:, :, None, :], (B, R, S, view.shape[-1]))
        view_enc = view_enc.reshape(B * R * S, -1)
    else:
        view_enc = jnp.zeros((B * R * S, 1), pts_enc.dtype)

    raw_density, raw_rgb = fused_mlp_core(cfg, params, pts_enc, view_enc)
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


renderer_mod.register_forward_impl("pallas_vjp", nerf_apply_fused_vjp)
