"""Fused NeRF-MLP forward+backward as Pallas TPU kernels (custom VJP).

PERF_NOTES.md findings (rounds 1+3): XLA keeps the forward matmuls on the MXU
but (a) the backward dW = acts^T @ grads contractions lower to
HBM-bandwidth-bound kLoop fusions, and (b) the positional-encoding + lane-pad
glue around the kernels moves ~1-1.5 KB of HBM traffic per sample point and
several ms/step of kLoop fusion time. This kernel pair removes both:

  forward kernel:  stream RAW points + view dirs in ((T,8) packed: 24 real
                   bytes/point), build PE (+BARF c2f mask) in VMEM, weights
                   VMEM-resident, emit only [raw_density | raw_rgb] ((T,8),
                   4 real lanes);
  backward kernel: per point-tile, RECOMPUTE encoding + forward activations in
                   VMEM (flash-attention-style rematerialization), then run
                   the backward chain in VMEM: dW accumulated across grid
                   steps in revisited VMEM blocks (MXU GEMMs), and the PE
                   backward contracted to raw d_pts/d_dirs (T,8) via a small
                   channel-selector matmul.

Gradients flow to pts / view dirs, so pose gradients (which enter via the 3D
points and ray directions) are exact. The c2f frequency weights arrive as a
tiny aux operand computed from `progress` in XLA (no gradient — progress is
an iteration-derived schedule, matching the reference where PE progress is a
buffer, frequency_nerf.py:79-85).

Bit-parity with the XLA path (nerf_mlp.nerf_apply) is tested in interpret
mode and on device (tests/test_ops.py).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparf_tpu.models import embedder, nerf_mlp
from sparf_tpu.models import renderer as renderer_mod
from sparf_tpu.models.nerf_mlp import MLPConfig
from sparf_tpu.ops.fused_mlp import _pad_to, pack_weights

Array = jax.Array

TILE_T = 512  # 1024 exceeds VMEM (weights + dW + 10 activation tiles)


def _mm(x, w, dtype):
    return jnp.dot(x.astype(dtype), w.astype(dtype), preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# in-kernel positional encoding (channel-major [sin x L | cos x L] per channel,
# exactly embedder.positional_encoding's layout)
# ---------------------------------------------------------------------------


def _pe_aux(L: int, progress, include_pi: bool, log_sampling: bool, c2f) -> Array:
    """(8, 3*2L) aux operand: row0 freq, row1 c2f weight, row2 is_sin."""
    if L <= 0:
        return jnp.zeros((8, 128), jnp.float32)
    freq = embedder.frequency_bands(L, include_pi, log_sampling)  # (L,)
    w = embedder.c2f_weights(progress, L, c2f)
    if w is None:
        w = jnp.ones((L,), jnp.float32)
    within = jnp.arange(2 * L)
    fcol = freq[within % L]
    wcol = w[within % L]
    scol = (within < L).astype(jnp.float32)
    aux = jnp.zeros((8, 3 * 2 * L), jnp.float32)
    aux = aux.at[0].set(jnp.tile(fcol, 3))
    aux = aux.at[1].set(jnp.tile(wcol, 3))
    aux = aux.at[2].set(jnp.tile(scol, 3))
    return aux


def _tile_channels(x3, twoL: int):
    """(T,3) -> (T, 3*twoL) channel-major: [x*twoL | y*twoL | z*twoL]."""
    parts = [x3[:, c : c + 1] * jnp.ones((1, twoL), x3.dtype) for c in range(3)]
    return jnp.concatenate(parts, axis=1)


def _encode_tile(x3, aux, L: int, add_raw: bool):
    """PE(+c2f)+optional raw concat, all in VMEM. Returns (enc, tiled)."""
    if L <= 0:
        return x3, None
    twoL = 2 * L
    f = aux[0:1, : 3 * twoL]
    w = aux[1:2, : 3 * twoL]
    s = aux[2:3, : 3 * twoL]
    tiled = _tile_channels(x3, twoL)
    spec = tiled * f
    enc = jnp.where(s > 0.5, jnp.sin(spec), jnp.cos(spec)) * w
    if add_raw:
        enc = jnp.concatenate([x3, enc], axis=1)
    return enc, tiled


def _encode_tile_bwd(d_enc, x3, aux, L: int, add_raw: bool):
    """d(enc) (T, d_real) -> d(x3) (T,3)."""
    if L <= 0:
        return d_enc[:, :3]
    twoL = 2 * L
    n = 3 * twoL
    f = aux[0:1, :n]
    w = aux[1:2, :n]
    s = aux[2:3, :n]
    tiled = _tile_channels(x3, twoL)
    spec = tiled * f
    if add_raw:
        d_raw, d_pe = d_enc[:, :3], d_enc[:, 3:]
    else:
        d_raw, d_pe = None, d_enc
    # d/dx sin = cos, d/dx cos = -sin; chain through the c2f weight and freq
    d_tiled = d_pe * w * f * jnp.where(s > 0.5, jnp.cos(spec), -jnp.sin(spec))
    # contract the per-channel column groups back to 3 dims on the MXU
    col = jax.lax.broadcasted_iota(jnp.int32, (n, 3), 0) // twoL
    dim = jax.lax.broadcasted_iota(jnp.int32, (n, 3), 1)
    sel = (col == dim).astype(jnp.float32)
    d_x3 = jnp.dot(d_tiled, sel, preferred_element_type=jnp.float32)
    if d_raw is not None:
        d_x3 = d_x3 + d_raw
    return d_x3


def _pad_lanes(x, width: int):
    pad = width - x.shape[1]
    if pad <= 0:
        return x
    return jnp.concatenate([x, jnp.zeros((x.shape[0], pad), x.dtype)], axis=1)


def _encode_inputs(cfg: MLPConfig, meta, pd_ref, aux3_ref, auxv_ref):
    """Build the padded (T, d_in_p)/(T, d_view_p) encodings from raw inputs."""
    pd = pd_ref[:]
    x3 = pd[:, 0:3]
    enc3, _ = _encode_tile(x3, aux3_ref[:], cfg.L_3D, cfg.add_raw_3D_points)
    pts_enc = _pad_lanes(enc3, meta["d_in_p"])
    if cfg.view_dep:
        dirs = pd[:, 3:6]
        encv, _ = _encode_tile(dirs, auxv_ref[:], cfg.L_view, cfg.add_raw_rays)
        view_enc = _pad_lanes(encv, meta["d_view_p"])
    else:
        view_enc = jnp.zeros((pd.shape[0], meta["d_view_p"]), jnp.float32)
    return pts_enc, view_enc


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
    """refs = [pd, aux3, auxv, gout, W0,b0..Wk,bk,
               d_pd, dW0, db0, .., dWk, dbk]."""
    n_feat, n_rgb = meta["n_feat"], meta["n_rgb"]
    n_layers = n_feat + n_rgb
    feat_dim = meta["feat_dim"]
    feat_dim_p = _pad_to(feat_dim)
    d_in_p = meta["d_in_p"]

    pd_ref, aux3_ref, auxv_ref, gout_ref = refs[0], refs[1], refs[2], refs[3]
    w_refs = refs[4 : 4 + 2 * n_layers]
    out_refs = refs[4 + 2 * n_layers :]
    d_pd_ref = out_refs[0]
    dw_refs = out_refs[1:]

    first_step = pl.program_id(0) == 0

    pts_enc, view_enc = _encode_inputs(cfg, meta, pd_ref, aux3_ref, auxv_ref)
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
    d_pts_enc = jnp.zeros((T, d_in_p), jnp.float32)
    d_view_enc = jnp.zeros((T, meta["d_view_p"]), jnp.float32)

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
                d_view_enc = g_x[:, feat_dim_p:]
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
            d_pts_enc += g_x[:, prev_p:]
            g_x = g_feat_part
        if li > 0:
            g_z = g_x * relu_mask_into_layer(li)
        else:
            d_pts_enc += g_x

    # ---- encoding backward: contract padded enc grads to raw (T,3) each
    pd = pd_ref[:]
    d_x3 = _encode_tile_bwd(d_pts_enc[:, : meta["d_in"]], pd[:, 0:3],
                            aux3_ref[:], cfg.L_3D, cfg.add_raw_3D_points)
    if cfg.view_dep:
        d_dirs = _encode_tile_bwd(d_view_enc[:, : meta["d_view"]], pd[:, 3:6],
                                  auxv_ref[:], cfg.L_view, cfg.add_raw_rays)
    else:
        d_dirs = jnp.zeros((T, 3), jnp.float32)
    d_pd_ref[:] = jnp.concatenate(
        [d_x3, d_dirs, jnp.zeros((T, 2), jnp.float32)], axis=1
    )


def _fwd_kernel(cfg: MLPConfig, meta: dict, dtype, *refs):
    pd_ref, aux3_ref, auxv_ref = refs[0], refs[1], refs[2]
    n_layers = meta["n_feat"] + meta["n_rgb"]
    w_refs = refs[3 : 3 + 2 * n_layers]
    out_ref = refs[-1]
    pts_enc, view_enc = _encode_inputs(cfg, meta, pd_ref, aux3_ref, auxv_ref)
    w_list = [r[:] for r in w_refs]
    raw_density, raw_rgb, _ = _forward_tile(cfg, meta, dtype, pts_enc, view_enc, w_list)
    T = raw_density.shape[0]
    out_ref[:] = jnp.concatenate(
        [raw_density, raw_rgb, jnp.zeros((T, 4), jnp.float32)], axis=-1
    )


def _pad_T_rows(x: Array, T_pad: int) -> Array:
    return jnp.pad(x, ((0, T_pad - x.shape[0]), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_mlp_core(cfg: MLPConfig, params: Dict[str, Any], pd: Array,
                   aux3: Array, auxv: Array):
    """(raw_density (T,), raw_rgb (T,3)) with a fully fused Pallas VJP.

    pd: (T,8) packed [pts xyz | view dir xyz | 0 0]; aux3/auxv: (8, 3*2L)
    PE aux operands from `_pe_aux` (freq / c2f weight / is_sin rows).
    """
    return _core_forward(cfg, params, pd, aux3, auxv)


def _specs_and_ops(cfg, params):
    ops, meta = pack_weights(params, cfg)
    return ops, meta


def _aux_spec(a):
    return pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)


def _core_forward(cfg, params, pd, aux3, auxv):
    ops, meta = _specs_and_ops(cfg, params)
    T = pd.shape[0]
    T_pad = -(-T // TILE_T) * TILE_T
    pd_p = _pad_T_rows(pd, T_pad)
    grid = (T_pad // TILE_T,)
    in_specs = [
        pl.BlockSpec((TILE_T, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        _aux_spec(aux3), _aux_spec(auxv),
    ] + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for w in ops]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, cfg, meta, cfg.compute_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TILE_T, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T_pad, 8), jnp.float32),
    )(pd_p, aux3, auxv, *ops)
    return out[:T, 0], out[:T, 1:4]


def _core_fwd(cfg, params, pd, aux3, auxv):
    out = _core_forward(cfg, params, pd, aux3, auxv)
    return out, (params, pd, aux3, auxv)


def _core_bwd(cfg, residuals, grads):
    params, pd, aux3, auxv = residuals
    g_density, g_rgb = grads
    ops, meta = _specs_and_ops(cfg, params)
    n_layers = meta["n_feat"] + meta["n_rgb"]
    T = pd.shape[0]
    T_pad = -(-T // TILE_T) * TILE_T

    pd_p = _pad_T_rows(pd, T_pad)
    gout = jnp.concatenate(
        [g_density[:, None], g_rgb, jnp.zeros((T, 4), jnp.float32)], axis=-1
    )
    gout = _pad_T_rows(gout, T_pad)

    grid = (T_pad // TILE_T,)
    in_specs = [
        pl.BlockSpec((TILE_T, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        _aux_spec(aux3), _aux_spec(auxv),
        pl.BlockSpec((TILE_T, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for w in ops]

    out_shapes = [jax.ShapeDtypeStruct((T_pad, 8), jnp.float32)]
    out_specs = [pl.BlockSpec((TILE_T, 8), lambda i: (i, 0), memory_space=pltpu.VMEM)]
    for w in ops:  # dW/db accumulated in revisited blocks
        out_shapes.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
        out_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, cfg, meta, cfg.compute_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
    )(pd_p, aux3, auxv, gout, *ops)

    d_pd = outs[0][:T]
    d_ops = outs[1:]

    # unpack padded (in,out) grads back into the params pytree layout (out,in)
    d_params = _unpack_weight_grads(cfg, meta, params, d_ops)
    return d_params, d_pd, jnp.zeros_like(aux3), jnp.zeros_like(auxv)


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
    """Drop-in nerf_apply with the fused custom-VJP kernel for the whole
    PE -> MLP chain (activations stay in XLA around the custom_vjp)."""
    B, R, S, _ = pts.shape
    T = B * R * S
    pts_flat = pts.reshape(T, 3)
    if cfg.view_dep:
        ray_unit = ray / (jnp.linalg.norm(ray, axis=-1, keepdims=True) + 1e-12)
        dirs = jnp.broadcast_to(ray_unit[:, :, None, :], (B, R, S, 3)).reshape(T, 3)
    else:
        dirs = jnp.zeros((T, 3), pts_flat.dtype)
    pd = jnp.concatenate([pts_flat, dirs, jnp.zeros((T, 2), pts_flat.dtype)], axis=1)
    aux3 = _pe_aux(cfg.L_3D, progress, cfg.include_pi, cfg.log_sampling, cfg.barf_c2f)
    auxv = _pe_aux(cfg.L_view, progress, cfg.include_pi, cfg.log_sampling, cfg.barf_c2f)

    raw_density, raw_rgb = fused_mlp_core(cfg, params, pd, aux3, auxv)
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
