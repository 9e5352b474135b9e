"""Volume renderer: ray gen + stratified & hierarchical sampling + compositing.

Functional JAX counterpart of reference source/models/renderer.py (Graph).
Everything is shape-static and jit-safe:
  - `render_rays` is the single fused program (coarse [+fine]) over a ray tile;
  - full-image rendering is `lax.map` over fixed-size ray chunks
    (renderer.py:347-381 render_by_slices);
  - `render_to_max` renders up to a per-ray max depth and returns the
    transmittance `all_cumulated` used as a visibility signal
    (renderer.py:460-624);
  - fine-sampling on/off is a static python bool — the trainer swaps jitted
    step functions at the schedule boundary instead of tracing data-dependent
    branches (reference gates on iter at renderer.py:317-320).

The MLP evaluation dispatches to the fused Pallas kernel on TPU when enabled
(sparf_tpu.ops), falling back to the pure-XLA path everywhere else.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from sparf_tpu.models import nerf_mlp
from sparf_tpu.models.nerf_mlp import MLPConfig
from sparf_tpu.utils import camera

Array = jax.Array


@dataclass(frozen=True)
class RenderConfig:
    """Static rendering options (jit-closure constant)."""

    mlp: MLPConfig
    sample_intvs: int = 128
    sample_intvs_fine: int = 128
    fine_sampling: bool = False
    sample_stratified: bool = True
    depth_param: str = "metric"  # or 'inverse'
    rand_rays: int = 2048
    setbg_opaque: bool = False
    ndc: bool = False
    mlp_fine: Optional[MLPConfig] = None  # distinct fine arch (arch.layers_feat_fine)

    @property
    def fine_mlp(self) -> MLPConfig:
        return self.mlp_fine or self.mlp

    @classmethod
    def from_config(cls, cfg) -> "RenderConfig":
        setbg = bool(cfg.nerf.setbg_opaque) or bool(cfg.get("mask_img", False))
        mlp = MLPConfig.from_config(cfg)
        mlp_fine = None
        if cfg.arch.get("layers_feat_fine"):
            from dataclasses import replace as dc_replace

            mlp_fine = dc_replace(mlp, layers_feat=tuple(cfg.arch.layers_feat_fine[1:]))
        return cls(
            mlp=mlp,
            sample_intvs=cfg.nerf.sample_intvs,
            sample_intvs_fine=cfg.nerf.sample_intvs_fine,
            fine_sampling=cfg.nerf.fine_sampling,
            sample_stratified=cfg.nerf.sample_stratified,
            depth_param=cfg.nerf.depth.param,
            rand_rays=cfg.nerf.rand_rays,
            setbg_opaque=setbg,
            ndc=bool(cfg.camera.ndc),
            mlp_fine=mlp_fine,
        )


def render_depth_range(cfg, scene) -> "Array":
    """Depth range used for sampling: the raw config range for the inverse
    parametrization, the dataset near/far otherwise (renderer.py:105-108)."""
    if cfg.nerf.depth.param == "inverse":
        return jnp.asarray(cfg.nerf.depth.range, jnp.float32)
    return scene["depth_range"][0]


# ---------------------------------------------------------------------------
# depth sampling (renderer.py:383-456)
# ---------------------------------------------------------------------------


def sample_depth(
    key: Optional[Array],
    batch_size: int,
    num_rays: int,
    n_samples: int,
    depth_range: Array,
    depth_param: str = "metric",
    stratified: bool = True,
) -> Array:
    """Stratified (or midpoint) depth samples, (B,R,S,1).

    depth_range: traced (2,) [min,max]; `inverse` returns 1/(x+1e-8) of the
    uniform samples (renderer.py:383-419).
    """
    depth_min, depth_max = depth_range[0], depth_range[1]
    if stratified and key is not None:
        rand = jax.random.uniform(key, (batch_size, num_rays, n_samples, 1))
    else:
        rand = jnp.full((batch_size, num_rays, n_samples, 1), 0.5)
    rand = rand + jnp.arange(n_samples, dtype=jnp.float32)[None, None, :, None]
    samples = rand / n_samples * (depth_max - depth_min) + depth_min
    if depth_param == "inverse":
        samples = 1.0 / (samples + 1e-8)
    elif depth_param != "metric":
        raise ValueError(f"unknown depth parametrization {depth_param}")
    return samples


def sample_depth_from_pdf(
    key: Optional[Array],
    weights: Array,
    n_samples_coarse: int,
    n_samples_fine: int,
    depth_range: Array,
    det: bool,
) -> Array:
    """Inverse-CDF resampling of the coarse weight histogram, (B,R,Sf,1).

    weights: (B,R,S). Bins are linear in [depth_min, depth_max] (metric
    parametrization; matches renderer.py:421-456).
    """
    depth_min, depth_max = depth_range[0], depth_range[1]
    pdf = weights / (jnp.sum(weights, axis=-1, keepdims=True) + 1e-6)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (B,R,S+1)

    if det or key is None:
        grid = jnp.linspace(0.0, 1.0, n_samples_fine + 1)
    else:
        grid = jax.random.uniform(key, (n_samples_fine + 1,))
    unif = 0.5 * (grid[:-1] + grid[1:])
    unif = jnp.broadcast_to(unif, (*cdf.shape[:-1], n_samples_fine))

    # batched searchsorted(side='right') + the 4 bin lookups, all as fused
    # broadcast-compare reductions over the (B,R,Nf,S+1) tile. S is small
    # (128) so XLA streams this in one kLoop pass; the take_along_axis form
    # instead lowered to 16 serial gather fusions costing ~25 ms/step at the
    # DTU fine-stage shape (profiled r3; see PERF_NOTES.md).
    le = cdf[..., None, :] <= unif[..., :, None]            # (B,R,Nf,S+1)
    idx = jnp.sum(le, axis=-1)                              # #{cdf <= u}
    # cdf[idx-1] = largest cdf value <= u (cdf >= 0, so -1 is a safe floor);
    # cdf[min(idx,S)] = smallest cdf value > u, except u >= cdf[-1] where the
    # clipped gather returns cdf[-1] — reproduce with the same fallback.
    cdf_low = jnp.max(jnp.where(le, cdf[..., None, :], -1.0), axis=-1)
    cdf_high = jnp.min(jnp.where(le, jnp.inf, cdf[..., None, :]), axis=-1)
    cdf_high = jnp.where(jnp.isfinite(cdf_high), cdf_high, cdf[..., -1:])

    # uniform bins: depth_bin[i] = depth_min + i*delta — arithmetic, no gather
    delta = (depth_max - depth_min) / n_samples_coarse
    idx_low = jnp.clip(idx - 1, 0, n_samples_coarse)
    idx_high = jnp.clip(idx, None, n_samples_coarse)
    depth_low = depth_min + idx_low.astype(jnp.float32) * delta
    depth_high = depth_min + idx_high.astype(jnp.float32) * delta
    t = (unif - cdf_low) / (cdf_high - cdf_low + 1e-8)
    samples = depth_low + t * (depth_high - depth_low)
    return samples[..., None]


def sample_depth_diff_max_range_per_ray(
    batch_size: int,
    num_rays: int,
    n_samples: int,
    depth_min: Array,
    depth_max: Array,
) -> Array:
    """Deterministic samples up to a per-ray max depth (renderer.py:597-624).

    depth_max: (B,R). Returns (B,R,S,1); metric parametrization only.
    """
    rand = jnp.ones((batch_size, num_rays, n_samples, 1))
    rand = rand + jnp.arange(n_samples, dtype=jnp.float32)[None, None, :, None]
    return rand / n_samples * (depth_max[..., None, None] - depth_min) + depth_min


# ---------------------------------------------------------------------------
# MLP dispatch (XLA path here; Pallas path plugs in via sparf_tpu.ops)
# ---------------------------------------------------------------------------

_FORWARD_IMPL = {"xla": nerf_mlp.nerf_apply}


def register_forward_impl(name: str, fn) -> None:
    _FORWARD_IMPL[name] = fn


def forward_samples(
    params: Dict[str, Any],
    cfg: RenderConfig,
    center: Array,
    ray: Array,
    depth_samples: Array,
    progress: Array,
    density_noise_key: Optional[Array] = None,
    impl: str = "xla",
    mlp_cfg: Optional[MLPConfig] = None,
) -> Dict[str, Array]:
    """Points from depths -> MLP (frequency_nerf.py:260-281)."""
    from sparf_tpu.parallel import mesh as mesh_mod

    pts = camera.get_3d_points_from_depth(center, ray, depth_samples, multi_samples=True)
    fwd = _FORWARD_IMPL[impl]
    mcfg = mlp_cfg or cfg.mlp
    mesh = mesh_mod.active_mesh()
    if mesh is not None and pts.ndim == 4:
        return _forward_samples_sharded(
            fwd, params, mcfg, pts, ray, progress, density_noise_key, mesh
        )
    return fwd(params, mcfg, pts, ray, progress, density_noise_key)


def _forward_samples_sharded(fwd, params, mcfg, pts, ray, progress,
                             density_noise_key, mesh):
    """Run the MLP shard-local over the ray axis via shard_map.

    The MLP is pointwise over rays, but its flatten-to-2D (nerf_mlp.nerf_apply
    / ops.fused_mlp_vjp) merges (B, R_sharded, S) with the sharded dim mid-
    group — GSPMD cannot partition that and falls back to all-gathering every
    per-sample field around the matmul chain (measured 244 MB/step at the DTU
    shape; PERF_NOTES scaling model). shard_map makes the partitioning
    explicit instead: params replicated in, rays sharded in/out, zero
    collectives inside; the backward pass psums the replicated-param grads
    automatically (one parameter-sized all-reduce, ~2.4 MB).

    Rays are padded to a mesh multiple with trailing copies (shard-local,
    <1% waste) and the outputs sliced back — real-ray results bit-identical.
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    B, R, S = pts.shape[:3]
    n = mesh.devices.size
    Rp = -(-R // n) * n
    if Rp != R:
        pad = Rp - R
        pts = jnp.concatenate([pts, pts[:, -pad:]], axis=1)
        ray = jnp.concatenate([ray, ray[:, -pad:]], axis=1)

    ray_spec4 = P(None, "data", None, None)
    ray_spec3 = P(None, "data", None)
    out_specs = dict(rgb_samples=ray_spec4, density_samples=ray_spec3)

    if density_noise_key is None:
        def f(p, pts_l, ray_l, prog):
            return fwd(p, mcfg, pts_l, ray_l, prog, None)

        out = shard_map(
            f, mesh=mesh, in_specs=(P(), ray_spec4, ray_spec3, P()),
            out_specs=out_specs,
        )(params, pts, ray, progress)
    else:
        # per-shard independent noise stream (fold in the shard index). The
        # regularizer's noise DRAW differs from the unsharded run — density
        # noise is off in every preset; documented SPMD deviation.
        def f(p, pts_l, ray_l, prog, key):
            key = jax.random.fold_in(key, jax.lax.axis_index("data"))
            return fwd(p, mcfg, pts_l, ray_l, prog, key)

        out = shard_map(
            f, mesh=mesh, in_specs=(P(), ray_spec4, ray_spec3, P(), P()),
            out_specs=out_specs,
        )(params, pts, ray, progress, density_noise_key)

    if Rp != R:
        out = {k: v[:, :R] for k, v in out.items()}
    return out


# ---------------------------------------------------------------------------
# core ray rendering (renderer.py:250-345)
# ---------------------------------------------------------------------------


def render_rays(
    params: Dict[str, Any],
    cfg: RenderConfig,
    center: Array,
    ray: Array,
    depth_range: Array,
    progress: Array,
    key: Optional[Array] = None,
    stratified: bool = True,
    fine_enabled: bool = False,
    impl: str = "xla",
) -> Dict[str, Array]:
    """Render a (B,R)-tile of rays; returns the output_dict of the reference.

    params: {'coarse': nerf pytree, 'fine': nerf pytree or absent}.
    """
    B, R = ray.shape[0], ray.shape[1]
    k_depth = k_noise = k_fine = None
    if key is not None:
        k_depth, k_noise, k_fine = jax.random.split(key, 3)

    depth_samples = sample_depth(
        k_depth, B, R, cfg.sample_intvs, depth_range, cfg.depth_param,
        stratified=cfg.sample_stratified and stratified,
    )
    pred = forward_samples(params["coarse"], cfg, center, ray, depth_samples, progress,
                           density_noise_key=k_noise if stratified else None, impl=impl)
    out = nerf_mlp.composite(ray, pred["rgb_samples"], pred["density_samples"],
                             depth_samples, cfg.setbg_opaque)
    out["t"] = depth_samples
    out["origins"] = center
    out["viewdirs"] = ray

    if cfg.fine_sampling and fine_enabled:
        det = not (cfg.sample_stratified and stratified)
        depth_fine = sample_depth_from_pdf(
            k_fine, jax.lax.stop_gradient(out["weights"][..., 0]),
            cfg.sample_intvs, cfg.sample_intvs_fine, depth_range, det=det,
        )
        depth_all = jnp.concatenate([depth_samples, depth_fine], axis=2)
        # stop_gradient: no parameter path exists through the sample positions
        # (coarse depths are pure RNG, fine depths resample stop_grad'd
        # weights), but without the explicit stop jax's sort-VJP emits a
        # tuple (f32,s32) sort to save the permutation — measured 6 ms/step
        # at the DTU fine-stage shape (r3 profile).
        depth_all = jax.lax.stop_gradient(jnp.sort(depth_all, axis=2))
        pred_f = forward_samples(params["fine"], cfg, center, ray, depth_all, progress,
                                 density_noise_key=None, impl=impl, mlp_cfg=cfg.fine_mlp)
        out_f = nerf_mlp.composite(ray, pred_f["rgb_samples"], pred_f["density_samples"],
                                   depth_all, cfg.setbg_opaque)
        out_f["t"] = depth_all
        out.update({k + "_fine": v for k, v in out_f.items()})
    return out


def render_at_pixels(
    params: Dict[str, Any],
    cfg: RenderConfig,
    pose_w2c: Array,
    intr: Array,
    pixels: Array,
    depth_range: Array,
    progress: Array,
    key: Optional[Array] = None,
    stratified: bool = True,
    fine_enabled: bool = False,
    impl: str = "xla",
) -> Dict[str, Array]:
    """Render at explicit pixel coords (renderer.py:142-190 analog).

    pose_w2c (B,3,4), intr (B,3,3), pixels (N,2) or (B,N,2).
    """
    center, ray = camera.get_center_and_ray_at_pixels(pose_w2c, pixels, intr)
    if cfg.ndc:
        center, ray = camera.convert_NDC(center, ray, intr)
    return render_rays(params, cfg, center, ray, depth_range, progress, key,
                       stratified, fine_enabled, impl)


def render_image_chunked(
    params: Dict[str, Any],
    cfg: RenderConfig,
    pose_w2c: Array,
    intr: Array,
    H: int,
    W: int,
    depth_range: Array,
    progress: Array,
    key: Optional[Array] = None,
    fine_enabled: bool = False,
    chunk: Optional[int] = None,
    impl: str = "xla",
) -> Dict[str, Array]:
    """Full-image deterministic render via lax.map over fixed-size ray chunks.

    Pads HW up to a multiple of `chunk` (static shapes for XLA), then crops.
    Returns rgb/depth/... of shape (B,HW,k) like render_by_slices
    (renderer.py:347-381).
    """
    chunk = chunk or cfg.rand_rays
    B = pose_w2c.shape[0]
    HW = H * W
    n_chunks = -(-HW // chunk)
    pad = n_chunks * chunk - HW

    pixels = camera.get_pixel_grid(H, W)
    pixels = jnp.concatenate([pixels, jnp.zeros((pad, 2), pixels.dtype)], axis=0)
    pixels = pixels.reshape(n_chunks, chunk, 2)

    def render_chunk(px):
        out = render_at_pixels(params, cfg, pose_w2c, intr, px, depth_range, progress,
                               key=None, stratified=False, fine_enabled=fine_enabled, impl=impl)
        keep = ["rgb", "rgb_var", "depth", "depth_var", "opacity", "all_cumulated"]
        if cfg.fine_sampling and fine_enabled:
            keep += [k + "_fine" for k in keep]
        return {k: out[k] for k in keep if k in out}

    outs = jax.lax.map(render_chunk, pixels)  # dict of (n_chunks, B, chunk, k)
    merged = {}
    for name, v in outs.items():
        if v.ndim == 3:  # all_cumulated: (n_chunks, B, chunk)
            v = jnp.moveaxis(v, 0, 1).reshape(B, n_chunks * chunk)[:, :HW]
        else:
            v = jnp.moveaxis(v, 0, 1).reshape(B, n_chunks * chunk, v.shape[-1])[:, :HW]
        merged[name] = v
    return merged


def render_to_max(
    params: Dict[str, Any],
    cfg: RenderConfig,
    pose_w2c: Array,
    intr: Array,
    pixels: Array,
    depth_min: Array,
    depth_max: Array,
    progress: Array,
    fine_enabled: bool = False,
    impl: str = "xla",
) -> Dict[str, Array]:
    """Render rays only up to a per-ray max depth; `all_cumulated` is the
    probability the ray travels to depth_max unoccluded — the visibility
    signal of the depth-consistency loss (renderer.py:504-595).

    pixels (B,N,2) or (N,2); depth_max (B,N). Metric depth only.
    """
    center, ray = camera.get_center_and_ray_at_pixels(pose_w2c, pixels, intr)
    if cfg.ndc:
        center, ray = camera.convert_NDC(center, ray, intr)
    B, R = ray.shape[0], ray.shape[1]
    depth_samples = sample_depth_diff_max_range_per_ray(
        B, R, cfg.sample_intvs, depth_min, depth_max
    )
    out_all: Dict[str, Array] = {"origins": center, "viewdirs": ray}
    pred = forward_samples(params["coarse"], cfg, center, ray, depth_samples, progress, impl=impl)
    out = nerf_mlp.composite(ray, pred["rgb_samples"], pred["density_samples"],
                             depth_samples, cfg.setbg_opaque)
    out["t"] = depth_samples
    out_all.update(out)
    if cfg.fine_sampling and fine_enabled:
        # same samples evaluated through the fine MLP (renderer.py:578-590)
        pred_f = forward_samples(params["fine"], cfg, center, ray, depth_samples, progress,
                                 impl=impl, mlp_cfg=cfg.fine_mlp)
        out_f = nerf_mlp.composite(ray, pred_f["rgb_samples"], pred_f["density_samples"],
                                   depth_samples, cfg.setbg_opaque)
        out_f["t"] = depth_samples
        out_all.update({k + "_fine": v for k, v in out_f.items()})
    return out_all


def init_graph_params(key: Array, cfg: RenderConfig) -> Dict[str, Any]:
    """{'coarse': mlp pytree [, 'fine': mlp pytree]} (renderer.py:28-75)."""
    k1, k2 = jax.random.split(key)
    params = {"coarse": nerf_mlp.init_nerf_params(k1, cfg.mlp)}
    if cfg.fine_sampling:
        params["fine"] = nerf_mlp.init_nerf_params(k2, cfg.fine_mlp)
    return params


# ---------------------------------------------------------------------------
# batched multi-loss rendering (TPU-native; no reference counterpart)
# ---------------------------------------------------------------------------
#
# One SPARF training step renders up to six independent ray batches (the
# photometric rays, both directions of the correspondence loss, and the three
# depth-consistency renders). The reference issues these as separate CUDA
# model invocations (e.g. base_corres_loss.py:214-258 two get_pose+render
# calls per iteration); on TPU each separate invocation is a small matmul
# chain that under-fills the MXU and pays its own scheduling latency.
#
# `render_bundles` instead evaluates ALL bundles of a round with one MLP call
# per hierarchy level (and per gradient group): sample points per bundle,
# flatten every bundle to a point list, concatenate, run the (Pallas or XLA)
# MLP once, split, and composite per bundle. The MLP is pointwise over
# samples, so the merged outputs are numerically identical to per-bundle
# rendering — each bundle keeps its own PRNG keys and depth-sampling scheme.


@dataclass
class RayBundle:
    """One render request inside a jitted train step.

    kind='pixels' reproduces render_at_pixels(stratified=...) semantics;
    kind='tomax' reproduces render_to_max (per-ray max depth, deterministic
    samples). `no_grad` renders through stop_gradient(params) — the
    visibility pass of the depth-consistency loss.
    """

    pixels: Array                      # (N,2) or (B,N,2)
    pose_w2c: Array                    # (B,3,4)
    intr: Array                        # (B,3,3)
    key: Optional[Array] = None
    stratified: bool = True
    kind: str = "pixels"
    depth_min: Optional[Array] = None  # tomax: scalar near plane
    depth_max: Optional[Array] = None  # tomax: (B,N)
    no_grad: bool = False


def _bundle_geometry(cfg: RenderConfig, b: RayBundle):
    center, ray = camera.get_center_and_ray_at_pixels(b.pose_w2c, b.pixels, b.intr)
    if cfg.ndc:
        center, ray = camera.convert_NDC(center, ray, intr=b.intr)
    return center, ray


def _coarse_depths(cfg: RenderConfig, b: RayBundle, center, k_depth, depth_range):
    B, R = center.shape[0], center.shape[1]
    if b.kind == "tomax":
        return sample_depth_diff_max_range_per_ray(
            B, R, cfg.sample_intvs, b.depth_min, b.depth_max
        )
    return sample_depth(
        k_depth, B, R, cfg.sample_intvs, depth_range, cfg.depth_param,
        stratified=cfg.sample_stratified and b.stratified,
    )


def _merged_mlp_level(params_level, mlp_cfg, geoms, depths, no_grads, progress, impl):
    """ONE MLP call over the concatenation of every bundle's sample points,
    per gradient group; returns the per-bundle composite input dicts."""
    from sparf_tpu.parallel import mesh as mesh_mod

    fwd = _FORWARD_IMPL[impl]
    preds = [None] * len(geoms)
    for wants_grad in (True, False):
        idxs = [i for i, ng in enumerate(no_grads) if (not ng) == wants_grad]
        if not idxs:
            continue
        pts_list, dirs_list, sizes = [], [], []
        for i in idxs:
            center, ray = geoms[i]
            d = depths[i]                                   # (B,R,S,1)
            B, R, S = d.shape[:3]
            pts = camera.get_3d_points_from_depth(center, ray, d, multi_samples=True)
            pts_list.append(pts.reshape(1, B * R * S, 1, 3))
            dirs = jnp.broadcast_to(ray[..., None, :], (B, R, S, 3))
            dirs_list.append(dirs.reshape(1, B * R * S, 3))
            sizes.append(B * R * S)
        pts_cat = mesh_mod.shard_rays(jnp.concatenate(pts_list, axis=1), axis=1)
        dirs_cat = mesh_mod.shard_rays(jnp.concatenate(dirs_list, axis=1), axis=1)
        p = params_level if wants_grad else jax.lax.stop_gradient(params_level)
        out = fwd(p, mlp_cfg, pts_cat, dirs_cat, progress, None)
        ofs = 0
        for i, sz in zip(idxs, sizes):
            B, R, S = depths[i].shape[:3]
            preds[i] = dict(
                rgb_samples=out["rgb_samples"][0, ofs : ofs + sz].reshape(B, R, S, 3),
                density_samples=out["density_samples"][0, ofs : ofs + sz].reshape(B, R, S),
            )
            ofs += sz
    return preds


def render_bundles(
    params: Dict[str, Any],
    cfg: RenderConfig,
    bundles: list,
    depth_range: Array,
    progress: Array,
    fine_enabled: bool = False,
    impl: str = "xla",
    merge: bool = True,
) -> list:
    """Render a list of RayBundles; returns one output dict per bundle with
    exactly the render_at_pixels / render_to_max surface.

    merge=False falls back to the per-bundle render calls (the equivalence
    reference for tests and the density-noise path the merged MLP call cannot
    express).
    """
    if not merge:
        outs = []
        for b in bundles:
            if b.kind == "tomax":
                p = jax.lax.stop_gradient(params) if b.no_grad else params
                outs.append(render_to_max(
                    p, cfg, b.pose_w2c, b.intr, b.pixels, b.depth_min, b.depth_max,
                    progress, fine_enabled=fine_enabled, impl=impl,
                ))
            else:
                p = jax.lax.stop_gradient(params) if b.no_grad else params
                outs.append(render_at_pixels(
                    p, cfg, b.pose_w2c, b.intr, b.pixels, depth_range, progress,
                    key=b.key, stratified=b.stratified, fine_enabled=fine_enabled,
                    impl=impl,
                ))
        return outs

    geoms, keys3, depths, no_grads = [], [], [], []
    for b in bundles:
        center, ray = _bundle_geometry(cfg, b)
        geoms.append((center, ray))
        k_depth = k_fine = None
        if b.key is not None:
            k_depth, _k_noise, k_fine = jax.random.split(b.key, 3)
        keys3.append((k_depth, k_fine))
        depths.append(_coarse_depths(cfg, b, center, k_depth, depth_range))
        no_grads.append(b.no_grad)

    preds = _merged_mlp_level(params["coarse"], cfg.mlp, geoms, depths, no_grads,
                              progress, impl)
    outs = []
    for (center, ray), d, pred in zip(geoms, depths, preds):
        out = nerf_mlp.composite(ray, pred["rgb_samples"], pred["density_samples"],
                                 d, cfg.setbg_opaque)
        out["t"] = d
        out["origins"] = center
        out["viewdirs"] = ray
        outs.append(out)

    if cfg.fine_sampling and fine_enabled:
        depths_f = []
        for b, (center, ray), d, out, (k_depth, k_fine) in zip(
            bundles, geoms, depths, outs, keys3
        ):
            if b.kind == "tomax":
                depths_f.append(d)  # same samples through the fine MLP
            else:
                det = not (cfg.sample_stratified and b.stratified)
                depth_fine = sample_depth_from_pdf(
                    k_fine, jax.lax.stop_gradient(out["weights"][..., 0]),
                    cfg.sample_intvs, cfg.sample_intvs_fine, depth_range, det=det,
                )
                depth_all = jnp.concatenate([d, depth_fine], axis=2)
                # same stop_gradient rationale as render_rays' fine merge
                depths_f.append(jax.lax.stop_gradient(jnp.sort(depth_all, axis=2)))
        preds_f = _merged_mlp_level(params["fine"], cfg.fine_mlp, geoms, depths_f,
                                    no_grads, progress, impl)
        for (center, ray), d, pred, out in zip(geoms, depths_f, preds_f, outs):
            out_f = nerf_mlp.composite(ray, pred["rgb_samples"],
                                       pred["density_samples"], d, cfg.setbg_opaque)
            out_f["t"] = d
            out.update({k + "_fine": v for k, v in out_f.items()})
    return outs
