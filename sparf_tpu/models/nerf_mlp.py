"""NeRF MLP as an explicit parameter pytree (pure JAX, Pallas-friendly).

Parity with reference source/models/frequency_nerf.py:72-343:
  - feature trunk layers [in,256x8] with skip concat at layer 4, last layer
    emits 256+1 units; unit 0 is raw density, rest are features;
  - rgb head [feat(+view enc), 128, 3] with sigmoid output;
  - TF-style Xavier-uniform init: relu gain sqrt(2) everywhere except the last
    rgb layer (gain 1) and the density row of the trunk's last layer (gain 1);
  - softplus (configurable) density activation, optional train-time noise;
  - BARF c2f masking of both 3D-point and view-direction encodings.

Explicit (weight, bias) lists rather than flax modules: the fused Pallas
kernel (sparf_tpu.ops) consumes the same pytree, and init math is exact.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from sparf_tpu.models import embedder

Array = jax.Array


@dataclass(frozen=True)
class MLPConfig:
    """Static architecture spec (hashable; safe as a jit-closure constant)."""

    layers_feat: Tuple[int, ...] = (256, 256, 256, 256, 256, 256, 256, 256)
    layers_rgb: Tuple[int, ...] = (128, 3)
    skip: Tuple[int, ...] = (4,)
    L_3D: int = 10
    L_view: int = 4
    add_raw_3D_points: bool = True
    add_raw_rays: bool = True
    include_pi: bool = True
    log_sampling: bool = True
    view_dep: bool = True
    density_activ: str = "softplus"
    tf_init: bool = True
    barf_c2f: Optional[Tuple[float, float]] = None
    density_noise_reg: Optional[float] = None
    compute_dtype: Any = jnp.float32

    @property
    def input_3d_dim(self) -> int:
        dim = 3 if self.add_raw_3D_points else 0
        dim += 6 * self.L_3D if self.L_3D > 0 else 0
        assert dim > 0
        return dim

    @property
    def input_view_dim(self) -> int:
        if not self.view_dep:
            return 0
        dim = 3 if self.add_raw_rays else 0
        dim += 6 * self.L_view if self.L_view > 0 else 0
        assert dim > 0
        return dim

    @classmethod
    def from_config(cls, cfg) -> "MLPConfig":
        """Build from the ConfigDict tree (arch/nerf sections)."""
        arch, nerf = cfg.arch, cfg.nerf
        pe = arch.posenc
        return cls(
            layers_feat=tuple(arch.layers_feat[1:]),
            layers_rgb=tuple(arch.layers_rgb[1:]),
            skip=tuple(arch.skip),
            L_3D=pe.L_3D,
            L_view=pe.L_view,
            add_raw_3D_points=pe.add_raw_3D_points,
            add_raw_rays=pe.add_raw_rays,
            include_pi=pe.include_pi_in_posenc,
            log_sampling=pe.log_sampling,
            view_dep=nerf.view_dep,
            density_activ=arch.density_activ,
            tf_init=arch.tf_init,
            barf_c2f=tuple(cfg.barf_c2f) if cfg.get("barf_c2f") else None,
            density_noise_reg=nerf.density_noise_reg if nerf.density_noise_reg else None,
            compute_dtype=jnp.bfloat16 if cfg.tpu.compute_dtype == "bfloat16" else jnp.float32,
        )


def _xavier_uniform(key, shape, gain: float) -> Array:
    """torch.nn.init.xavier_uniform_ semantics on a (out,in) weight."""
    fan_out, fan_in = shape
    a = gain * jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, jnp.float32, -a, a)


def init_nerf_params(key: Array, cfg: MLPConfig) -> Dict[str, List[Tuple[Array, Array]]]:
    """Parameter pytree: {'feat': [(W,b)..], 'rgb': [(W,b)..]}; W is (out,in)."""
    relu_gain = jnp.sqrt(2.0)
    feat_layers = []
    dims: List[Tuple[int, int]] = []
    k_in = cfg.input_3d_dim
    n = len(cfg.layers_feat)
    for li, k_out in enumerate(cfg.layers_feat):
        if li in cfg.skip:
            k_in += cfg.input_3d_dim
        if li == n - 1:
            k_out = k_out + 1  # density unit
        dims.append((k_out, k_in))
        k_in = cfg.layers_feat[li]

    keys = jax.random.split(key, len(dims) + len(cfg.layers_rgb) + 1)
    for li, (k_out, k_in_d) in enumerate(dims):
        if cfg.tf_init and li == n - 1:
            # density row gain 1, feature rows relu gain (frequency_nerf.py:142-149)
            k1, k2 = jax.random.split(keys[li])
            w_density = _xavier_uniform(k1, (1, k_in_d), 1.0)
            w_feat = _xavier_uniform(k2, (k_out - 1, k_in_d), float(relu_gain))
            W = jnp.concatenate([w_density, w_feat], axis=0)
        else:
            W = _xavier_uniform(keys[li], (k_out, k_in_d), float(relu_gain) if cfg.tf_init else 1.0)
        feat_layers.append((W, jnp.zeros((k_out,), jnp.float32)))

    rgb_layers = []
    feat_dim = cfg.layers_feat[-1]
    k_in = feat_dim + cfg.input_view_dim
    m = len(cfg.layers_rgb)
    for li, k_out in enumerate(cfg.layers_rgb):
        gain = 1.0 if (li == m - 1 or not cfg.tf_init) else float(relu_gain)
        W = _xavier_uniform(keys[len(dims) + li], (k_out, k_in), gain)
        rgb_layers.append((W, jnp.zeros((k_out,), jnp.float32)))
        k_in = k_out

    return {"feat": feat_layers, "rgb": rgb_layers}


def _linear(x: Array, W: Array, b: Array, dtype) -> Array:
    y = jnp.dot(x.astype(dtype), W.T.astype(dtype), preferred_element_type=jnp.float32)
    return y + b


def density_activation(raw: Array, kind: str) -> Array:
    if kind == "softplus":
        return jax.nn.softplus(raw)
    if kind == "relu":
        return jax.nn.relu(raw)
    if kind == "abs":
        return jnp.abs(raw)
    if kind == "sigmoid":
        return jax.nn.sigmoid(raw)
    if kind == "exp":
        return jnp.exp(raw)
    raise ValueError(f"unknown density activation {kind}")


def encode_points(cfg: MLPConfig, pts: Array, progress: Array) -> Array:
    """PE(+c2f mask)+optional raw concat for 3D points. (...,3)->(...,in3d)."""
    if cfg.L_3D > 0:
        enc = embedder.positional_encoding(pts, cfg.L_3D, cfg.include_pi, cfg.log_sampling)
        enc = embedder.apply_c2f_mask(enc, embedder.c2f_weights(progress, cfg.L_3D, cfg.barf_c2f))
        if cfg.add_raw_3D_points:
            enc = jnp.concatenate([pts, enc], axis=-1)
    else:
        enc = pts
    return enc


def encode_views(cfg: MLPConfig, ray_unit: Array, progress: Array) -> Array:
    if cfg.L_view > 0:
        enc = embedder.positional_encoding(ray_unit, cfg.L_view, cfg.include_pi, cfg.log_sampling)
        enc = embedder.apply_c2f_mask(enc, embedder.c2f_weights(progress, cfg.L_view, cfg.barf_c2f))
        if cfg.add_raw_rays:
            enc = jnp.concatenate([ray_unit, enc], axis=-1)
    else:
        enc = ray_unit
    return enc


def nerf_apply(
    params: Dict[str, Any],
    cfg: MLPConfig,
    pts: Array,
    ray: Array,
    progress: Array,
    density_noise_key: Optional[Array] = None,
) -> Dict[str, Array]:
    """MLP prediction at sample points.

    Args:
      pts: (B,R,S,3) 3D sample points (world frame)
      ray: (B,R,3) per-ray directions (unnormalized)
      progress: traced scalar for c2f PE annealing
      density_noise_key: PRNG key to add density noise (train only) or None
    Returns dict(rgb_samples (B,R,S,3), density_samples (B,R,S)).
    """
    dtype = cfg.compute_dtype
    batch_shape = pts.shape[:-1]  # (B,R,S)

    def _flat2d(x):
        return x.reshape(-1, x.shape[-1])

    def _unflat(x, trailing=()):
        return x.reshape(*batch_shape, *trailing)

    pts_enc = encode_points(cfg, pts, progress)
    # flatten to 2-D for the matmul chain: with >2-D operands XLA lowers the
    # backward dW = acts^T @ grads contractions to kLoop VPU fusions instead
    # of MXU GEMMs (measured ~2.5x slowdown of render+grad; see PERF_NOTES.md).
    # NOTE this merge puts the SPMD-sharded ray axis in the middle of the
    # merge group, which GSPMD cannot partition — under a mesh the renderer
    # wraps this whole function in shard_map (renderer.forward_samples), so
    # here every shape is already shard-local and the reshape is free.
    pts_enc = _flat2d(pts_enc)

    feat = pts_enc
    n = len(params["feat"])
    raw_density = None
    for li, (W, b) in enumerate(params["feat"]):
        if li in cfg.skip:
            feat = jnp.concatenate([feat, pts_enc], axis=-1)
        feat = _linear(feat, W, b, dtype)
        if li == n - 1:
            raw_density = feat[..., 0]
            feat = feat[..., 1:]
        feat = jax.nn.relu(feat)

    raw_density = _unflat(raw_density)
    if density_noise_key is not None and cfg.density_noise_reg:
        raw_density = raw_density + (
            jax.random.normal(density_noise_key, raw_density.shape) * cfg.density_noise_reg
        )
    density = density_activation(raw_density, cfg.density_activ)

    if cfg.view_dep:
        ray_unit = ray / (jnp.linalg.norm(ray, axis=-1, keepdims=True) + 1e-12)
        ray_enc = encode_views(cfg, ray_unit, progress)
        ray_enc = jnp.broadcast_to(ray_enc[..., None, :], (*batch_shape, ray_enc.shape[-1]))
        feat = jnp.concatenate([feat, _flat2d(ray_enc)], axis=-1)

    m = len(params["rgb"])
    for li, (W, b) in enumerate(params["rgb"]):
        feat = _linear(feat, W, b, dtype)
        if li != m - 1:
            feat = jax.nn.relu(feat)
    rgb = _unflat(jax.nn.sigmoid(feat), trailing=(3,))
    return dict(rgb_samples=rgb, density_samples=density)


def composite(
    ray: Array,
    rgb_samples: Array,
    density_samples: Array,
    depth_samples: Array,
    setbg_opaque: bool = False,
) -> Dict[str, Array]:
    """Volume compositing (exact parity with frequency_nerf.py:283-343).

    Args:
      ray: (B,R,3); rgb_samples: (B,R,S,3); density_samples: (B,R,S);
      depth_samples: (B,R,S,1).
    Returns rgb, rgb_var, depth, depth_var, opacity (B,R,k), weights
    (B,R,S,1), all_cumulated (B,R) = transmittance before the last sample.
    """
    ray_length = jnp.linalg.norm(ray, axis=-1, keepdims=True)  # (B,R,1)
    t = depth_samples[..., 0]  # (B,R,S)
    intv = t[..., 1:] - t[..., :-1]
    intv = jnp.concatenate([intv, jnp.full_like(intv[..., :1], 1e10)], axis=-1)
    dist = intv * ray_length
    sigma_delta = density_samples * dist
    alpha = 1 - jnp.exp(-sigma_delta)
    shifted = jnp.concatenate([jnp.zeros_like(sigma_delta[..., :1]), sigma_delta[..., :-1]], axis=-1)
    T = jnp.exp(-jnp.cumsum(shifted, axis=-1))
    all_cumulated = T[..., -2]
    weights = (T * alpha)[..., None]  # (B,R,S,1)

    depth = jnp.sum(depth_samples * weights, axis=2)             # (B,R,1)
    depth_var = jnp.sum(weights * (depth_samples - depth[..., None, :]) ** 2, axis=2)
    rgb = jnp.sum(rgb_samples * weights, axis=2)                 # (B,R,3)
    rgb_var = jnp.sum(
        jnp.sum(rgb_samples - rgb[..., None, :], axis=-1, keepdims=True) * weights, axis=2
    )
    opacity = jnp.sum(weights, axis=2)                           # (B,R,1)
    if setbg_opaque:
        rgb = rgb + (1.0 - opacity)
    return dict(
        rgb=rgb,
        rgb_var=rgb_var,
        depth=depth,
        depth_var=depth_var,
        opacity=opacity,
        weights=weights,
        all_cumulated=all_cumulated,
    )
