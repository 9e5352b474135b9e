"""Regularization losses (reference regularization_losses.py:20-66)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def lossfun_distortion(t: Array, w: Array, normalize: bool = False) -> Array:
    """mip-NeRF-360 distortion loss.

    t: (B,R,S,1) sample depths; w: (B,R,S,1) compositing weights.
    """
    if normalize:
        w = w + 1e-6
        w = w / jnp.sum(w, axis=-2, keepdims=True)
    w = w[..., 0]
    t = t[..., 0]
    ut = (t[..., 1:] + t[..., :-1]) / 2
    w_ = w[..., 1:]
    dut = jnp.abs(ut[..., :, None] - ut[..., None, :])
    loss_inter = jnp.sum(w_ * jnp.sum(w_[..., None, :] * dut, axis=-1), axis=-1)
    loss_intra = jnp.sum(w_**2 * jnp.diff(t, axis=-1), axis=-1) / 3
    return jnp.mean(loss_inter + loss_intra)


def depth_patch_loss(depths: Array, patch_size: int, charbonnier_padding: float = 0.001) -> Array:
    """Charbonnier smoothness over depth patches; depths (B,N*(p^2),1)."""
    B = depths.shape[0]
    d = depths.reshape(B, -1, patch_size**2)
    resid_sq = (d[..., None] - d[..., None, :]) ** 2
    return jnp.mean(jnp.sqrt(resid_sq + charbonnier_padding**2))
