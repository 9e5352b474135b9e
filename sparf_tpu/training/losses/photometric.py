"""Photometric + mask + regularization losses (reference base_losses.py:243-324).

Pure function over the rendered output_dict and the GT pixels already gathered
at the rendered rays. The trainer gathers GT pixels (the reference's
ray-indexed image lookup) so this stays shape-static.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from sparf_tpu.training.losses import base as L
from sparf_tpu.training.losses import regularization as regu

Array = jax.Array


def photometric_and_regu_loss(
    output_dict: Dict[str, Array],
    image_at_rays: Array,
    fg_mask_at_rays: Optional[Array] = None,
    huber_photometric: bool = True,
    loss_weight: Optional[Dict] = None,
    depth_regu_patch_size: int = 2,
    gate: Array | float = 1.0,
) -> Dict[str, Array]:
    """Returns {'render': ..., ['fg_mask', 'distortion', 'depth_patch']}.

    image_at_rays: (B,N,3) GT rgb gathered at rendered rays.
    fg_mask_at_rays: (B,N,1) float or None.
    gate: 0/1 scalar for start_iter scheduling.
    """
    loss_weight = loss_weight or {}
    B = image_at_rays.shape[0]
    loss_fn = L.huber_loss if huber_photometric else L.mse_loss

    loss_dict: Dict[str, Array] = {}
    render = loss_fn(output_dict["rgb"].reshape(B, -1, 3), image_at_rays)
    if "rgb_fine" in output_dict:
        render = render + loss_fn(output_dict["rgb_fine"].reshape(B, -1, 3), image_at_rays)
    loss_dict["render"] = render * gate

    if loss_weight.get("fg_mask") is not None and fg_mask_at_rays is not None:
        strength = 0.5
        mask_loss = strength * jnp.mean(
            jnp.abs(fg_mask_at_rays - output_dict["opacity"].reshape(B, -1, 1))
        )
        if "opacity_fine" in output_dict:
            mask_loss = mask_loss + strength * jnp.mean(
                jnp.abs(fg_mask_at_rays - output_dict["opacity_fine"].reshape(B, -1, 1))
            )
        loss_dict["fg_mask"] = mask_loss * gate

    if loss_weight.get("distortion") is not None:
        strength = 1e-3 * 2
        dist = strength * regu.lossfun_distortion(output_dict["t"], output_dict["weights"])
        if "weights_fine" in output_dict:
            dist = dist + strength * regu.lossfun_distortion(
                output_dict["t_fine"], output_dict["weights_fine"]
            )
        loss_dict["distortion"] = dist * gate

    if loss_weight.get("depth_patch") is not None:
        strength = 0.01 * 2
        dp = strength * regu.depth_patch_loss(output_dict["depth"], depth_regu_patch_size)
        if "depth_fine" in output_dict:
            dp = dp + strength * regu.depth_patch_loss(
                output_dict["depth_fine"], depth_regu_patch_size
            )
        loss_dict["depth_patch"] = dp * gate

    return loss_dict


def gather_pixels_at_rays(image: Array, ray_idx: Array) -> Array:
    """Gather GT rgb at flat ray indices.

    image: (B,3,H,W); ray_idx: (N,) shared or (B,N) per-image.
    Returns (B,N,3).
    """
    B = image.shape[0]
    flat = image.reshape(B, 3, -1).transpose(0, 2, 1)  # (B,HW,3)
    if ray_idx.ndim == 1:
        return flat[:, ray_idx]
    return jax.vmap(lambda img, idx: img[idx])(flat, ray_idx)


def gather_mask_at_rays(mask: Array, ray_idx: Array) -> Array:
    """mask: (B,1,H,W) or (B,H,W); ray_idx (N,) or (B,N). Returns (B,N,1) float."""
    B = mask.shape[0]
    flat = mask.reshape(B, -1).astype(jnp.float32)
    if ray_idx.ndim == 1:
        out = flat[:, ray_idx]
    else:
        out = jax.vmap(lambda m, idx: m[idx])(flat, ray_idx)
    return out[..., None]
