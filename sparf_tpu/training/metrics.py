"""Quality metrics: PSNR, SSIM, LPIPS, depth errors, masked metrics.

Parity with reference source/training/core/metrics.py:26-268 and the vendored
pytorch_ssim (third_party/pytorch_ssim/ssim.py:8-61, 11x11 gaussian window,
sigma=1.5, C1=0.01^2, C2=0.03^2).
"""
from __future__ import annotations

import math
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


# ---------------------------------------------------------------------------
# PSNR / mse
# ---------------------------------------------------------------------------


def mse(pred: Array, label: Array, mask: Optional[Array] = None) -> Array:
    d = (pred - label) ** 2
    if mask is not None:
        m = jnp.broadcast_to(mask.astype(d.dtype), d.shape)
        return jnp.sum(d * m) / (jnp.sum(m) + 1e-9)
    return jnp.mean(d)


def psnr(pred: Array, label: Array, mask: Optional[Array] = None) -> Array:
    return -10.0 * jnp.log10(mse(pred, label, mask) + 1e-12)


def compute_mse_on_rays(image_at_rays: Array, output_dict: Dict[str, Array]):
    """MSE between rendered rays and GT pixels; returns (coarse, fine-or-None)."""
    B = image_at_rays.shape[0]
    m_coarse = mse(output_dict["rgb"].reshape(B, -1, 3), image_at_rays)
    m_fine = None
    if "rgb_fine" in output_dict:
        m_fine = mse(output_dict["rgb_fine"].reshape(B, -1, 3), image_at_rays)
    return m_coarse, m_fine


# ---------------------------------------------------------------------------
# SSIM (pytorch_ssim parity)
# ---------------------------------------------------------------------------


def _gaussian_window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.array(
        [math.exp(-((x - window_size // 2) ** 2) / (2 * sigma**2)) for x in range(window_size)]
    )
    g = g / g.sum()
    w2d = np.outer(g, g)
    return w2d.astype(np.float32)


def _depthwise_conv(img: Array, window: Array) -> Array:
    """img (B,C,H,W), window (k,k); per-channel 'same' conv.

    precision=HIGHEST is load-bearing on TPU: the default bf16 MXU pass makes
    the E[x^2]-E[x]^2 variance estimates in ssim() catastrophically cancel
    (negative variances -> SSIM > 1, observed 1.42-1.58 on-device while the
    identical inputs give 0.65 on CPU). The reference computes these convs in
    f32 (pytorch_ssim/ssim.py), so full precision is also the parity choice.
    """
    C = img.shape[1]
    kernel = jnp.broadcast_to(window, (C, 1, *window.shape))  # (C,1,k,k)
    return jax.lax.conv_general_dilated(
        img,
        kernel,
        window_strides=(1, 1),
        padding="SAME",
        feature_group_count=C,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )


def ssim(img1: Array, img2: Array, window_size: int = 11, size_average: bool = True) -> Array:
    """SSIM on (B,C,H,W) images in [0,1]."""
    window = jnp.asarray(_gaussian_window(window_size))
    mu1 = _depthwise_conv(img1, window)
    mu2 = _depthwise_conv(img2, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    sigma1_sq = _depthwise_conv(img1 * img1, window) - mu1_sq
    sigma2_sq = _depthwise_conv(img2 * img2, window) - mu2_sq
    sigma12 = _depthwise_conv(img1 * img2, window) - mu1_mu2
    C1, C2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    if size_average:
        return jnp.mean(ssim_map)
    return jnp.mean(ssim_map, axis=(1, 2, 3))


# ---------------------------------------------------------------------------
# depth errors (metrics.py:80-185)
# ---------------------------------------------------------------------------


def compute_depth_error_on_rays(
    depth_gt_at_rays: Array,
    valid_at_rays: Array,
    pred_depth: Array,
    scaling_factor_for_pred_depth: float | Array = 1.0,
) -> Tuple[Array, Array]:
    """Masked abs/rmse depth error at rays. Shapes (B,N,1)/(B,N)/(B,N,1)."""
    valid = valid_at_rays.reshape(-1).astype(jnp.float32)
    gt = depth_gt_at_rays.reshape(-1)
    pred = pred_depth.reshape(-1) * scaling_factor_for_pred_depth
    abs_e = jnp.sum(jnp.abs(gt - pred) * valid) / (jnp.sum(valid) + 1e-6)
    rmse = jnp.sqrt(jnp.sum((gt - pred) ** 2 * valid) / (jnp.sum(valid) + 1e-6))
    return abs_e, rmse


def compute_depth_error(
    depth_gt: Array,
    valid_depth_gt: Array,
    pred_depth: Array,
    scaling_factor_for_pred_depth: float = 1.0,
) -> Tuple[float, float]:
    """Full-image depth error; takes min over {scaled, unscaled} when a sim3
    scale ambiguity exists (metrics.py:176-181). Host-side floats."""

    def metric(scale):
        a, r = compute_depth_error_on_rays(depth_gt, valid_depth_gt, pred_depth, scale)
        return float(a), float(r)

    if scaling_factor_for_pred_depth != 1.0:
        a0, r0 = metric(1.0)
        a1, r1 = metric(scaling_factor_for_pred_depth)
        return min(a0, a1), min(r0, r1)
    return metric(1.0)


# ---------------------------------------------------------------------------
# full metric bundles (metrics.py:186-268)
# ---------------------------------------------------------------------------


def compute_metrics_masked(
    fg_mask: Array,
    pred_rgb_map: Array,
    gt_rgb_map: Array,
    lpips_fn: Optional[Callable] = None,
    suffix: str = "",
) -> Dict[str, float]:
    """Composite fg onto white, then PSNR(in-mask)/SSIM/LPIPS (metrics.py:186-215)."""
    mask_float = fg_mask.astype(jnp.float32)
    if mask_float.ndim == 3:
        mask_float = mask_float[:, None]
    mask = mask_float == 1.0
    rgb_fg = pred_rgb_map * mask_float + (1.0 - mask_float)
    gt_fg = gt_rgb_map * mask_float + (1.0 - mask_float)
    out = {
        "psnr_masked" + suffix: float(psnr(rgb_fg, gt_fg, mask)),
        "ssim_masked" + suffix: float(ssim(rgb_fg, gt_fg)),
    }
    if lpips_fn is not None:
        out["lpips_masked" + suffix] = float(lpips_fn(rgb_fg * 2 - 1, gt_fg * 2 - 1))
    return out


def compute_metrics(
    pred_rgb_map: Array,
    gt_rgb_map: Array,
    pred_depth: Optional[Array] = None,
    depth_gt: Optional[Array] = None,
    valid_depth_gt: Optional[Array] = None,
    fg_mask: Optional[Array] = None,
    lpips_fn: Optional[Callable] = None,
    scaling_factor_for_pred_depth: float = 1.0,
    suffix: str = "",
) -> Dict[str, float]:
    """Full-image PSNR/SSIM/LPIPS [+depth errors +masked variants]."""
    results = {
        "psnr" + suffix: float(psnr(pred_rgb_map, gt_rgb_map)),
        "ssim" + suffix: float(ssim(pred_rgb_map, gt_rgb_map)),
    }
    if lpips_fn is not None:
        results["lpips" + suffix] = float(lpips_fn(pred_rgb_map * 2 - 1, gt_rgb_map * 2 - 1))
    if depth_gt is not None and pred_depth is not None:
        abs_e, rmse = compute_depth_error(
            depth_gt, valid_depth_gt, pred_depth, scaling_factor_for_pred_depth
        )
        results["abse_depth" + suffix] = abs_e
        results["rmse_depth" + suffix] = rmse
    else:
        results["abse_depth" + suffix] = float("nan")
        results["rmse_depth" + suffix] = float("nan")
    if fg_mask is not None:
        results.update(
            compute_metrics_masked(fg_mask, pred_rgb_map, gt_rgb_map, lpips_fn, suffix)
        )
    return results
