"""Metric parity vs torch implementations of the reference formulas."""
import math

import numpy as np
import jax.numpy as jnp
import pytest

from sparf_tpu.training import metrics


def _torch_ssim(img1, img2, window_size=11, sigma=1.5):
    """The vendored pytorch_ssim (third_party/pytorch_ssim/ssim.py:8-61)."""
    import torch
    import torch.nn.functional as F

    g = torch.tensor(
        [math.exp(-((x - window_size // 2) ** 2) / (2 * sigma**2)) for x in range(window_size)]
    )
    g = (g / g.sum()).unsqueeze(1)
    w2 = g @ g.t()
    C = img1.size(1)
    window = w2.expand(C, 1, window_size, window_size).contiguous()
    pad = window_size // 2
    mu1 = F.conv2d(img1, window, padding=pad, groups=C)
    mu2 = F.conv2d(img2, window, padding=pad, groups=C)
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    s1 = F.conv2d(img1 * img1, window, padding=pad, groups=C) - mu1_sq
    s2 = F.conv2d(img2 * img2, window, padding=pad, groups=C) - mu2_sq
    s12 = F.conv2d(img1 * img2, window, padding=pad, groups=C) - mu1_mu2
    C1, C2 = 0.01**2, 0.03**2
    m = ((2 * mu1_mu2 + C1) * (2 * s12 + C2)) / ((mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
    return m.mean().item()


def test_ssim_matches_pytorch_ssim():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    a = rng.rand(1, 3, 60, 80).astype(np.float32)
    b = np.clip(a + rng.randn(1, 3, 60, 80).astype(np.float32) * 0.1, 0, 1)
    t = _torch_ssim(torch.from_numpy(a), torch.from_numpy(b))
    j = float(metrics.ssim(jnp.asarray(a), jnp.asarray(b)))
    assert abs(t - j) < 1e-5, (t, j)
    # identical images -> 1
    assert abs(float(metrics.ssim(jnp.asarray(a), jnp.asarray(a))) - 1.0) < 1e-6


def test_psnr_closed_form():
    a = jnp.zeros((1, 3, 8, 8))
    b = jnp.full((1, 3, 8, 8), 0.1)
    np.testing.assert_allclose(float(metrics.psnr(a, b)), -10 * np.log10(0.01), rtol=1e-5)
