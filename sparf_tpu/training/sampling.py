"""Ray sampling strategy (reference sampling_strategies.py:23-295).

Pixel pools (all pixels minus patch border / center box / dilated-fg-mask) are
precomputed on host at trainer init; per-iteration sampling runs inside the
jitted step with `jax.random`, static shapes throughout.

Deviation from the reference: the reference samples without replacement
(randperm); we draw i.i.d. uniform indices into the pools. With pools of ~1e5
pixels and ~2e3 draws, expected collisions are <20 — immaterial for SGD, and
it avoids a full permutation per step.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@dataclass
class RaySampler:
    """Static pools + sampling options. Build with `make_ray_sampler`."""

    H: int
    W: int
    nbr_images: int
    all_pixels: Array            # (P,2) int32 xy
    center_pixels: Array         # (Pc,2) int32 xy
    mask_pixels: Optional[Array]  # (B, Pm, 2) padded per-image pools or None
    mask_counts: Optional[Array]  # (B,) valid counts
    min_nbr_in_mask: int
    sample_fraction_in_fg_mask: float
    sampled_fraction_in_center: float
    depth_patch: bool
    patch_size: int
    dxdy: Array                   # (patch_size^2, 2)

    def __call__(
        self, key: Array, nbr_pixels: int, sample_in_center: bool = False
    ) -> Array:
        """Sample flat ray indices y*W+x: (N,) shared or (B,N) per-image."""
        B = self.nbr_images
        n_per_img = nbr_pixels // B
        if self.depth_patch:
            n_per_img = n_per_img // self.patch_size**2
        n_rand = n_per_img

        pixels_in_mask = None
        pixels_in_center = None
        if self.sample_fraction_in_fg_mask > 0.0 and self.mask_pixels is not None:
            n_mask = min(self.min_nbr_in_mask, int(n_rand * self.sample_fraction_in_fg_mask))
            n_rand = n_rand - n_mask
            key, k1 = jax.random.split(key)
            # uniform over each per-image pool via modulo its count
            raw = jax.random.randint(k1, (B, n_mask), 0, 2**31 - 1)
            idx = raw % self.mask_counts[:, None]
            pixels_in_mask = jnp.take_along_axis(
                self.mask_pixels, idx[..., None].astype(jnp.int32), axis=1
            )  # (B, n_mask, 2)
        elif self.sampled_fraction_in_center > 0:
            n_center = int(n_rand * self.sampled_fraction_in_center)
            n_rand = n_rand - n_center
            key, k1 = jax.random.split(key)
            idx = jax.random.randint(k1, (n_center,), 0, self.center_pixels.shape[0])
            pixels_in_center = self.center_pixels[idx]

        key, k2 = jax.random.split(key)
        pool = self.center_pixels if sample_in_center else self.all_pixels
        idx = jax.random.randint(k2, (n_rand,), 0, pool.shape[0])
        random_pixels = pool[idx]  # (n_rand, 2)

        if pixels_in_mask is not None:
            random_pixels = jnp.broadcast_to(random_pixels[None], (B, n_rand, 2))
            random_pixels = jnp.concatenate([random_pixels, pixels_in_mask], axis=1)
        if pixels_in_center is not None:
            random_pixels = jnp.concatenate([random_pixels, pixels_in_center], axis=0)

        if self.depth_patch:
            random_pixels = expand_to_patches(random_pixels, self.dxdy)

        return random_pixels[..., 1] * self.W + random_pixels[..., 0]


def expand_to_patches(pixels: Array, dxdy: Array) -> Array:
    """(...,N,2) -> (...,N*p^2,2): each pixel becomes its p x p patch corner grid
    (sampling_strategies.py:126-142)."""
    p2 = dxdy.shape[0]
    expanded = pixels[..., :, None, :] + dxdy[None, :, :]
    return expanded.reshape(*pixels.shape[:-2], pixels.shape[-2] * p2, 2)


def make_ray_sampler(cfg, scene) -> RaySampler:
    """Build pools from the scene dict on host (cv2 dilation for fg masks)."""
    B, _, H, W = scene["image"].shape
    patch_size = int(cfg.get("depth_regu_patch_size", 2))
    depth_patch = cfg.loss_weight.get("depth_patch") is not None

    # all pixels, minus a patch-sized border when the depth-patch loss is on
    if depth_patch:
        ys, xs = np.mgrid[0 : H - patch_size - 1, 0 : W - patch_size - 1]
    else:
        ys, xs = np.mgrid[0:H, 0:W]
    all_pixels = np.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1).astype(np.int32)

    # center box (precrop)
    frac = float(cfg.get("precrop_frac", 0.5))
    dH, dW = int(H // 2 * frac), int(W // 2 * frac)
    ys, xs = np.mgrid[H // 2 - dH : H // 2 + dH, W // 2 - dW : W // 2 + dW]
    center_pixels = np.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1).astype(np.int32)

    mask_pixels = mask_counts = None
    min_nbr_in_mask = 0
    if cfg.get("sample_fraction_in_fg_mask", 0.0) > 0.0 and "fg_mask" in scene:
        import cv2

        pools = []
        for b in range(B):
            m = scene["fg_mask"][b].reshape(H, W).astype(np.float32)
            dil = cv2.dilate(m, np.ones((3, 3)), iterations=10) > 0
            border = np.zeros_like(dil)
            border[: H - patch_size - 1, : W - patch_size - 1] = True
            dil &= border
            yy, xx = np.where(dil)
            pools.append(np.stack([xx, yy], axis=-1).astype(np.int32))
        min_nbr_in_mask = min(len(p) for p in pools)
        max_count = max(len(p) for p in pools)
        mask_pixels_np = np.zeros((B, max_count, 2), np.int32)
        counts = np.zeros((B,), np.int32)
        for b, p in enumerate(pools):
            mask_pixels_np[b, : len(p)] = p
            counts[b] = len(p)
        mask_pixels = jnp.asarray(mask_pixels_np)
        mask_counts = jnp.asarray(counts)

    yy, xx = np.mgrid[0:patch_size, 0:patch_size]
    dxdy = np.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1).astype(np.int32)

    return RaySampler(
        H=H,
        W=W,
        nbr_images=B,
        all_pixels=jnp.asarray(all_pixels),
        center_pixels=jnp.asarray(center_pixels),
        mask_pixels=mask_pixels,
        mask_counts=mask_counts,
        min_nbr_in_mask=min_nbr_in_mask,
        sample_fraction_in_fg_mask=float(cfg.get("sample_fraction_in_fg_mask", 0.0)),
        sampled_fraction_in_center=float(cfg.get("sampled_fraction_in_center", 0.0)),
        depth_patch=depth_patch,
        patch_size=patch_size,
        dxdy=jnp.asarray(dxdy),
    )
