#!/usr/bin/env python
"""Self-supervised training of the JAX LPIPS net (no external data/weights).

The reference evaluates with pip-lpips alex weights (base.py:46); this
environment has no pretrained checkpoints and no egress, so we train the same
architecture (sparf_tpu/training/lpips_jax.py) on a 2AFC *distortion-severity
ranking* objective, the self-supervised analog of LPIPS's BAPPS 2AFC task:

  for a clean patch x and one distortion family at two severities s1 < s2,
  require  d(x, D(x, s2)) > d(x, D(x, s1)) + margin.

Families (blur, white noise, block artifacts, contrast, brightness, shift,
color cast, mixed) are parameterized so severity is monotone in perceptual
degradation. Patches are procedural (filtered noise, gradients, random
polygons) plus renders of the analytic synthetic scenes.

Validation on held-out patches/severities reports ranking accuracy and
agreement with SSIM orderings. Weights land in
sparf_tpu/data/lpips_selfsup.npz and are auto-loaded by LPIPS() (tag 'lpips';
provenance recorded in the npz and README).

Usage: python scripts/train_lpips_selfsup.py [--steps 4000] [--batch 16]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

PATCH = 64


# ---------------------------------------------------------------------------
# procedural clean patches
# ---------------------------------------------------------------------------


def _smooth_noise(rng, scale):
    import cv2

    img = rng.rand(PATCH, PATCH, 3).astype(np.float32)
    k = 2 * int(scale) + 1
    return cv2.GaussianBlur(img, (k, k), scale)


def _gradient(rng):
    xx, yy = np.meshgrid(np.linspace(0, 1, PATCH), np.linspace(0, 1, PATCH))
    a, b = rng.rand(2)
    base = a * xx + (1 - a) * yy
    img = np.stack([base, base * b, 1 - base], -1).astype(np.float32)
    return np.clip(img + 0.1 * rng.randn(PATCH, PATCH, 3), 0, 1).astype(np.float32)


def _polygons(rng):
    import cv2

    img = np.full((PATCH, PATCH, 3), rng.rand(3), np.float32)
    for _ in range(rng.randint(3, 8)):
        pts = (rng.rand(rng.randint(3, 6), 2) * PATCH).astype(np.int32)
        color = tuple(float(c) for c in rng.rand(3))
        cv2.fillPoly(img, [pts], color)
    img = cv2.GaussianBlur(img, (3, 3), 0.8)
    return img.astype(np.float32)


def _scene_crop(scene_imgs, rng):
    i = rng.randint(len(scene_imgs))
    img = scene_imgs[i]
    H, W = img.shape[:2]
    y = rng.randint(0, max(H - PATCH, 1))
    x = rng.randint(0, max(W - PATCH, 1))
    return img[y : y + PATCH, x : x + PATCH].astype(np.float32)


def make_clean(scene_imgs, rng):
    r = rng.rand()
    if r < 0.3:
        return _smooth_noise(rng, rng.choice([1, 2, 3]))
    if r < 0.5:
        return _gradient(rng)
    if r < 0.7:
        return _polygons(rng)
    return _scene_crop(scene_imgs, rng)


# ---------------------------------------------------------------------------
# distortions, monotone in severity s in (0, 1]
# ---------------------------------------------------------------------------


def _blur(img, s, rng):
    import cv2

    sigma = 0.5 + 4.0 * s
    return cv2.GaussianBlur(img, (0, 0), sigma)


def _noise(img, s, rng):
    return np.clip(img + rng.randn(*img.shape).astype(np.float32) * 0.4 * s, 0, 1)


def _blocks(img, s, rng):
    import cv2

    f = max(int(PATCH * (1.0 - 0.85 * s)), 4)
    small = cv2.resize(img, (f, f), interpolation=cv2.INTER_AREA)
    return cv2.resize(small, (PATCH, PATCH), interpolation=cv2.INTER_NEAREST)


def _contrast(img, s, rng):
    return np.clip((img - 0.5) * (1.0 - 0.9 * s) + 0.5, 0, 1)


def _brightness(img, s, rng):
    sign = 1.0 if rng.rand() < 0.5 else -1.0
    return np.clip(img + sign * 0.6 * s, 0, 1)


def _shift(img, s, rng):
    import cv2

    d = 1.0 + 7.0 * s
    ang = rng.rand() * 2 * np.pi
    M = np.float32([[1, 0, d * np.cos(ang)], [0, 1, d * np.sin(ang)]])
    return cv2.warpAffine(img, M, (PATCH, PATCH), borderMode=cv2.BORDER_REFLECT)


def _cast(img, s, rng):
    cast = (rng.rand(3) - 0.5) * 1.2 * s
    return np.clip(img + cast[None, None], 0, 1).astype(np.float32)


def _mixed(img, s, rng):
    a = _blur(img, 0.6 * s, rng)
    return _noise(a, 0.6 * s, rng)


FAMILIES = [_blur, _noise, _blocks, _contrast, _brightness, _shift, _cast, _mixed]


def make_triplet(scene_imgs, rng):
    """(clean, mild, severe) with severities s1 < s2 from one family.

    The gap is kept NARROW (0.08-0.35): with wide gaps even random features
    rank correctly ~98% of the time; close severities are where trained
    features must earn their keep."""
    x = make_clean(scene_imgs, rng)
    fam = FAMILIES[rng.randint(len(FAMILIES))]
    s1 = 0.05 + 0.5 * rng.rand()
    s2 = min(s1 + 0.08 + 0.27 * rng.rand(), 0.97)
    d1 = fam(x, s1, rng)
    d2 = fam(x, s2, rng)
    return x, d1, d2


def _to_nchw(a):
    return np.stack(a).transpose(0, 3, 1, 2) * 2.0 - 1.0  # NCHW [-1,1]


def batch_triplets(scene_imgs, rng, n):
    xs, m, sv = [], [], []
    for _ in range(n):
        x, d1, d2 = make_triplet(scene_imgs, rng)
        xs.append(x)
        m.append(d1)
        sv.append(d2)
    return _to_nchw(xs), _to_nchw(m), _to_nchw(sv)


def batch_cross(scene_imgs, rng, n):
    """(ref, distA, distB) with INDEPENDENT families/severities per side —
    the cross-family 2AFC pairs labeled by the SSIM+PSNR committee."""
    xs, a, b = [], [], []
    for _ in range(n):
        x = make_clean(scene_imgs, rng)
        fa = FAMILIES[rng.randint(len(FAMILIES))]
        fb = FAMILIES[rng.randint(len(FAMILIES))]
        a.append(fa(x, 0.05 + 0.9 * rng.rand(), rng))
        b.append(fb(x, 0.05 + 0.9 * rng.rand(), rng))
        xs.append(x)
    return _to_nchw(xs), _to_nchw(a), _to_nchw(b)


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--margin", type=float, default=0.05)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "sparf_tpu", "data", "lpips_selfsup.npz"))
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from sparf_tpu.training import lpips_jax
    from sparf_tpu.datasets.synthetic import load_synthetic_scene

    # clean sources: analytic scene renders at several views + resolutions
    scene_imgs = []
    for hw in ((120, 160), (90, 120)):
        sc = load_synthetic_scene(split="train", H=hw[0], W=hw[1], n_train=6, n_test=1)
        scene_imgs += [im.transpose(1, 2, 0) for im in sc["image"]]

    rng = np.random.RandomState(args.seed)
    params = {k: jnp.asarray(v) for k, v in
              lpips_jax._init_random_params(args.seed).items()}

    shift = jnp.asarray(lpips_jax._SHIFT)
    scale = jnp.asarray(lpips_jax._SCALE)

    def dist(p, a, b):
        f1 = lpips_jax._features(p, (a - shift) / scale)
        f2 = lpips_jax._features(p, (b - shift) / scale)
        tot = 0.0
        for i, (u, v) in enumerate(zip(f1, f2)):
            d = (lpips_jax._normalize_tensor(u) - lpips_jax._normalize_tensor(v)) ** 2
            w = jax.nn.relu(p[f"lin{i}_w"]).reshape(1, -1, 1, 1)  # lpips clamps lins >= 0
            tot = tot + jnp.mean(jnp.sum(d * w, axis=1), axis=(1, 2))
        return tot  # (N,)

    from sparf_tpu.training import metrics as metrics_mod

    def per_sample_ssim(a, b):
        return metrics_mod.ssim(a, b, size_average=False)

    def per_sample_psnr(a, b):
        mse = jnp.mean((a - b) ** 2, axis=(1, 2, 3))
        return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))

    def loss_fn(p, x, mild, severe, xc, ca, cb):
        # (1) same-family severity ranking — clean self-supervised labels
        d_m = dist(p, x, mild)
        d_s = dist(p, x, severe)
        rank = jnp.mean(jax.nn.relu(args.margin + d_m - d_s))
        # (2) CROSS-family 2AFC distilled from an unambiguous SSIM+PSNR
        # committee: only pairs where both metrics agree by a margin carry a
        # label. This is where feature quality matters (severity ranking is
        # nearly saturated by random features) and anchors the trained net to
        # SSIM orderings on easy pairs while staying perceptual on hard ones.
        d_a = dist(p, xc, ca)
        d_b = dist(p, xc, cb)
        s_a = per_sample_ssim(xc, ca)
        s_b = per_sample_ssim(xc, cb)
        q_a = per_sample_psnr(xc, ca)
        q_b = per_sample_psnr(xc, cb)
        b_worse = ((s_b < s_a - 0.02) & (q_b < q_a - 0.5)).astype(jnp.float32)
        a_worse = ((s_a < s_b - 0.02) & (q_a < q_b - 0.5)).astype(jnp.float32)
        cross = jnp.sum(
            b_worse * jax.nn.relu(args.margin + d_a - d_b)
            + a_worse * jax.nn.relu(args.margin + d_b - d_a)
        ) / jnp.maximum(jnp.sum(b_worse + a_worse), 1.0)
        # keep distances in a sane range (prevents collapse-to-zero / blowup)
        reg = jnp.mean((d_s - 0.5) ** 2) * 0.01
        return rank + cross + reg, (jnp.mean((d_s > d_m).astype(jnp.float32)))

    tx = optax.adam(args.lr)
    opt = tx.init(params)

    @jax.jit
    def step(p, opt, x, m, s, xc, ca, cb):
        (l, acc), g = jax.value_and_grad(loss_fn, has_aux=True)(p, x, m, s, xc, ca, cb)
        upd, opt = tx.update(g, opt, p)
        return optax.apply_updates(p, upd), opt, l, acc

    for it in range(args.steps):
        x, m, s = batch_triplets(scene_imgs, rng, args.batch)
        xc, ca, cb = batch_cross(scene_imgs, rng, args.batch)
        params, opt, l, acc = step(params, opt, jnp.asarray(x), jnp.asarray(m),
                                   jnp.asarray(s), jnp.asarray(xc),
                                   jnp.asarray(ca), jnp.asarray(cb))
        if it % 200 == 0 or it == args.steps - 1:
            print(f"step {it}: loss={float(l):.4f} batch_acc={float(acc):.3f}",
                  flush=True)

    # ---------------- held-out validation (trained vs random baseline) ----
    rand_params = {k: jnp.asarray(v) for k, v in
                   lpips_jax._init_random_params(args.seed + 7).items()}

    def validate(p):
        rng_val = np.random.RandomState(args.seed + 1234)
        n_ok = n_tot = 0
        com_agree = com_tot = 0
        for _ in range(40):
            x, m, s = batch_triplets(scene_imgs, rng_val, 8)
            d_m = np.asarray(dist(p, jnp.asarray(x), jnp.asarray(m)))
            d_s = np.asarray(dist(p, jnp.asarray(x), jnp.asarray(s)))
            n_ok += int((d_s > d_m).sum())
            n_tot += len(d_m)
            # cross-family pairs: agreement with the unambiguous SSIM+PSNR
            # committee (the training signal, held-out samples)
            xc, ca, cb = batch_cross(scene_imgs, rng_val, 8)
            xj, aj, bj = jnp.asarray(xc), jnp.asarray(ca), jnp.asarray(cb)
            d_a = np.asarray(dist(p, xj, aj))
            d_b = np.asarray(dist(p, xj, bj))
            s_a = np.asarray(per_sample_ssim(xj, aj))
            s_b = np.asarray(per_sample_ssim(xj, bj))
            q_a = np.asarray(per_sample_psnr(xj, aj))
            q_b = np.asarray(per_sample_psnr(xj, bj))
            for i in range(len(d_a)):
                if s_b[i] < s_a[i] - 0.02 and q_b[i] < q_a[i] - 0.5:
                    com_tot += 1
                    com_agree += int(d_b[i] > d_a[i])
                elif s_a[i] < s_b[i] - 0.02 and q_a[i] < q_b[i] - 0.5:
                    com_tot += 1
                    com_agree += int(d_a[i] > d_b[i])
        return n_ok / max(n_tot, 1), com_agree / max(com_tot, 1)

    rank_acc, agree = validate(params)
    rand_acc, rand_agree = validate(rand_params)
    print(f"held-out severity ranking accuracy: trained={rank_acc:.3f} "
          f"random-baseline={rand_acc:.3f}; committee (SSIM+PSNR) cross-pair "
          f"agreement: trained={agree:.3f} random={rand_agree:.3f}")

    out = {k: np.asarray(v) for k, v in params.items()}
    for i in range(5):
        out[f"lin{i}_w"] = np.maximum(out[f"lin{i}_w"], 0.0)
    out["provenance"] = np.array(
        f"self-supervised 2AFC severity ranking, steps={args.steps}, "
        f"rank_acc={rank_acc:.3f}, ssim_agree={agree:.3f}"
    )
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.savez(args.out, **out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
