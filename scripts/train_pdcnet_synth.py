#!/usr/bin/env python
"""Train the JAX PDC-Net-style dense matcher on synthetic multi-view GT flow.

The framework can render unlimited (image pair, exact GT correspondence map,
occlusion mask) tuples from the analytic sphere scenes (VERDICT r2 #2). This
script:

  1. generates a pool of randomized two-view rigs (camera ring position,
     baseline angle up to --max_angle rad, focal, texture octaves) with GT
     correspondences from analytic depth (flow_net.gt_correspondences_for_pair);
  2. trains pdcnet_jax with deep supervision at /8, /4, /2 + Laplacian-mixture
     NLL for the confidence head, under photometric augmentation (per-view
     exposure/color gain, bias, sensor noise, vignetting) so the learned
     matcher is robust where the classical one is brittle;
  3. evaluates median EPE-in-confident vs GT on the RESULTS.md ladder rungs
     (angular_span 0.35 / 1.0, 3 views, 300x400);
  4. saves sparf_tpu/data/pdcnet_synth.npz (with provenance) which the
     PDCNet backend auto-loads (flow_net._resolve_backend).

Usage: python scripts/train_pdcnet_synth.py [--steps 3000] [--pairs 240]
       [--H 300 --W 400] [--out sparf_tpu/data/pdcnet_synth.npz] [--cpu]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def generate_pairs(rng: np.random.RandomState, n_pairs: int, H: int, W: int):
    """Randomized two-view rigs over the analytic scene, with GT corres in
    BOTH pair orders (dir 0: view0->view1, dir 1: view1->view0) — training on
    both orders with the bias penalty below is the round-5 de-biasing recipe
    (a direction-coherent ~0.3-0.6 px mean flow error floored raw joint pose
    refinement at 2.18 deg, VERDICT r4 #2)."""
    from sparf_tpu.datasets import synthetic as syn
    from sparf_tpu.models.flow_net import gt_correspondences_for_pair

    imgs = np.zeros((n_pairs, 2, 3, H, W), np.float32)
    corres = np.zeros((n_pairs, 2, 2, H, W), np.float32)
    valid = np.zeros((n_pairs, 2, H, W), bool)
    for i in range(n_pairs):
        a0 = rng.uniform(-1.3, 1.3)
        da = rng.uniform(0.06, 1.0) * rng.choice([-1.0, 1.0])
        rad = syn.CAM_RADIUS * rng.uniform(0.85, 1.15)
        focal = W * rng.uniform(0.75, 1.05)
        octaves = rng.randint(1, 5)
        intr = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]], np.float32)
        views = []
        for a, h in ((a0, rng.uniform(-0.3, 0.3)), (a0 + da, rng.uniform(-0.3, 0.3))):
            eye = np.array([np.sin(a) * rad, h, -np.cos(a) * rad], np.float32)
            pose = syn.look_at_pose_w2c(eye)
            img, depth, fg = syn.render_view(pose, intr, H, W, octaves)
            views.append((img, depth, fg, pose))
        scene = dict(
            image=np.stack([v[0].transpose(2, 0, 1) for v in views]),
            depth_gt=np.stack([v[1] for v in views]),
            valid_depth_gt=np.stack([v[2] for v in views]),
            pose=np.stack([v[3] for v in views]),
            intr=np.stack([intr, intr]),
        )
        imgs[i] = scene["image"]
        for d, (a, b) in enumerate(((0, 1), (1, 0))):
            cmap, mask = gt_correspondences_for_pair(scene, a, b)
            corres[i, d] = cmap
            valid[i, d] = mask
        if (i + 1) % 40 == 0:
            print(f"  generated {i + 1}/{n_pairs} pairs")
    return imgs, corres, valid


def photometric_aug(key, img):
    """Per-view exposure/color gain + bias + sensor noise + vignetting."""
    import jax
    import jax.numpy as jnp

    B, C, H, W = img.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    gain = jnp.exp(jax.random.uniform(k1, (B, 3, 1, 1), minval=-0.25, maxval=0.25))
    bias = jax.random.uniform(k2, (B, 1, 1, 1), minval=-0.06, maxval=0.06)
    noise = 0.012 * jax.random.normal(k3, img.shape)
    yy = (jnp.arange(H) / (H - 1) - 0.5)[None, None, :, None]
    xx = (jnp.arange(W) / (W - 1) - 0.5)[None, None, None, :]
    r2 = (xx**2 + yy**2) / 0.5
    vig_k = jax.random.uniform(k4, (B, 1, 1, 1), minval=0.0, maxval=0.35)
    return jnp.clip(img * gain * (1 - vig_k * r2) + bias + noise, 0.0, 1.0)


def make_zoom_aug(H: int, W: int, zoom_min: float = 0.72, zoom_max: float = 1.35):
    """Per-sample independent center-zoom of target and source + the exact
    GT-correspondence transform (multi-resolution training, VERDICT r4 #2:
    the matcher's known cross-resolution weakness). With per-view factors
    f_t, f_s and S_f(u) = c + f*(u-c):

        tgt'(u) = tgt(S_ft(u)),  src'(u) = src(S_fs(u)),
        m'(u)   = S_fs^{-1}( m( S_ft(u) ) )

    so displacements rescale by ~f_t/f_s — the net sees flow statistics of
    multiple effective resolutions AND scale-mismatched pairs. Validity is
    resampled through S_ft and gated to in-bounds samples."""
    import jax
    import jax.numpy as jnp
    from jax.scipy.ndimage import map_coordinates

    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
    uu, vv = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                          jnp.arange(H, dtype=jnp.float32))

    def zoom_one(key, tgt, src, gt, v):
        kt, ks = jax.random.split(key)
        ft = jax.random.uniform(kt, (), minval=zoom_min, maxval=zoom_max)
        fs = jax.random.uniform(ks, (), minval=zoom_min, maxval=zoom_max)
        xt = cx + ft * (uu - cx)
        yt = cy + ft * (vv - cy)
        xs = cx + fs * (uu - cx)
        ys = cy + fs * (vv - cy)

        def samp(img, xx, yy):
            return jnp.stack([
                map_coordinates(ch, [yy, xx], order=1, mode="constant")
                for ch in img
            ])

        tgt2 = samp(tgt, xt, yt)
        src2 = samp(src, xs, ys)
        m_at = samp(gt, xt, yt)                      # m(S_ft(u)), (2,H,W)
        gt2 = jnp.stack([cx + (m_at[0] - cx) / fs, cy + (m_at[1] - cy) / fs])
        v_at = map_coordinates(v, [yt, xt], order=1, mode="constant")
        inb = ((xt >= 0) & (xt <= W - 1) & (yt >= 0) & (yt <= H - 1))
        v2 = jnp.where(inb, v_at, 0.0)
        return tgt2, src2, gt2, v2

    return jax.vmap(zoom_one)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--pairs", type=int, default=240)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--H", type=int, default=300)
    ap.add_argument("--W", type=int, default=400)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--bias_weight", type=float, default=0.7,
                    help="weight of the per-sample mean-signed-error penalty "
                         "(the de-biasing term; raise for a de-bias-focused "
                         "fine-tune rung)")
    ap.add_argument("--zoom_min", type=float, default=0.72)
    ap.add_argument("--zoom_max", type=float, default=1.35,
                    help="zoom-aug upper bound; 2.0 covers inference at half "
                         "the training resolution (the cross-resolution "
                         "weakness, VERDICT r4 #2)")
    ap.add_argument("--out", default="sparf_tpu/data/pdcnet_synth.npz")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--eval-only", default=None, help="npz to evaluate (skip training)")
    ap.add_argument("--data_cache", default=None,
                    help="npz path for the generated pair set: loaded if it "
                         "exists, else generated and saved (generation is "
                         "host-side numpy and slow on this 1-core machine)")
    ap.add_argument("--gen_only", action="store_true",
                    help="generate + save the pair cache, then exit")
    ap.add_argument("--init_from", default=None,
                    help="warm-start weights npz (e.g. a lower-resolution run)")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import optax

    from sparf_tpu.models import pdcnet_jax as P

    if args.eval_only:
        params = P.load_weights_npz(args.eval_only)
    else:
        if args.data_cache and os.path.exists(args.data_cache):
            print(f"loading pair cache {args.data_cache}")
            d = np.load(args.data_cache)
            imgs_np, corres_np, valid_np = d["imgs"], d["corres"], d["valid"]
            assert corres_np.ndim == 5, (
                "stale single-direction pair cache — regenerate (corres must "
                "be (n,2dirs,2,H,W) since the round-5 symmetrized training)")
            assert imgs_np.shape[0] >= args.pairs, "cache smaller than --pairs"
            imgs_np, corres_np, valid_np = (
                imgs_np[: args.pairs], corres_np[: args.pairs], valid_np[: args.pairs]
            )
        else:
            print(f"generating {args.pairs} training pairs at {args.H}x{args.W} ...")
            rng = np.random.RandomState(args.seed)
            t0 = time.time()
            imgs_np, corres_np, valid_np = generate_pairs(rng, args.pairs, args.H, args.W)
            print(f"  done in {time.time() - t0:.0f}s")
            if args.data_cache:
                np.savez_compressed(args.data_cache, imgs=imgs_np,
                                    corres=corres_np, valid=valid_np)
                print(f"saved pair cache {args.data_cache}")
        if args.gen_only:
            return

        # keep the pair pool on device as uint8 (4x less tunnel transfer +
        # HBM); converted back to f32 per sampled batch inside the jitted step
        imgs = jnp.asarray(np.clip(imgs_np * 255.0 + 0.5, 0, 255).astype(np.uint8))
        corres = jnp.asarray(corres_np)
        valid = jnp.asarray(valid_np)  # bool on device; f32 per batch in-step

        if args.init_from:
            print(f"warm-starting from {args.init_from}")
            params = P.load_weights_npz(args.init_from)
        else:
            params = P.init_params(jax.random.PRNGKey(args.seed))
        sched = optax.cosine_decay_schedule(args.lr, args.steps, alpha=0.05)
        tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(sched))
        ost = tx.init(params)

        zoom_aug = make_zoom_aug(args.H, args.W, args.zoom_min, args.zoom_max)

        def loss_fn(params, batch_tgt, batch_src, batch_corres, batch_valid, key):
            k_t, k_s, k_z = jax.random.split(key, 3)
            tgt, src, batch_corres, batch_valid = zoom_aug(
                jax.random.split(k_z, batch_tgt.shape[0]),
                batch_tgt, batch_src, batch_corres, batch_valid,
            )
            tgt = photometric_aug(k_t, tgt)
            src = photometric_aug(k_s, src)
            out = P.forward(params, tgt, src)

            total = 0.0
            logs = {}
            for lev, w_lev in ((8, 1.0), (4, 0.5), (2, 0.5)):
                m = out["mapping"] if lev == 2 else out[f"mapping{lev}"]
                B, _, h, w = m.shape
                gt = jax.image.resize(batch_corres / lev, (B, 2, h, w), "bilinear")
                v = jax.image.resize(batch_valid[:, None], (B, 1, h, w), "bilinear")
                v = (v > 0.99).astype(jnp.float32)  # erode: no mixed-border supervision
                err = jnp.linalg.norm(m - gt, axis=1, keepdims=True)
                huber = jnp.where(err < 1.0, 0.5 * err**2, err - 0.5)
                total = total + w_lev * jnp.sum(huber * v) / (jnp.sum(v) + 1.0)
                if lev == 2:
                    logs["epe2"] = jnp.sum(err * v) / (jnp.sum(v) + 1.0)
                    # per-sample mean SIGNED error penalty (de-biasing,
                    # VERDICT r4 #2): a coherent per-pair flow bias shifts
                    # every correspondence the same way and bends pose
                    # estimation systematically — epe/huber cannot see it,
                    # so penalize the masked mean residual vector directly
                    bias_vec = (jnp.sum((m - gt) * v, axis=(2, 3))
                                / (jnp.sum(v, axis=(2, 3)) + 1.0))  # (B,2)
                    bias_mag = jnp.sqrt(jnp.sum(bias_vec**2, axis=1) + 1e-8)
                    logs["bias2"] = jnp.mean(bias_mag) * 2.0  # full-res px
                    total = total + args.bias_weight * jnp.mean(bias_mag)
                    # mixture NLL trains the confidence head (PDC-Net eq. 6)
                    def nll(var):
                        b = jnp.sqrt(jnp.maximum(var, 1e-6) / 2)
                        return err / b + 2 * jnp.log(b)

                    m_nll = -jnp.log(
                        out["alpha"] * jnp.exp(-nll(jnp.exp(out["log_var_s"])))
                        + (1 - out["alpha"]) * jnp.exp(-nll(jnp.exp(out["log_var_l"])))
                        + 1e-9
                    )
                    total = total + 0.1 * jnp.sum(m_nll * v) / (jnp.sum(v) + 1.0)
            return total, logs

        # everything (RNG, batch indexing, the update) lives INSIDE one jitted
        # scan over a chunk of steps: host<->device round-trips through the
        # axon tunnel cost ~100ms each, so per-step host-side jax.random calls
        # would dominate (PERF_NOTES operational gotchas)
        base_key = jax.random.PRNGKey(args.seed + 1)

        # the pair pool MUST be a jit ARGUMENT, not a closure: closed-over
        # arrays are embedded as HLO constants, and the axon remote-compile
        # request then exceeds the server's body limit (HTTP 413) at ~400MB
        @jax.jit
        def run_chunk(params, ost, it0, imgs, corres, valid):
            def one_step(carry, it):
                params, ost = carry
                k = jax.random.fold_in(base_key, it)
                k_idx, k_dir, k_aug = jax.random.split(k, 3)
                idx = jax.random.randint(k_idx, (args.batch,), 0, args.pairs)
                # symmetrize: sample each pair in a random ORDER (dir 0:
                # v0->v1, dir 1: v1->v0) — a matcher trained one-way learns a
                # direction-coherent bias the pose solvers then integrate
                dr = jax.random.randint(k_dir, (args.batch,), 0, 2)
                ar = jnp.arange(args.batch)
                batch_imgs = imgs[idx].astype(jnp.float32) / 255.0
                batch_tgt = batch_imgs[ar, dr]
                batch_src = batch_imgs[ar, 1 - dr]
                (l, logs), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, batch_tgt, batch_src, corres[idx][ar, dr],
                    valid[idx][ar, dr].astype(jnp.float32), k_aug
                )
                upd, ost = tx.update(g, ost, params)
                return (optax.apply_updates(params, upd), ost), (
                    l, logs["epe2"], logs["bias2"])

            (params, ost), (ls, epes, biases) = jax.lax.scan(
                one_step, (params, ost), it0 + jnp.arange(100)
            )
            return params, ost, ls[-1], epes[-1], biases[-1]

        chunk = 100
        t0 = time.time()
        for it in range(0, args.steps, chunk):
            params, ost, l, epe2, bias2 = run_chunk(
                params, ost, jnp.asarray(it), imgs, corres, valid
            )
            print(f"step {it + chunk - 1}: loss={float(l):.4f} "
                  f"epe@/2={float(epe2):.3f}px bias={float(bias2):.3f}px "
                  f"({(time.time() - t0):.0f}s)", flush=True)
            if it and it % 400 == 0:
                P.save_weights_npz(params, args.out + f".step{it}")

        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        P.save_weights_npz(params, args.out)
        # provenance inside the npz (same convention as lpips_selfsup.npz)
        flat = dict(np.load(args.out))
        flat["provenance"] = np.asarray(
            f"trained in-session on {args.pairs} synthetic multi-view pairs "
            f"({args.H}x{args.W}, analytic GT flow, photometric aug, "
            f"symmetrized pair orders, mean-signed-error penalty "
            f"w={args.bias_weight}, per-view zoom aug "
            f"{args.zoom_min}-{args.zoom_max}), steps={args.steps}, "
            f"seed={args.seed}"
            + (f", warm-started from {args.init_from}" if args.init_from else "")
        )
        np.savez_compressed(args.out, **flat)
        print(f"saved {args.out}")

    # ---- ladder eval: median EPE over confident px vs GT, per rung
    from sparf_tpu.datasets.synthetic import load_synthetic_scene
    from sparf_tpu.models import flow_net as F

    print("\n== ladder eval (median EPE in p_r>0.95, vs GT flow) ==")
    for span in (0.35, 1.0):
        sc = load_synthetic_scene(split="train", H=args.H, W=args.W, n_train=3,
                                  n_test=1, angular_span=span, texture_octaves=2)
        combi = F.get_combi_list(3, "all")
        gt_corres, gt_conf = F.compute_gt_flow_of_combi_list(sc, combi)
        c, conf = P.compute_pdcnet_flow_of_combi_list(
            np.asarray(sc["image"]), combi, params=params
        )
        meds, fracs, biases = [], [], []
        for p in range(combi.shape[1]):
            m = (conf[p, 0] > 0.95) & (gt_conf[p, 0] > 0.5)
            if m.sum() < 10:
                meds.append(np.inf)
                fracs.append(0.0)
                biases.append(np.inf)
                continue
            diff = (c[p] - gt_corres[p])[:, m]
            meds.append(float(np.median(np.linalg.norm(diff, axis=0))))
            fracs.append(float(m.mean()))
            # per-pair coherent bias: the de-biasing target (|mean signed
            # error| — what bends pose estimation, VERDICT r4 #2)
            biases.append(float(np.linalg.norm(diff.mean(axis=1))))
        print(f"  span={span}: median-EPE per pair = "
              f"{[round(x, 2) for x in meds]}, conf-frac = "
              f"{[round(x, 2) for x in fracs]}, |mean-signed-err| = "
              f"{[round(x, 3) for x in biases]}")


if __name__ == "__main__":
    main()
