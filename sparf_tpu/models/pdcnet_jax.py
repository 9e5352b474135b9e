"""PDC-Net-style probabilistic dense correspondence network in JAX.

The reference depends on the external PDC-Net submodule (VGG-16 + GOCor +
flow decoders + mixture uncertainty; source/models/flow_net.py:739-767 builds
PDCNet_vgg16 and converts its uncertainty into p_r = P(err<1px)/0.5730).
No pretrained weights ship in this environment, so this module provides:

  - the architecture, functional-JAX style: pyramid feature extractor,
    global-correlation coarse mapping decoder, local-correlation refinement,
    and a Laplacian-mixture uncertainty head with the p_r computation
    (probability of the flow error being below 1px under the predicted
    mixture, normalized by 0.5730 as in PDC-Net);
  - `load_weights_npz` to consume converted checkpoints;
  - `self_supervised_adapt`: trains the network on synthetic warps of the
    actual scene images (random homographies + photometric jitter), giving a
    usable learned matcher without any external data — the TPU-native answer
    to the missing checkpoint.

Once weights exist (converted or self-trained), select it with
cfg.flow_backbone='pdcnet_jax'.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# feature channels per pyramid level (VGG-ish, scaled down: this net is meant
# to be trainable in-session, not to mirror VGG-16 exactly)
FEAT_CHANNELS = (32, 64, 96)   # /2, /4, /8
LOCAL_RADIUS = 3


# ---------------------------------------------------------------------------
# params
# ---------------------------------------------------------------------------


def _conv_init(key, k, c_in, c_out):
    w = jax.random.normal(key, (c_out, c_in, k, k)) * np.sqrt(2.0 / (c_in * k * k))
    return [w.astype(jnp.float32), jnp.zeros((c_out,), jnp.float32)]


def init_params(key: Array) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 48))
    p: Dict[str, Any] = {}
    # feature pyramid: stride-2 conv + residual conv per level
    c_prev = 3
    for li, c in enumerate(FEAT_CHANNELS):
        p[f"feat{li}_down"] = _conv_init(next(keys), 3, c_prev, c)
        p[f"feat{li}_res"] = _conv_init(next(keys), 3, c, c)
        c_prev = c
    # per-level refinement decoders (PWC-style warp + shifted cost volume):
    # input = [local corr ((2r+1)^2), feat_t, flow(2)]; finest level also
    # feeds the uncertainty head
    n_corr = (2 * LOCAL_RADIUS + 1) ** 2
    for lev, c in ((8, FEAT_CHANNELS[2]), (4, FEAT_CHANNELS[1]), (2, FEAT_CHANNELS[0])):
        d = n_corr + c + 2
        p[f"ref{lev}_dec0"] = _conv_init(next(keys), 3, d, 96)
        p[f"ref{lev}_dec1"] = _conv_init(next(keys), 3, 96, 64)
        p[f"ref{lev}_flow"] = _conv_init(next(keys), 3, 64, 2)
    # uncertainty head: predicts [log_var_small, log_var_large, logit_alpha]
    p["unc_dec0"] = _conv_init(next(keys), 3, 64, 32)
    p["unc_out"] = _conv_init(next(keys), 3, 32, 3)
    return p


def _conv(x: Array, wb, stride: int = 1) -> Array:
    w, b = wb
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME", dimension_numbers=("NCHW", "OIHW", "NCHW")
    )
    return y + b.reshape(1, -1, 1, 1)


def extract_features(params, img: Array) -> List[Array]:
    """img (B,3,H,W) -> [(B,C,H/2,W/2), (B,C,H/4,W/4), (B,C,H/8,W/8)]."""
    feats = []
    h = img
    for li in range(len(FEAT_CHANNELS)):
        h = jax.nn.relu(_conv(h, params[f"feat{li}_down"], stride=2))
        h = h + jax.nn.relu(_conv(h, params[f"feat{li}_res"]))
        feats.append(h)
    return feats


def _l2norm(f: Array) -> Array:
    return f / (jnp.linalg.norm(f, axis=1, keepdims=True) + 1e-6)


def global_correlation_mapping(f_t: Array, f_s: Array) -> Array:
    """Argmax-free soft mapping from the full correlation volume.

    f_* (B,C,h,w); returns mapping (B,2,h,w) in source ABSOLUTE coords at
    this level (soft-argmax over correlation).
    """
    B, C, h, w = f_t.shape
    t = _l2norm(f_t).reshape(B, C, h * w)
    s = _l2norm(f_s).reshape(B, C, h * w)
    corr = jnp.einsum("bci,bcj->bij", t, s) * 16.0  # (B, hw_t, hw_s), temp-scaled
    attn = jax.nn.softmax(corr, axis=-1)
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    grid_x = jnp.tile(xs, h)
    grid_y = jnp.repeat(ys, w)
    map_x = attn @ grid_x
    map_y = attn @ grid_y
    return jnp.stack([map_x, map_y], 1).reshape(B, 2, h, w)


def _bilinear_sample(f: Array, coords: Array) -> Array:
    """f (B,C,h,w), coords (B,2,h,w) absolute xy -> (B,C,h,w)."""
    B, C, h, w = f.shape
    x = jnp.clip(coords[:, 0], 0, w - 1)
    y = jnp.clip(coords[:, 1], 0, h - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    wx = x - x0
    wy = y - y0

    def gather(yi, xi):
        flat = (yi * w + xi).astype(jnp.int32).reshape(B, -1)  # (B,hw)
        ff = f.reshape(B, C, h * w)
        return jax.vmap(lambda fb, ib: fb[:, ib])(ff, flat).reshape(B, C, h, w)

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)
    wx = wx[:, None]
    wy = wy[:, None]
    return (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
            + v10 * (1 - wx) * wy + v11 * wx * wy)


def shifted_correlation(f_t: Array, f_s_warped: Array, radius: int = LOCAL_RADIUS) -> Array:
    """PWC-style cost volume: correlate f_t(x) with f_s_warped(x+d) for the
    (2r+1)^2 integer displacements d, via zero-padded slicing — no gathers
    (TPU gathers are serial; shifts are free data movement)."""
    B, C, h, w = f_t.shape
    t = _l2norm(f_t)
    s = _l2norm(f_s_warped)
    s_pad = jnp.pad(s, ((0, 0), (0, 0), (radius, radius), (radius, radius)))
    rows = []
    for dy in range(2 * radius + 1):
        for dx in range(2 * radius + 1):
            rows.append(jnp.sum(t * s_pad[:, :, dy : dy + h, dx : dx + w],
                                axis=1, keepdims=True))
    return jnp.concatenate(rows, axis=1)  # (B,(2r+1)^2,h,w)


def _identity_grid(B: int, h: int, w: int) -> Array:
    xx = jnp.arange(w, dtype=jnp.float32)[None, None, None, :]
    yy = jnp.arange(h, dtype=jnp.float32)[None, None, :, None]
    return jnp.concatenate(
        [jnp.broadcast_to(xx, (B, 1, h, w)), jnp.broadcast_to(yy, (B, 1, h, w))], axis=1
    )


def _refine_level(params, lev: int, f_t: Array, f_s: Array, mapping: Array):
    """One PWC refinement step at pyramid level `lev` (8/4/2). Returns
    (mapping, decoder features) at that level's resolution."""
    B, C, h, w = f_t.shape
    f_s_warped = _bilinear_sample(f_s, mapping)
    corr = shifted_correlation(f_t, f_s_warped)
    flow = mapping - _identity_grid(B, h, w)
    x = jnp.concatenate([corr, f_t, flow], axis=1)
    x = jax.nn.relu(_conv(x, params[f"ref{lev}_dec0"]))
    x = jax.nn.relu(_conv(x, params[f"ref{lev}_dec1"]))
    delta = _conv(x, params[f"ref{lev}_flow"])
    return mapping + delta, x


def forward(params, img_t: Array, img_s: Array) -> Dict[str, Array]:
    """Dense mapping target->source + p_r confidence at 1/2 resolution.

    Coarse-to-fine: global-correlation soft-argmax at /8, then PWC-style
    warp + shifted-cost-volume refinement at /8, /4 and /2 (the reference's
    PDC-Net refines across its feature pyramid the same way; here the
    decoders are small enough to train in-session).

    Returns {'mapping': (B,2,h/2,w/2) absolute source coords at /2,
             'p_r': (B,1,h/2,w/2), ...} — upsample x2 outside.
    """
    ft = extract_features(params, img_t)
    fs = extract_features(params, img_s)

    # coarse soft mapping from global correlation at /8
    mapping8 = global_correlation_mapping(ft[2], fs[2])       # (B,2,h8,w8)
    mapping8, _ = _refine_level(params, 8, ft[2], fs[2], mapping8)

    B, _, h4, w4 = ft[1].shape
    mapping4 = jax.image.resize(mapping8 * 2.0, (B, 2, h4, w4), "bilinear")
    mapping4, _ = _refine_level(params, 4, ft[1], fs[1], mapping4)

    B, _, h2, w2 = ft[0].shape
    mapping2 = jax.image.resize(mapping4 * 2.0, (B, 2, h2, w2), "bilinear")
    mapping2, x2 = _refine_level(params, 2, ft[0], fs[0], mapping2)

    # uncertainty from the finest decoder: two-component Laplacian mixture
    u = jax.nn.relu(_conv(x2, params["unc_dec0"]))
    u = _conv(u, params["unc_out"])
    log_var_s = jnp.clip(u[:, 0:1], -6.0, 4.0)
    log_var_l = jnp.clip(u[:, 1:2] + 2.0, -4.0, 8.0)
    alpha = jax.nn.sigmoid(u[:, 2:3])
    p_r = p_r_from_mixture(alpha, jnp.exp(log_var_s), jnp.exp(log_var_l), radius=1.0)
    return dict(mapping=mapping2, p_r=p_r, alpha=alpha,
                log_var_s=log_var_s, log_var_l=log_var_l,
                mapping8=mapping8, mapping4=mapping4)


def p_r_from_mixture(alpha: Array, var_s: Array, var_l: Array, radius: float = 1.0) -> Array:
    """P(|err|<R) under a 2-component 2D-Laplacian mixture, normalized by
    0.5730 like PDC-Net's p_r (flow_net.py:458-470)."""

    def p_component(var):
        b = jnp.sqrt(jnp.maximum(var, 1e-6) / 2.0)
        return (1 - jnp.exp(-radius / b)) ** 2

    p = alpha * p_component(var_s) + (1 - alpha) * p_component(var_l)
    return jnp.clip(p / 0.5730, 0.0, 1.0)


# ---------------------------------------------------------------------------
# weights
# ---------------------------------------------------------------------------


def load_weights_npz(path: str) -> Dict[str, Any]:
    data = np.load(path)
    params: Dict[str, Any] = {}
    for key in data.files:
        if "__" not in key:  # metadata (e.g. 'provenance'), not a parameter
            continue
        name, idx = key.rsplit("__", 1)
        params.setdefault(name, [None, None])[int(idx)] = jnp.asarray(data[key])
    return params


def save_weights_npz(params: Dict[str, Any], path: str) -> None:
    flat = {}
    for name, wb in params.items():
        for i, a in enumerate(wb):
            flat[f"{name}__{i}"] = np.asarray(a)
    np.savez_compressed(path, **flat)


# ---------------------------------------------------------------------------
# self-supervised adaptation on synthetic warps
# ---------------------------------------------------------------------------


def _random_homography_batch(key, B, H, W, max_shift=0.25):
    """Random perspective warps as flow fields (B,2,H,W) + warped grids."""
    k1, k2 = jax.random.split(key)
    # corner displacement parametrization
    disp = jax.random.uniform(k1, (B, 4, 2), minval=-max_shift, maxval=max_shift)
    disp = disp * jnp.asarray([W, H], jnp.float32)
    src = jnp.asarray([[0, 0], [W - 1, 0], [W - 1, H - 1], [0, H - 1]], jnp.float32)
    dst = src[None] + disp

    def solve_h(dst_corners):
        A, b = [], []
        for (x, y), (u, v) in zip(src, dst_corners):
            A.append([x, y, 1, 0, 0, 0, -u * x, -u * y])
            b.append(u)
            A.append([0, 0, 0, x, y, 1, -v * x, -v * y])
            b.append(v)
        h = jnp.linalg.solve(jnp.asarray(A), jnp.asarray(b))
        return jnp.concatenate([h, jnp.ones(1)]).reshape(3, 3)

    Hs = jax.vmap(solve_h)(dst)
    xx, yy = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32), jnp.arange(H, dtype=jnp.float32))
    grid = jnp.stack([xx, yy, jnp.ones_like(xx)], 0).reshape(3, -1)  # (3,HW)
    warped = jnp.einsum("bij,jk->bik", Hs, grid)
    warped = warped[:, :2] / jnp.maximum(warped[:, 2:], 1e-6)
    return warped.reshape(B, 2, H, W)


def self_supervised_adapt(
    params: Dict[str, Any], images: np.ndarray, key: Array,
    n_steps: int = 500, batch: int = 2, lr: float = 1e-3,
) -> Dict[str, Any]:
    """Train on random homography warps of the scene's own images.

    Loss: huber(mapping, gt_mapping)/8-scale + negative-log-likelihood of the
    mixture (teaches the confidence head). Returns updated params.
    """
    import optax

    imgs = jnp.asarray(images, jnp.float32)
    N, _, H, W = imgs.shape
    tx = optax.adam(lr)
    ost = tx.init(params)

    def loss_fn(params, key):
        k_idx, k_h, k_ph = jax.random.split(key, 3)
        idx = jax.random.randint(k_idx, (batch,), 0, N)
        tgt = imgs[idx]
        map_full = _random_homography_batch(k_h, batch, H, W)  # target->source
        # source = target warped backwards: sample target at map_full; add
        # photometric jitter so the matcher never learns exact-intensity cues
        src = _bilinear_sample(tgt, map_full)
        k1, k2, k3 = jax.random.split(k_ph, 3)
        gain = jnp.exp(jax.random.uniform(k1, (batch, 3, 1, 1), minval=-0.2, maxval=0.2))
        bias = jax.random.uniform(k2, (batch, 1, 1, 1), minval=-0.05, maxval=0.05)
        src = jnp.clip(src * gain + bias + 0.01 * jax.random.normal(k3, src.shape), 0, 1)
        out = forward(params, tgt, src)
        # GT mapping at the final /2 level
        h2, w2 = out["mapping"].shape[-2:]
        gt = jax.image.resize(map_full / 2.0, (batch, 2, h2, w2), "bilinear")
        err = out["mapping"] - gt
        abs_err = jnp.linalg.norm(err, axis=1, keepdims=True)
        huber = jnp.where(abs_err < 1.0, 0.5 * abs_err**2, abs_err - 0.5)
        # mixture NLL (Laplacian, isotropic)
        def nll(var):
            b = jnp.sqrt(jnp.maximum(var, 1e-6) / 2)
            return abs_err / b + 2 * jnp.log(b)
        m_nll = -jnp.log(
            out["alpha"] * jnp.exp(-nll(jnp.exp(out["log_var_s"])))
            + (1 - out["alpha"]) * jnp.exp(-nll(jnp.exp(out["log_var_l"]))) + 1e-9
        )
        return jnp.mean(huber) + 0.1 * jnp.mean(m_nll)

    @jax.jit
    def step(params, ost, key):
        l, g = jax.value_and_grad(loss_fn)(params, key)
        upd, ost = tx.update(g, ost, params)
        return optax.apply_updates(params, upd), ost, l

    for i in range(n_steps):
        key, k = jax.random.split(key)
        params, ost, l = step(params, ost, k)
    return params


def compose_candidate_uncertainty(c1: Array, alpha: Array, var_s: Array,
                                  var_l: Array, Hm: Array):
    """Compose a pre-warp candidate's mapping + uncertainty through Hm.

    c1 (2,H,W) is the mapping into the Hm-warped source canvas with a
    two-component Laplacian mixture (alpha, var_s, var_l) per pixel in
    *warped-canvas* pixel units. Composing back to original-source coords
    magnifies errors by the local Jacobian of Hm, so the variances scale by
    the per-pixel area scale |det J_Hm(c1)| = |det Hm| / w^3 (= f^2 for the
    similarity pre-warps) and p_r is recomputed from the rescaled mixture.
    Returns (cH (H,W,2), p_r (H,W), expected_var (H,W))."""
    from sparf_tpu.models import flow_net as _fn

    cH = _fn._apply_homography(Hm, jnp.transpose(c1, (1, 2, 0)))
    w = Hm[2, 0] * c1[0] + Hm[2, 1] * c1[1] + Hm[2, 2]
    det_j = jnp.abs(jnp.linalg.det(Hm)) / jnp.maximum(jnp.abs(w), 1e-6) ** 3
    var_s = var_s * det_j
    var_l = var_l * det_j
    evar = alpha * var_s + (1 - alpha) * var_l
    p_r = p_r_from_mixture(alpha, var_s, var_l)
    return cH, p_r, evar


def _scale_about_center_homography(f: float, H: int, W: int) -> Array:
    """Similarity that zooms the image about its center by 1/f: a pixel u of
    the warped canvas samples the original at c + f*(u-c). Used as a
    multi-scale pre-warp candidate (the external PDC-Net's 'multiscale'
    inference re-runs the net over scaled source copies the same way)."""
    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
    return jnp.asarray(
        [[f, 0.0, cx * (1.0 - f)], [0.0, f, cy * (1.0 - f)], [0.0, 0.0, 1.0]],
        jnp.float32,
    )


def compute_pdcnet_flow_of_combi_list(
    images: np.ndarray, combi_list: np.ndarray,
    params: Optional[Dict[str, Any]] = None,
    weights_path: Optional[str] = None,
    adapt_steps: int = 0,
    use_homography: bool = False,
    multiscale_factors: Optional[Tuple[float, ...]] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Matcher-facade entry: (P,2,H,W) corres + (P,1,H,W) p_r.

    use_homography: the reference PDC-Net homography inference branch
    (cfg.use_homography_flow, base_corres_loss.py:107): fit a robust global
    homography to the confident base matches, re-run the network against the
    homography-warped source (near-identity regime), compose, and keep the
    per-pixel winner by p_r.

    multiscale_factors: the reference PDC-Net 'multiscale' inference variant
    (external DenseMatching submodule; the reference exposes it through the
    same inference_parameters the homography branch uses, flow_net.py:485-489)
    — re-run the net against center-zoomed copies of the source (one per
    factor != 1) and keep the per-pixel winner by p_r. XLA-friendly
    fixed-candidate race instead of the reference's homography-quality
    scale selection; composes with use_homography (the homography candidate
    joins the same race).
    """
    if params is None:
        if weights_path:
            params = load_weights_npz(weights_path)
        else:
            params = init_params(jax.random.PRNGKey(0))
            if adapt_steps > 0:
                params = self_supervised_adapt(
                    params, images, jax.random.PRNGKey(1), n_steps=adapt_steps
                )
    imgs = jnp.asarray(np.asarray(images), jnp.float32)
    B, _, H, W = imgs.shape
    fwd = jax.jit(lambda t, s: forward(params, t, s))

    def infer(t_img, s_img):
        out = fwd(t_img[None], s_img[None])
        mapping = jax.image.resize(out["mapping"] * 2.0, (1, 2, H, W), "bilinear")
        p_r = jax.image.resize(out["p_r"], (1, 1, H, W), "bilinear")

        def rs(x):
            return jax.image.resize(x, (1, 1, H, W), "bilinear")[0, 0]

        # mixture components kept separate so pre-warp candidates can be
        # rescaled through the composition Jacobian before racing / before
        # their p_r is recomputed; race key = expected mixture variance
        # (p_r saturates at 1.0 after the /0.5730 clip, so confident pixels
        # tie under it and the race would degenerate)
        alpha = rs(out["alpha"])
        var_s = rs(jnp.exp(out["log_var_s"]))
        var_l = rs(jnp.exp(out["log_var_l"]))
        evar = alpha * var_s + (1 - alpha) * var_l
        return mapping[0], p_r[0, 0], evar, (alpha, var_s, var_l)

    def race_prewarp(c0, p0, v0, img_t, img_s, Hm):
        """Candidate from matching against the Hm-pre-warped source; composed
        back to source coords and raced per pixel by expected mixture
        variance (lower wins) against (c0, p0, v0).

        The candidate's error lives in warped-canvas coords; composing it
        back through Hm magnifies it by the local Jacobian, so its variance
        must be scaled by the per-pixel area scale |det J_Hm| = |det Hm|/w^3
        (f^2 for the similarity pre-warps) and its p_r recomputed from the
        rescaled mixture — otherwise zoom-in candidates race with variances
        ~f^2 too small and win on understated uncertainty."""
        from sparf_tpu.models import flow_net as _fn

        warped = _fn._warp_image_by_homography(img_s, Hm)
        c1, _, _, (a1, vs1, vl1) = infer(img_t, warped)
        cH, p1, v1 = compose_candidate_uncertainty(c1, a1, vs1, vl1, Hm)
        inb = ((cH[..., 0] >= 0) & (cH[..., 0] <= W - 1)
               & (cH[..., 1] >= 0) & (cH[..., 1] <= H - 1))
        p1 = jnp.where(inb, p1, 0.0)
        v1 = jnp.where(inb, v1, jnp.inf)
        use1 = v1 < v0
        return (jnp.where(use1[None], jnp.transpose(cH, (2, 0, 1)), c0),
                jnp.where(use1, p1, p0), jnp.where(use1, v1, v0))

    scale_prewarps = [
        _scale_about_center_homography(float(f), H, W)
        for f in (multiscale_factors or ())
        if abs(float(f) - 1.0) > 1e-6
    ]

    corres_out, conf_out = [], []
    for t, s in combi_list.T:
        c0, p0, v0, _ = infer(imgs[int(t)], imgs[int(s)])
        for Hm in scale_prewarps:
            c0, p0, v0 = race_prewarp(c0, p0, v0, imgs[int(t)], imgs[int(s)], Hm)
        if use_homography:
            from sparf_tpu.models import flow_net as _fn

            Hm = _fn._fit_homography_weighted(
                jnp.transpose(c0, (1, 2, 0)), jnp.clip(p0, 0.0, None) ** 2
            )
            c0, p0, v0 = race_prewarp(c0, p0, v0, imgs[int(t)], imgs[int(s)], Hm)
        corres_out.append(np.asarray(c0))
        conf_out.append(np.asarray(p0)[None])
    return np.stack(corres_out).astype(np.float32), np.stack(conf_out).astype(np.float32)
