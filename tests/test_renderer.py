"""Renderer/MLP/embedder tests against closed forms."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sparf_tpu.models import embedder, nerf_mlp, renderer
from sparf_tpu.models.nerf_mlp import MLPConfig
from sparf_tpu.models.renderer import RenderConfig
from sparf_tpu.utils import camera


def small_cfg(**kw):
    base = dict(
        layers_feat=(32, 32, 32, 32, 32),
        layers_rgb=(16, 3),
        skip=(2,),
        L_3D=4,
        L_view=2,
        barf_c2f=None,
    )
    base.update(kw)
    return RenderConfig(mlp=MLPConfig(**base), sample_intvs=32, sample_intvs_fine=16)


# ---------------------------------------------------------------------------
# embedder
# ---------------------------------------------------------------------------


def test_positional_encoding_layout():
    x = jnp.array([[0.3, -0.7, 1.1]])
    L = 4
    enc = embedder.positional_encoding(x, L)
    assert enc.shape == (1, 3 * 2 * L)
    freq = 2.0 ** np.arange(L) * np.pi
    # layout per channel: [sin f0..f3 | cos f0..f3]
    expected0 = np.concatenate([np.sin(0.3 * freq), np.cos(0.3 * freq)])
    np.testing.assert_allclose(enc[0, : 2 * L], expected0, atol=1e-5)
    expected2 = np.concatenate([np.sin(1.1 * freq), np.cos(1.1 * freq)])
    np.testing.assert_allclose(enc[0, 2 * 2 * L :], expected2, atol=1e-5)


def test_c2f_weights_schedule():
    L = 10
    w0 = embedder.c2f_weights(jnp.asarray(0.0), L, (0.3, 0.7))
    np.testing.assert_allclose(w0, np.zeros(L), atol=1e-6)  # all masked at start
    w1 = embedder.c2f_weights(jnp.asarray(1.0), L, (0.3, 0.7))
    np.testing.assert_allclose(w1, np.ones(L), atol=1e-6)  # all open at end
    wm = np.asarray(embedder.c2f_weights(jnp.asarray(0.5), L, (0.3, 0.7)))
    alpha = (0.5 - 0.3) / 0.4 * L  # = 5
    assert np.all(wm[: int(alpha)] == 1.0) and np.all(wm[int(alpha) :] == 0.0)
    assert embedder.c2f_weights(jnp.asarray(0.5), L, None) is None


def test_c2f_mask_zeroes_encoding():
    cfg = small_cfg(barf_c2f=(0.3, 0.7)).mlp
    pts = jnp.ones((1, 2, 3))
    enc = nerf_mlp.encode_points(cfg, pts, jnp.asarray(0.0))
    # raw points pass through; PE part is fully masked at progress=0
    np.testing.assert_allclose(enc[..., :3], pts, atol=1e-6)
    np.testing.assert_allclose(enc[..., 3:], 0.0, atol=1e-6)


# ---------------------------------------------------------------------------
# MLP
# ---------------------------------------------------------------------------


def test_mlp_shapes_and_init_scale():
    cfg = small_cfg()
    params = nerf_mlp.init_nerf_params(jax.random.PRNGKey(0), cfg.mlp)
    # trunk: 5 layers, last emits 32+1
    assert len(params["feat"]) == 5
    assert params["feat"][0][0].shape == (32, cfg.mlp.input_3d_dim)
    assert params["feat"][2][0].shape == (32, 32 + cfg.mlp.input_3d_dim)  # skip
    assert params["feat"][-1][0].shape == (33, 32)
    assert params["rgb"][0][0].shape == (16, 32 + cfg.mlp.input_view_dim)
    assert params["rgb"][-1][0].shape == (3, 16)
    # xavier-uniform bound check on last rgb layer (gain 1)
    W = np.asarray(params["rgb"][-1][0])
    bound = np.sqrt(6.0 / (3 + 16))
    assert np.abs(W).max() <= bound + 1e-6
    out = nerf_mlp.nerf_apply(
        params, cfg.mlp, jnp.zeros((2, 8, 4, 3)), jnp.ones((2, 8, 3)), jnp.asarray(1.0)
    )
    assert out["rgb_samples"].shape == (2, 8, 4, 3)
    assert out["density_samples"].shape == (2, 8, 4)
    assert np.all(np.asarray(out["density_samples"]) >= 0)
    assert np.all((np.asarray(out["rgb_samples"]) >= 0) & (np.asarray(out["rgb_samples"]) <= 1))


# ---------------------------------------------------------------------------
# compositing
# ---------------------------------------------------------------------------


def test_composite_constant_density_closed_form():
    """Uniform density sigma: T(t) = exp(-sigma * t), opacity = 1-exp(-sigma*range)."""
    B, R, S = 1, 4, 256
    sigma = 3.0
    t = np.linspace(0.05, 4.0, S, dtype=np.float32)
    depth_samples = jnp.broadcast_to(t[None, None, :, None], (B, R, S, 1))
    ray = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (B, R, 3))  # unit length
    rgb_samples = jnp.full((B, R, S, 3), 0.5)
    density = jnp.full((B, R, S), sigma)
    out = nerf_mlp.composite(ray, rgb_samples, density, depth_samples)
    # analytic: opacity over [t0, inf) is 1 (last interval is 1e10)
    np.testing.assert_allclose(np.asarray(out["opacity"]), 1.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["rgb"]), 0.5, atol=1e-3)
    # transmittance before last sample ~ exp(-sigma*(t_max - t_min))
    expected_T = np.exp(-sigma * (t[-2] - t[0]))
    np.testing.assert_allclose(np.asarray(out["all_cumulated"]), expected_T, rtol=0.05)
    # expected depth for exponential medium: t0 + 1/sigma (mean of exponential)
    np.testing.assert_allclose(np.asarray(out["depth"]), t[0] + 1 / sigma, rtol=0.03)


def test_composite_single_surface():
    """A single opaque slab puts all weight at its depth."""
    B, R, S = 1, 2, 64
    t = np.linspace(0.1, 2.0, S, dtype=np.float32)
    depth_samples = jnp.broadcast_to(t[None, None, :, None], (B, R, S, 1))
    ray = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (B, R, 3))
    density = np.zeros((B, R, S), np.float32)
    k = 40
    density[:, :, k] = 1e8  # opaque surface
    rgb_samples = np.zeros((B, R, S, 3), np.float32)
    rgb_samples[:, :, k] = [1.0, 0.2, 0.3]
    out = nerf_mlp.composite(ray, jnp.asarray(rgb_samples), jnp.asarray(density), depth_samples)
    np.testing.assert_allclose(np.asarray(out["depth"])[..., 0], t[k], atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["rgb"])[0, 0], [1.0, 0.2, 0.3], atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["all_cumulated"]), 0.0, atol=1e-6)


def test_composite_ray_length_scaling():
    """Doubling |ray| doubles the effective optical depth."""
    B, R, S = 1, 1, 128
    t = np.linspace(0.0, 1.0, S, dtype=np.float32)
    depth_samples = jnp.broadcast_to(t[None, None, :, None], (B, R, S, 1))
    density = jnp.full((B, R, S), 1.0)
    rgb = jnp.full((B, R, S, 3), 1.0)
    out1 = nerf_mlp.composite(jnp.full((B, R, 3), 1.0) / np.sqrt(3), rgb, density, depth_samples)
    out2 = nerf_mlp.composite(jnp.full((B, R, 3), 2.0) / np.sqrt(3), rgb, density, depth_samples)
    T1 = np.asarray(out1["all_cumulated"])[0, 0]
    T2 = np.asarray(out2["all_cumulated"])[0, 0]
    np.testing.assert_allclose(T2, T1**2, rtol=1e-3)


# ---------------------------------------------------------------------------
# depth sampling
# ---------------------------------------------------------------------------


def test_sample_depth_metric_and_inverse():
    dr = jnp.array([2.0, 6.0])
    det = renderer.sample_depth(None, 1, 8, 16, dr, "metric", stratified=False)
    t = np.asarray(det)[0, 0, :, 0]
    np.testing.assert_allclose(t, (np.arange(16) + 0.5) / 16 * 4 + 2, atol=1e-5)
    strat = renderer.sample_depth(jax.random.PRNGKey(0), 1, 8, 16, dr, "metric", stratified=True)
    s = np.asarray(strat)[0]
    assert np.all(s >= 2.0) and np.all(s <= 6.0)
    assert np.all(np.diff(s[:, :, 0], axis=-1) > 0)  # stratified keeps order
    inv = renderer.sample_depth(None, 1, 4, 8, jnp.array([1.0, 0.0]), "inverse", stratified=False)
    vals = np.asarray(inv)[0, 0, :, 0]
    assert vals[0] < vals[-1] and vals[-1] > 10  # 1/(x->0) grows
    np.testing.assert_allclose(vals[0], 1 / ((0.5 / 8) * (0 - 1) + 1 + 1e-8), atol=1e-4)


def test_sample_pdf_concentrates_on_peak():
    B, R, S = 1, 3, 32
    weights = np.zeros((B, R, S), np.float32)
    weights[:, :, 10] = 1.0  # all mass in bin 10
    dr = jnp.array([0.0, 32.0])  # bin k spans [k, k+1]
    fine = renderer.sample_depth_from_pdf(None, jnp.asarray(weights), S, 16, dr, det=True)
    f = np.asarray(fine)[0, 0, :, 0]
    assert np.all(f >= 10.0) and np.all(f <= 11.0)


def test_sample_depth_per_ray_max():
    dmax = jnp.array([[2.0, 4.0]])
    s = renderer.sample_depth_diff_max_range_per_ray(1, 2, 8, jnp.asarray(0.5), dmax)
    arr = np.asarray(s)
    # reference samples at (i+1)/n: the last sample sits exactly at depth_max
    np.testing.assert_allclose(arr[0, 0, -1, 0], 2.0, atol=1e-5)
    np.testing.assert_allclose(arr[0, 0, 0, 0], 0.5 + (1 / 8) * (2.0 - 0.5), atol=1e-5)
    assert arr[0, 1].max() > arr[0, 0].max()


# ---------------------------------------------------------------------------
# end-to-end ray rendering
# ---------------------------------------------------------------------------


def _setup_scene(fine=False):
    cfg = small_cfg()
    if fine:
        cfg = RenderConfig(mlp=cfg.mlp, sample_intvs=32, sample_intvs_fine=16, fine_sampling=True)
    params = renderer.init_graph_params(jax.random.PRNGKey(1), cfg)
    pose = camera.pose_from_rt(jnp.eye(3)[None], jnp.zeros((1, 3)))
    K = jnp.array([[[20.0, 0, 8.0], [0, 20.0, 8.0], [0, 0, 1]]])
    return cfg, params, pose, K


def test_render_rays_shapes():
    cfg, params, pose, K = _setup_scene()
    pix = camera.get_pixel_grid(4, 4)
    out = renderer.render_at_pixels(
        params, cfg, pose, K, pix, jnp.array([1.0, 4.0]), jnp.asarray(1.0),
        key=jax.random.PRNGKey(0), stratified=True,
    )
    assert out["rgb"].shape == (1, 16, 3)
    assert out["depth"].shape == (1, 16, 1)
    assert out["weights"].shape == (1, 16, 32, 1)
    assert out["all_cumulated"].shape == (1, 16)
    assert np.all(np.isfinite(np.asarray(out["rgb"])))


def test_render_fine_keys():
    cfg, params, pose, K = _setup_scene(fine=True)
    pix = camera.get_pixel_grid(2, 2)
    out = renderer.render_at_pixels(
        params, cfg, pose, K, pix, jnp.array([1.0, 4.0]), jnp.asarray(1.0),
        key=jax.random.PRNGKey(0), fine_enabled=True,
    )
    assert "rgb_fine" in out and out["rgb_fine"].shape == (1, 4, 3)
    assert out["t_fine"].shape[2] == 32 + 16
    # fine-disabled variant must not have fine keys
    out2 = renderer.render_at_pixels(
        params, cfg, pose, K, pix, jnp.array([1.0, 4.0]), jnp.asarray(1.0), fine_enabled=False
    )
    assert "rgb_fine" not in out2


def test_render_image_chunked_matches_unchunked():
    cfg, params, pose, K = _setup_scene()
    H = W = 6
    dr = jnp.array([1.0, 4.0])
    full = renderer.render_image_chunked(
        params, cfg, pose, K, H, W, dr, jnp.asarray(1.0), chunk=10
    )
    assert full["rgb"].shape == (1, 36, 3)
    pix = camera.get_pixel_grid(H, W)
    direct = renderer.render_at_pixels(params, cfg, pose, K, pix, dr, jnp.asarray(1.0),
                                       stratified=False)
    np.testing.assert_allclose(full["rgb"], direct["rgb"], atol=1e-5)
    np.testing.assert_allclose(full["depth"], direct["depth"], atol=1e-5)


def test_render_to_max_visibility():
    cfg, params, pose, K = _setup_scene()
    pix = camera.get_pixel_grid(3, 3)[None]
    depth_max = jnp.full((1, 9), 3.0)
    out = renderer.render_to_max(
        params, cfg, pose, K, pix, jnp.asarray(0.5), depth_max, jnp.asarray(1.0)
    )
    assert out["all_cumulated"].shape == (1, 9)
    ac = np.asarray(out["all_cumulated"])
    assert np.all((ac >= 0) & (ac <= 1 + 1e-5))
    # samples must not exceed per-ray max
    assert np.asarray(out["t"]).max() <= 3.0 + 1e-5


def test_render_gradients_flow_to_pose():
    """d(loss)/d(pose twist) must be finite & nonzero — the BARF core."""
    cfg, params, pose, K = _setup_scene()
    pix = camera.get_pixel_grid(3, 3)

    def loss_fn(twist):
        pose_n = camera.pose_compose([camera.se3_to_SE3(twist[None]), pose])
        out = renderer.render_at_pixels(params, cfg, pose_n, K, pix,
                                        jnp.array([1.0, 4.0]), jnp.asarray(1.0),
                                        stratified=False)
        return jnp.mean((out["rgb"] - 0.2) ** 2)

    g = jax.grad(loss_fn)(jnp.zeros(6) + 1e-4)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).max() > 0


def test_render_jit_compiles():
    cfg, params, pose, K = _setup_scene()
    pix = camera.get_pixel_grid(3, 3)

    @jax.jit
    def f(params, pose, progress):
        return renderer.render_at_pixels(params, cfg, pose, K, pix,
                                         jnp.array([1.0, 4.0]), progress, stratified=False)

    out = f(params, pose, jnp.asarray(0.5))
    assert np.all(np.isfinite(np.asarray(out["rgb"])))
