"""SPARF correspondence + depth-consistency loss tests, incl. the miniature
north-star: joint pose+NeRF training with GT correspondences must recover
noisy poses on the synthetic scene."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sparf_tpu.configs import default as default_cfg
from sparf_tpu.configs.config import ConfigDict, override_options
from sparf_tpu.configs.presets import PRESETS
from sparf_tpu.datasets.synthetic import load_synthetic_scene
from sparf_tpu.models import flow_net
from sparf_tpu.training.losses import corres as corres_mod
from sparf_tpu.utils import camera, geometry


# ---------------------------------------------------------------------------
# flow net backends
# ---------------------------------------------------------------------------


def test_gt_correspondences_consistency():
    """GT-backend pools must reproject exactly with GT depth."""
    sc = load_synthetic_scene(split="train", H=40, W=52, n_train=3, n_test=1)
    combi = flow_net.get_combi_list(3, "all")
    corres, conf = flow_net.compute_gt_flow_of_combi_list(sc, combi)
    assert corres.shape == (6, 2, 40, 52)
    # pick pair 0: target 0 -> source 1; verify by independent projection
    t, s = combi[:, 0]
    mask = conf[0, 0] > 0.5
    ys, xs = np.where(mask)
    sel = slice(0, 50)
    kpi = np.stack([xs[sel], ys[sel]], -1).astype(np.float32)[None]
    di = sc["depth_gt"][t][ys[sel], xs[sel]][None]
    T = geometry.relative_transform_i_to_j(jnp.asarray(sc["pose"][t]), jnp.asarray(sc["pose"][s]))[None]
    kpj = geometry.batch_project_to_other_img(
        jnp.asarray(kpi), jnp.asarray(di), jnp.asarray(sc["intr"][:1]), jnp.asarray(sc["intr"][:1]), T
    )
    expected = corres[0, :, ys[sel], xs[sel]]
    np.testing.assert_allclose(np.asarray(kpj)[0], expected, atol=1e-2)


def test_zncc_matcher_on_shifted_image():
    """Matching an image against a shifted copy of itself must recover the shift."""
    rng = np.random.RandomState(0)
    H, W, s = 64, 80, 6
    base = rng.rand(H + s, W + s, 3).astype(np.float32)
    # smooth it a bit so subpixel matching is sane
    import cv2

    base = cv2.GaussianBlur(base, (5, 5), 1.0)
    img_a = base[:H, :W]
    img_b = base[s:, s:]  # b(x) = a(x+s): pixel p in a appears at p-s in b
    images = np.stack([img_a, img_b]).transpose(0, 3, 1, 2)
    combi = np.array([[0], [1]], np.int32)
    corres, conf = flow_net.compute_zncc_flow_of_combi_list(images, combi)
    xx, yy = np.meshgrid(np.arange(W), np.arange(H))
    expect_x, expect_y = xx - s, yy - s
    # central region, confident matches only
    m = (conf[0, 0] > 0.9) & (xx > 10) & (xx < W - 10) & (yy > 10) & (yy < H - 10)
    assert m.mean() > 0.3, f"too few confident matches ({m.mean():.2%})"
    err = np.hypot(corres[0, 0] - expect_x, corres[0, 1] - expect_y)[m]
    assert np.median(err) < 1.0, f"median epe {np.median(err):.2f}"


def test_spsg_sparse_backend_contract_and_accuracy():
    """SPSG-style sparse backend (reference flow_net.py:151-236): dense maps
    zero except at matched keypoints; matches subpixel on an affine warp;
    the _and_cc variant returns a dummy all-ones cc map (reference parity)."""
    import cv2

    from sparf_tpu.models import sparse_matcher

    rng = np.random.RandomState(0)
    H, W = 64, 80
    base = cv2.GaussianBlur(rng.rand(H, W, 3).astype(np.float32), (5, 5), 1.0)
    M = np.array([[1.02, 0.015, -6.0], [-0.01, 0.99, 4.0]], np.float32)
    warped = cv2.warpAffine(base, M, (W, H), flags=cv2.INTER_LINEAR,
                            borderMode=cv2.BORDER_REFLECT)
    imgs = np.stack([base, warped]).transpose(0, 3, 1, 2)
    combi = np.array([[0], [1]], np.int32)
    corres, conf, cc = sparse_matcher.compute_spsg_flow_of_combi_list(
        imgs, combi, max_kp=512, return_cc=True
    )
    assert corres.shape == (1, 2, H, W) and conf.shape == (1, 1, H, W)
    assert np.all(cc == 1.0)  # dummy cc map, reference flow_net.py:223
    m = conf[0, 0] > 0.5
    # the low-corner blurred-noise fixture yields only a few dozen keypoints;
    # sparse contract = far fewer matched pixels than a dense map
    assert 10 < m.sum() < H * W * 0.2, f"{m.sum()} matches (sparse expected)"
    ys, xs = np.where(m)
    ex = M[0, 0] * xs + M[0, 1] * ys + M[0, 2]
    ey = M[1, 0] * xs + M[1, 1] * ys + M[1, 2]
    inb = (ex >= 4) & (ex < W - 4) & (ey >= 4) & (ey < H - 4)
    err = np.hypot(corres[0, 0, ys, xs] - ex, corres[0, 1, ys, xs] - ey)[inb]
    assert np.median(err) < 1.0, f"median epe {np.median(err):.2f}"


def test_cc_map_gating_in_pools():
    """filter_corr_w_cc gates the valid mask with the separate cyclic-
    consistency map (reference base_corres_loss.py:104-117)."""
    sc = load_synthetic_scene(split="train", H=40, W=52, n_train=3, n_test=1)
    cfg = _mini_cfg()
    cfg = override_options(cfg, ConfigDict(
        env=ConfigDict(), filter_corr_w_cc=True, min_conf_cc_valid_corr=1 / 2.5,
    ))
    # gt_depth backend returns cc == 1 everywhere -> gating must not change
    # pools vs the non-gated run
    pools_cc = corres_mod.build_correspondence_pools(cfg, sc)
    cfg2 = override_options(cfg, ConfigDict(env=ConfigDict(), filter_corr_w_cc=False))
    pools = corres_mod.build_correspondence_pools(cfg2, sc)
    assert pools_cc["n_pairs"] == pools["n_pairs"]
    if pools["n_pairs"]:
        np.testing.assert_array_equal(pools_cc["pool_count"], pools["pool_count"])


def test_zncc_matcher_on_affine_warp():
    """Viewpoint-like affine warp with ~10px flow must be recovered subpixel."""
    import cv2

    rng = np.random.RandomState(0)
    H, W = 64, 80
    base = cv2.GaussianBlur(rng.rand(H, W, 3).astype(np.float32), (5, 5), 1.0)
    M = np.array([[1.03, 0.02, -8.0], [-0.015, 0.98, 5.0]], np.float32)
    warped = cv2.warpAffine(base, M, (W, H), flags=cv2.INTER_LINEAR,
                            borderMode=cv2.BORDER_REFLECT)
    imgs = np.stack([base, warped]).transpose(0, 3, 1, 2)
    corres, conf = flow_net.compute_zncc_flow_of_combi_list(imgs, np.array([[0], [1]], np.int32))
    xx, yy = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32))
    ex = M[0, 0] * xx + M[0, 1] * yy + M[0, 2]
    ey = M[1, 0] * xx + M[1, 1] * yy + M[1, 2]
    inb = (ex >= 5) & (ex < W - 5) & (ey >= 5) & (ey < H - 5)
    m = (conf[0, 0] > 0.95) & inb
    assert m.sum() > 500
    err = np.hypot(corres[0, 0] - ex, corres[0, 1] - ey)[m]
    assert np.median(err) < 0.5, f"median epe {np.median(err):.2f}"


def test_geometric_matcher_on_dtu_like_rig():
    """Full geometry-guided matcher (stage-1 pyramid -> mini-SfM -> iterated
    plane-sweep rematch) on a realistic-baseline rig (0.35 rad ring span,
    DTU-like): confident matches must be in the ~1px regime that drives
    SPARF's pose accuracy (reference bar: PDC-Net p_r pipeline,
    flow_net.py:458-470)."""
    sc = load_synthetic_scene(
        split="train", H=64, W=80, n_train=3, n_test=1, angular_span=0.35
    )
    combi = np.array([[0, 0, 1], [1, 2, 2]], np.int32)
    corres, conf = flow_net.compute_zncc_flow_of_combi_list(
        sc["image"], combi, intr=sc["intr"]
    )
    gt_corres, gt_conf = flow_net.compute_gt_flow_of_combi_list(sc, combi)
    medians = []
    for p in range(combi.shape[1]):
        m = (conf[p, 0] > 0.95) & (gt_conf[p, 0] > 0.5)
        # the perpendicular band sweep trades match count for localization
        # (off-line freedom raises cycle asymmetry on weak-texture px)
        assert m.sum() > 45, f"pair {combi[:, p]}: only {m.sum()} confident px"
        err = np.linalg.norm(corres[p] - gt_corres[p], axis=0)[m]
        medians.append(np.median(err))
    assert np.median(medians) < 1.5, f"median EPE per pair: {medians}"


def test_geometric_matcher_under_photometric_perturbation():
    """Photometric-reality rung (VERDICT r2 #3): the same DTU-like rig with
    per-view exposure (+-0.3 stops), white-balance shifts, vignetting, sensor
    noise (sigma=0.01) and a specular lobe. Real DTU photographs carry all of
    these; ZNCC is affine-intensity invariant by construction, and this test
    pins that the LK polish / plane-sweep / cycle-confidence stages survive
    them too. GT flow comes from the UNPERTURBED analytic depth, so the
    contract is unchanged: median EPE < 1.5 px on confident matches."""
    sc = load_synthetic_scene(
        split="train", H=64, W=80, n_train=3, n_test=1, angular_span=0.35,
        specular=0.3, exposure_jitter=0.3, wb_jitter=0.1, noise_sigma=0.01,
        vignette=0.2,
    )
    combi = np.array([[0, 0, 1], [1, 2, 2]], np.int32)
    corres, conf = flow_net.compute_zncc_flow_of_combi_list(
        sc["image"], combi, intr=sc["intr"]
    )
    gt_corres, gt_conf = flow_net.compute_gt_flow_of_combi_list(sc, combi)
    medians = []
    for p in range(combi.shape[1]):
        m = (conf[p, 0] > 0.95) & (gt_conf[p, 0] > 0.5)
        assert m.sum() > 45, f"pair {combi[:, p]}: only {m.sum()} confident px"
        err = np.linalg.norm(corres[p] - gt_corres[p], axis=0)[m]
        medians.append(np.median(err))
    assert np.median(medians) < 1.5, f"median EPE per pair: {medians}"


def test_photometric_perturbation_is_deterministic_and_bounded():
    """Same photo_seed + view id -> identical corruption; output stays in
    [0,1]; zero-strength knobs are an exact no-op."""
    from sparf_tpu.datasets.synthetic import apply_photometric_perturbation

    img = np.random.RandomState(3).rand(32, 40, 3).astype(np.float32)
    a = apply_photometric_perturbation(
        img, np.random.RandomState(42), exposure_jitter=0.3, wb_jitter=0.1,
        noise_sigma=0.01, vignette=0.3)
    b = apply_photometric_perturbation(
        img, np.random.RandomState(42), exposure_jitter=0.3, wb_jitter=0.1,
        noise_sigma=0.01, vignette=0.3)
    np.testing.assert_array_equal(a, b)
    assert a.min() >= 0.0 and a.max() <= 1.0
    assert not np.allclose(a, img)
    c = apply_photometric_perturbation(img, np.random.RandomState(0))
    np.testing.assert_array_equal(c, img)


def test_zncc_matcher_on_synthetic_views():
    """ZNCC matcher vs GT correspondences on two synthetic views.

    KNOWN LIMITATION: the ~19 deg view change over curved textured surfaces
    warps patch appearance; rigid-ZNCC matching lands within a few px where a
    learned matcher (PDC-Net) is subpixel. This test documents the envelope."""
    sc = load_synthetic_scene(split="train", H=64, W=80, n_train=3, n_test=1)
    combi = np.array([[0], [1]], np.int32)
    corres, conf = flow_net.compute_zncc_flow_of_combi_list(sc["image"], combi)
    gt_corres, gt_conf = flow_net.compute_gt_flow_of_combi_list(sc, combi)
    m = (conf[0, 0] > 0.95) & (gt_conf[0, 0] > 0.5)
    if m.sum() < 50:
        pytest.skip("matcher found too few confident pixels on this scene")
    err = np.linalg.norm(corres[0] - gt_corres[0], axis=0)[m]
    # must beat the zero-flow baseline (median gt flow ~9px) substantially
    assert np.median(err) < 8.0, f"median epe {np.median(err):.2f}px over {m.sum()} px"


# ---------------------------------------------------------------------------
# corres loss building blocks
# ---------------------------------------------------------------------------


def _mini_cfg(**over):
    cfg = PRESETS["joint_pose_nerf_training/synthetic/sparf"]()
    cfg = override_options(
        cfg,
        ConfigDict(
            env=ConfigDict(),
            scene="spheres",
            synthetic=dict(H=40, W=52, n_train=3, n_test=1),
            max_iter=400,
            log_steps=100,
            val_steps=100000,
            snapshot_steps=100000,
            vis_steps=100000,
            arch=dict(layers_feat=[None, 64, 64, 64, 64], layers_rgb=[None, 32, 3], skip=[2]),
            nerf=ConfigDict(sample_intvs=32, sample_intvs_fine=16, rand_rays=256,
                            fine_sampling=False, ratio_start_fine_sampling_at_x=None),
            depth_cons_nbr_rays=256,
            min_nbr_matches=100,  # tiny test images have few fg pixels
            use_gt_correspondences=True,
            camera=ConfigDict(noise=0.08),
            optim=ConfigDict(lr=5e-4, lr_end=1e-4, lr_pose=3e-3, lr_pose_end=1e-4),
            first_joint_pose_nerf_then_nerf=False,
            ratio_end_joint_nerf_pose_refinement=None,
            barf_c2f=None,
        ),
    )
    cfg = override_options(cfg, ConfigDict(over))
    return cfg


def test_repro_loss_zero_at_exact_depth():
    """With exact depth and exact poses the reprojection residual is ~0."""
    sc = load_synthetic_scene(split="train", H=40, W=52, n_train=2, n_test=1)
    t, s = 0, 1
    mask = sc["valid_depth_gt"][t]
    ys, xs = np.where(mask)
    pix_self = jnp.asarray(np.stack([xs[:100], ys[:100]], -1).astype(np.float32))
    depth_self = jnp.asarray(sc["depth_gt"][t][ys[:100], xs[:100]])
    T = geometry.relative_transform_i_to_j(jnp.asarray(sc["pose"][t]), jnp.asarray(sc["pose"][s]))[None]
    kpj = geometry.batch_project_to_other_img(
        pix_self[None], depth_self[None], jnp.asarray(sc["intr"][:1]), jnp.asarray(sc["intr"][:1]), T
    )[0]
    cfg = _mini_cfg()
    loss = corres_mod.compute_render_and_repro_loss_w_repro_thres(
        cfg, pix_self, depth_self, jnp.asarray(sc["intr"][:1]), kpj,
        depth_self, jnp.asarray(sc["intr"][:1]), T, jnp.ones(100),
    )
    assert float(loss) < 1e-6


@pytest.mark.slow
def test_sparf_recovers_noisy_poses_with_gt_correspondences(tmp_path):
    """Miniature DTU north-star: the FULL jitted pipeline (photometric +
    corres + depth_cons, dual optimizers, pose branch) must recover ~6 deg
    noisy poses when the corres loss gets a clean depth signal.

    use_gt_depth isolates pipeline correctness from NeRF-depth convergence
    speed: with rendered depth the same run improves steadily (6.0 -> 4.6 deg
    at 1500 iters) but full convergence needs reference-scale schedules
    (100k iters), far beyond a unit test. Weight -1 (vs DTU's -3) compensates
    for the ~8x smaller pixel scale of the 40x52 test images."""
    from sparf_tpu.training.joint_trainer import PoseAndNerfTrainerPerScene

    cfg = _mini_cfg(max_iter=800, log_steps=200)
    cfg.use_gt_depth = True
    cfg.loss_weight.corres = -1.0
    cfg.workspace = str(tmp_path / "ws")
    trainer = PoseAndNerfTrainerPerScene(cfg, workspace=cfg.workspace)
    err_before = trainer.evaluate_poses()
    trainer.run(load_latest=False)
    err_after = trainer.evaluate_poses()
    assert err_after["error_R"] < 1.5, (err_before, err_after)
    assert err_after["error_t"] < 0.08, (err_before, err_after)
    assert trainer.state.nan_count == 0


def test_corres_pools_shapes():
    sc = load_synthetic_scene(split="train", H=40, W=52, n_train=3, n_test=1)
    cfg = _mini_cfg()

    class FakeLogger:
        def info(self, *a, **k):
            pass

    pools = corres_mod.build_correspondence_pools(cfg, sc, FakeLogger())
    assert pools["n_pairs"] >= 2
    n = pools["n_pairs"]
    assert pools["pool_pix_self"].shape[0] == n
    assert pools["pool_count"].min() > cfg.min_nbr_matches
    # pix_other of valid entries must be in bounds
    for k in range(n):
        c = pools["pool_count"][k]
        po = pools["pool_pix_other"][k, :c]
        assert po[:, 0].min() >= 0 and po[:, 0].max() <= 51
        assert po[:, 1].min() >= 0 and po[:, 1].max() <= 39


def test_hybrid_learned_matcher_wiring(monkeypatch):
    """Config plumbing for the hybrid learned+geometric pipeline: cfg flags
    reach the wrapper, and the pdcnet_jax backend dispatches to the geometry
    pipeline with a learned stage-1 provider when geometry_refine is on (and
    to raw PDC-Net inference when off)."""
    calls = {}

    def fake_zncc(images, combi_list, **kw):
        calls["zncc_kw"] = kw
        P = combi_list.shape[1]
        H, W = images.shape[-2:]
        return np.zeros((P, 2, H, W), np.float32), np.ones((P, 1, H, W), np.float32)

    def fake_pdcnet(images, combi_list, **kw):
        calls["pdcnet_kw"] = kw
        P = combi_list.shape[1]
        H, W = images.shape[-2:]
        return np.zeros((P, 2, H, W), np.float32), np.ones((P, 1, H, W), np.float32)

    monkeypatch.setattr(flow_net, "compute_zncc_flow_of_combi_list", fake_zncc)
    from sparf_tpu.models import pdcnet_jax
    monkeypatch.setattr(pdcnet_jax, "compute_pdcnet_flow_of_combi_list", fake_pdcnet)

    sc = load_synthetic_scene(split="train", H=40, W=52, n_train=3, n_test=1)
    combi = flow_net.get_combi_list(3, "all")

    # hybrid (default): geometry pipeline with a learned stage-1 provider
    w = flow_net.FlowSelectionWrapper(backend="pdcnet_jax", num_views=3,
                                      use_homography=True, geometry_refine=True)
    w.compute_flow_and_confidence_map_of_combi_list(sc, combi)
    assert "zncc_kw" in calls and calls["zncc_kw"]["stage1_fn"] is not None
    assert "pdcnet_kw" not in calls  # provider is lazy: net not run up front

    # raw mode: straight PDC-Net inference, homography flag forwarded
    calls.clear()
    w = flow_net.FlowSelectionWrapper(backend="pdcnet_jax", num_views=3,
                                      use_homography=True, geometry_refine=False)
    w.compute_flow_and_confidence_map_of_combi_list(sc, combi)
    assert "pdcnet_kw" in calls and calls["pdcnet_kw"]["use_homography"] is True
    assert "zncc_kw" not in calls

    # cfg -> wrapper plumbing via build_correspondence_pools
    seen = {}
    real_init = flow_net.FlowSelectionWrapper.__init__

    def spy_init(self, *a, **kw):
        seen.update(kw)
        return real_init(self, *a, **kw)

    monkeypatch.setattr(flow_net.FlowSelectionWrapper, "__init__", spy_init)
    cfg = _mini_cfg(use_gt_correspondences=False, flow_backbone="zncc",
                    use_homography_flow=True, pdcnet_geometry_refine=False)
    corres_mod.build_correspondence_pools(cfg, sc)
    assert seen["use_homography"] is True and seen["geometry_refine"] is False
