"""PDC-Net-style JAX matcher tests: shapes, weights roundtrip, adaptation."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sparf_tpu.models import pdcnet_jax


def test_forward_shapes():
    params = pdcnet_jax.init_params(jax.random.PRNGKey(0))
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 64, 80))
    out = pdcnet_jax.forward(params, img, img)
    # coarse-to-fine refinement ends at the /2 level
    assert out["mapping"].shape == (1, 2, 32, 40)
    assert out["p_r"].shape == (1, 1, 32, 40)
    p = np.asarray(out["p_r"])
    assert p.min() >= 0 and p.max() <= 1


def test_weights_roundtrip(tmp_path):
    params = pdcnet_jax.init_params(jax.random.PRNGKey(0))
    path = str(tmp_path / "w.npz")
    pdcnet_jax.save_weights_npz(params, path)
    loaded = pdcnet_jax.load_weights_npz(path)
    assert set(loaded) == set(params)
    np.testing.assert_allclose(loaded["ref2_flow"][0], params["ref2_flow"][0])


def test_identity_pair_soft_mapping():
    """On an identical pair, the soft global mapping should be near-diagonal
    for distinctive features (random init features are distinctive enough)."""
    params = pdcnet_jax.init_params(jax.random.PRNGKey(0))
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 64, 64))
    ft = pdcnet_jax.extract_features(params, img)[-1]
    mapping = pdcnet_jax.global_correlation_mapping(ft, ft)
    h, w = mapping.shape[-2:]
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    err = np.hypot(np.asarray(mapping)[0, 0] - xx, np.asarray(mapping)[0, 1] - yy)
    # untrained features give a soft (blurred) but roughly diagonal mapping;
    # training sharpens it (see the adaptation test)
    assert np.median(err) < 3.0, np.median(err)


@pytest.mark.slow
def test_self_supervised_adaptation_improves():
    """A few hundred warp-supervised steps must reduce mapping error on held-out warps."""
    rng = np.random.RandomState(0)
    import cv2

    base = cv2.GaussianBlur(rng.rand(64, 80, 3).astype(np.float32), (5, 5), 1.0)
    images = np.stack([base, np.roll(base, 3, axis=1)]).transpose(0, 3, 1, 2)

    def eval_error(params):
        key = jax.random.PRNGKey(99)
        imgs = jnp.asarray(images)
        mapping_gt = pdcnet_jax._random_homography_batch(key, 1, 64, 80, max_shift=0.1)
        src = pdcnet_jax._bilinear_sample(imgs[:1], mapping_gt)
        out = pdcnet_jax.forward(params, imgs[:1], src)
        gt2 = jax.image.resize(mapping_gt / 2.0, (1, 2, 32, 40), "bilinear")
        return float(jnp.median(jnp.linalg.norm(out["mapping"] - gt2, axis=1)))

    params = pdcnet_jax.init_params(jax.random.PRNGKey(0))
    err0 = eval_error(params)
    params = pdcnet_jax.self_supervised_adapt(params, images, jax.random.PRNGKey(1),
                                              n_steps=300)
    err1 = eval_error(params)
    assert err1 < err0 * 0.8, (err0, err1)


def test_scale_homography_geometry():
    """Multi-scale pre-warp: S_f composed with S_{1/f} is the identity, and
    the center is a fixed point."""
    from sparf_tpu.models.flow_net import _apply_homography

    H, W = 48, 64
    Sf = pdcnet_jax._scale_about_center_homography(1.5, H, W)
    Si = pdcnet_jax._scale_about_center_homography(1 / 1.5, H, W)
    pts = jnp.asarray(np.random.RandomState(0).rand(17, 2) * [W - 1, H - 1],
                      jnp.float32)
    back = _apply_homography(Sf, _apply_homography(Si, pts))
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-4)
    c = jnp.asarray([[(W - 1) / 2.0, (H - 1) / 2.0]], jnp.float32)
    np.testing.assert_allclose(np.asarray(_apply_homography(Sf, c)),
                               np.asarray(c), atol=1e-5)


def test_multiscale_race_contract():
    """multiscale_factors=(1.0,) is a no-op; extra factors keep the output
    contract (race is by expected mixture variance, lower wins)."""
    rng = np.random.RandomState(3)
    images = rng.rand(2, 3, 32, 40).astype(np.float32)
    combi = np.array([[0], [1]], np.int32)
    params = pdcnet_jax.init_params(jax.random.PRNGKey(0))

    c_base, p_base = pdcnet_jax.compute_pdcnet_flow_of_combi_list(
        images, combi, params=params)
    c_one, p_one = pdcnet_jax.compute_pdcnet_flow_of_combi_list(
        images, combi, params=params, multiscale_factors=(1.0,))
    np.testing.assert_array_equal(c_one, c_base)
    np.testing.assert_array_equal(p_one, p_base)

    c_ms, p_ms = pdcnet_jax.compute_pdcnet_flow_of_combi_list(
        images, combi, params=params, multiscale_factors=(0.6, 1.5))
    assert c_ms.shape == c_base.shape and p_ms.shape == p_base.shape
    assert np.isfinite(c_ms).all() and np.isfinite(p_ms).all()
    assert p_ms.min() >= 0 and p_ms.max() <= 1


def test_compose_candidate_variance_jacobian_scaling():
    """A pre-warp candidate's mixture variance must be scaled by the local
    area scale of the composition homography (f^2 for the similarity
    pre-warps; |det Hm|/w^3 per pixel for a projective Hm) and its p_r
    recomputed from the rescaled mixture — a zoom candidate racing with
    unscaled variance would win on ~f^2-understated uncertainty."""
    H, W = 24, 32
    rng = np.random.RandomState(5)
    c1 = jnp.asarray(rng.rand(2, H, W) * [[[W - 1]], [[H - 1]]], jnp.float32)
    alpha = jnp.asarray(rng.rand(H, W), jnp.float32)
    var_s = jnp.asarray(0.2 + rng.rand(H, W), jnp.float32)
    var_l = jnp.asarray(2.0 + rng.rand(H, W), jnp.float32)
    evar0 = alpha * var_s + (1 - alpha) * var_l

    f = 1.7
    Sf = pdcnet_jax._scale_about_center_homography(f, H, W)
    cH, p1, v1 = pdcnet_jax.compose_candidate_uncertainty(
        c1, alpha, var_s, var_l, Sf)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(evar0) * f * f,
                               rtol=1e-5)
    expect_p = pdcnet_jax.p_r_from_mixture(alpha, var_s * f * f, var_l * f * f)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(expect_p), rtol=1e-5)
    # identity homography: exact passthrough (the plain race behavior)
    cI, pI, vI = pdcnet_jax.compose_candidate_uncertainty(
        c1, alpha, var_s, var_l, jnp.eye(3))
    np.testing.assert_allclose(np.asarray(vI), np.asarray(evar0), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(cI), np.asarray(jnp.transpose(c1, (1, 2, 0))), atol=1e-5)

    # projective Hm: per-pixel |det Hm| / w^3
    Hm = jnp.asarray([[1.1, 0.02, 3.0], [-0.01, 0.95, -2.0],
                      [1e-4, -2e-4, 1.0]], jnp.float32)
    _, _, vP = pdcnet_jax.compose_candidate_uncertainty(
        c1, alpha, var_s, var_l, Hm)
    w = Hm[2, 0] * c1[0] + Hm[2, 1] * c1[1] + Hm[2, 2]
    det_j = np.abs(np.linalg.det(np.asarray(Hm))) / np.asarray(w) ** 3
    np.testing.assert_allclose(np.asarray(vP), np.asarray(evar0) * det_j,
                               rtol=1e-4)


def test_homography_race_penalizes_zoom_candidate():
    """Regression for the homography-branch winner selection: on an identity
    pair (src == tgt), a zoom pre-warp candidate must NOT sweep the race —
    with the Jacobian correction its variance carries the f^2 penalty, so the
    plain candidate keeps the overwhelming majority of pixels."""
    rng = np.random.RandomState(7)
    base = rng.rand(3, 40, 56).astype(np.float32)
    images = np.stack([base, base])
    combi = np.array([[0], [1]], np.int32)
    params = pdcnet_jax.init_params(jax.random.PRNGKey(0))

    c_plain, _ = pdcnet_jax.compute_pdcnet_flow_of_combi_list(
        images, combi, params=params)
    c_ms, _ = pdcnet_jax.compute_pdcnet_flow_of_combi_list(
        images, combi, params=params, multiscale_factors=(2.0,))
    changed = np.hypot(c_ms[0, 0] - c_plain[0, 0],
                       c_ms[0, 1] - c_plain[0, 1]) > 1e-3
    assert changed.mean() < 0.35, changed.mean()
