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
