"""Loss combiner + primitive tests."""
import numpy as np
import jax.numpy as jnp

from sparf_tpu.training.losses import base as L


def test_huber_matches_torch_semantics():
    # photometric huber: delta=0.5, x2 (base_losses.py:155-156)
    pred = jnp.asarray([0.0, 0.2, 1.0])
    label = jnp.zeros(3)
    # elementwise: |0|=0 -> 0; 0.2<0.5 -> 0.5*0.04=0.02; 1.0>=0.5 -> 0.5*(1-0.25)=0.375
    expected = np.mean([0.0, 0.02, 0.375]) * 2
    np.testing.assert_allclose(float(L.huber_loss(pred, label)), expected, rtol=1e-6)


def test_compute_diff_loss_variants():
    diff = jnp.asarray([[3.0, 4.0], [0.0, 0.0]])
    # epe: norms 5, 0 -> masked/weighted reductions
    epe = L.compute_diff_loss("epe", diff)
    np.testing.assert_allclose(float(epe), 5.0 / 2, rtol=1e-6)
    l1 = L.compute_diff_loss("l1", diff)
    np.testing.assert_allclose(float(l1), 7.0 / 4, rtol=1e-6)
    # huber delta=1: 3 -> 1*(3-0.5)=2.5; 4 -> 3.5
    hub = L.compute_diff_loss("huber", diff)
    np.testing.assert_allclose(float(hub), (2.5 + 3.5) / 4, rtol=1e-6)
    # weights + mask normalization: sum(loss*w*m)/sum(m)
    w = jnp.asarray([[2.0], [1.0]])
    m = jnp.asarray([[True], [False]])
    out = L.compute_diff_loss("l1", diff, weights=w, mask=m)
    np.testing.assert_allclose(float(out), (3 * 2 + 4 * 2) / 1.0, rtol=1e-6)


def test_summarize_predefined_weights():
    loss = {"render": jnp.asarray(2.0), "corres": jnp.asarray(3.0), "unused": jnp.asarray(9.0)}
    weights = {"render": 0, "corres": -1.0, "unused": None}
    out = L.summarize_loss_w_predefined_weights(loss, weights)
    np.testing.assert_allclose(float(out["all"]), 2.0 + 0.1 * 3.0, rtol=1e-6)
    np.testing.assert_allclose(float(out["corres_after_w"]), 0.3, rtol=1e-6)
    assert "unused_after_w" not in out


def test_summarize_equal_weights():
    loss = {"render": jnp.asarray(2.0), "corres": jnp.asarray(8.0)}
    weights = {"render": 0, "corres": 0}
    out = L.summarize_loss_w_equal_weights(loss, weights)
    # corres scaled to render magnitude: w = 2/8 -> contribution 2
    np.testing.assert_allclose(float(out["all"]), 4.0, rtol=1e-4)


def test_iteration_gate():
    assert float(L.iteration_gate(jnp.asarray(10.0), 5.0)) == 1.0
    assert float(L.iteration_gate(jnp.asarray(3.0), 5.0)) == 0.0
