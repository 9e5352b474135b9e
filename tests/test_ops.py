"""Pallas fused-MLP kernel vs the XLA reference path (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import sparf_tpu.ops  # noqa: F401  (registers pallas impls)
from sparf_tpu.models import nerf_mlp, renderer
from sparf_tpu.models.nerf_mlp import MLPConfig
from sparf_tpu.ops.fused_mlp import nerf_apply_pallas, pack_weights


@pytest.mark.parametrize("view_dep", [True, False])
def test_fused_mlp_matches_xla(view_dep):
    cfg = MLPConfig(
        layers_feat=(64, 64, 64, 64), layers_rgb=(32, 3), skip=(2,),
        L_3D=6, L_view=2, view_dep=view_dep,
    )
    params = nerf_mlp.init_nerf_params(jax.random.PRNGKey(0), cfg)
    B, R, S = 2, 19, 8  # odd T exercises tile padding
    pts = jax.random.normal(jax.random.PRNGKey(1), (B, R, S, 3))
    ray = jax.random.normal(jax.random.PRNGKey(2), (B, R, 3))
    prog = jnp.asarray(0.7)
    ref = nerf_mlp.nerf_apply(params, cfg, pts, ray, prog)
    pal = nerf_apply_pallas(params, cfg, pts, ray, prog, interpret=True)
    np.testing.assert_allclose(ref["rgb_samples"], pal["rgb_samples"], atol=1e-5)
    np.testing.assert_allclose(ref["density_samples"], pal["density_samples"], atol=1e-5)


def test_fused_mlp_full_arch():
    """Reference 8x256+skip@4 architecture, c2f mask active."""
    cfg = MLPConfig(barf_c2f=(0.3, 0.7))
    params = nerf_mlp.init_nerf_params(jax.random.PRNGKey(0), cfg)
    pts = jax.random.normal(jax.random.PRNGKey(1), (1, 7, 4, 3))
    ray = jax.random.normal(jax.random.PRNGKey(2), (1, 7, 3))
    prog = jnp.asarray(0.45)
    ref = nerf_mlp.nerf_apply(params, cfg, pts, ray, prog)
    pal = nerf_apply_pallas(params, cfg, pts, ray, prog, interpret=True)
    np.testing.assert_allclose(ref["rgb_samples"], pal["rgb_samples"], atol=1e-5)
    np.testing.assert_allclose(ref["density_samples"], pal["density_samples"], atol=1e-5)


def test_pack_weights_shapes():
    cfg = MLPConfig()
    params = nerf_mlp.init_nerf_params(jax.random.PRNGKey(0), cfg)
    ops, meta = pack_weights(params, cfg)
    assert len(ops) == 2 * (8 + 2)
    # every operand lane-dim is a 128 multiple
    for w in ops:
        assert w.shape[-1] % 128 == 0
    # skip layer input rows = pad(256) + pad(63)
    W4 = ops[2 * 4]
    assert W4.shape[0] == 256 + 128


def test_renderer_pallas_impl_registered():
    assert "pallas" in renderer._FORWARD_IMPL
    assert "pallas_interpret" in renderer._FORWARD_IMPL


# ---------------------------------------------------------------------------
# fused fwd+bwd custom-VJP kernel
# ---------------------------------------------------------------------------


def _interpret_pallas(monkeypatch):
    import functools
    import jax.experimental.pallas as plmod
    import sparf_tpu.ops.fused_mlp_vjp as fv

    orig = plmod.pallas_call
    monkeypatch.setattr(fv.pl, "pallas_call", functools.partial(orig, interpret=True))
    return fv


@pytest.mark.parametrize("view_dep", [True, False])
def test_fused_vjp_matches_xla_grads(monkeypatch, view_dep):
    fv = _interpret_pallas(monkeypatch)
    cfg = MLPConfig(layers_feat=(64,) * 5, layers_rgb=(32, 3), skip=(2,),
                    L_3D=6, L_view=2, view_dep=view_dep)
    params = nerf_mlp.init_nerf_params(jax.random.PRNGKey(0), cfg)
    pts = jax.random.normal(jax.random.PRNGKey(1), (1, 13, 4, 3))
    ray = jax.random.normal(jax.random.PRNGKey(2), (1, 13, 3))
    prog = jnp.asarray(0.8)

    def loss(apply_fn, p, pt, r):
        out = apply_fn(p, cfg, pt, r, prog)
        return jnp.sum(out["rgb_samples"] ** 2) + jnp.sum(jnp.sin(out["density_samples"]))

    l1, g1 = jax.value_and_grad(lambda p: loss(nerf_mlp.nerf_apply, p, pts, ray))(params)
    l2, g2 = jax.value_and_grad(lambda p: loss(fv.nerf_apply_fused_vjp, p, pts, ray))(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    err = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()), g1, g2)
    assert max(jax.tree_util.tree_leaves(err)) < 1e-4, err
    # pose-gradient path: grads wrt points and rays
    gp1 = jax.grad(lambda pt: loss(nerf_mlp.nerf_apply, params, pt, ray))(pts)
    gp2 = jax.grad(lambda pt: loss(fv.nerf_apply_fused_vjp, params, pt, ray))(pts)
    np.testing.assert_allclose(np.asarray(gp1), np.asarray(gp2), atol=1e-4)
