"""Merged multi-bundle rendering (renderer.render_bundles) must be numerically
equivalent to the per-bundle render calls it replaces — outputs AND gradients,
coarse and fine, including the no-grad (stop_gradient) visibility bundle."""
import tempfile

import numpy as np
import jax
import jax.numpy as jnp

from sparf_tpu.configs.config import ConfigDict, override_options
from sparf_tpu.configs.presets import PRESETS
from sparf_tpu.models import renderer
from sparf_tpu.models.nerf_mlp import MLPConfig
from sparf_tpu.models.renderer import RayBundle, RenderConfig


def _setup(fine: bool):
    cfg = RenderConfig(
        mlp=MLPConfig(layers_feat=(32, 32, 32, 32), layers_rgb=(16, 3), skip=(2,),
                      L_3D=4, L_view=2, barf_c2f=None),
        sample_intvs=16, sample_intvs_fine=8, fine_sampling=fine,
    )
    key = jax.random.PRNGKey(0)
    params = renderer.init_graph_params(key, cfg)
    rng = np.random.RandomState(1)
    poses = []
    for _ in range(3):
        aa = 0.1 * rng.randn(3)
        th = np.linalg.norm(aa)
        K_ = np.array([[0, -aa[2], aa[1]], [aa[2], 0, -aa[0]], [-aa[1], aa[0], 0]])
        R = np.eye(3) + np.sinc(th / np.pi) * K_ + 0.5 * np.sinc(th / (2 * np.pi)) ** 2 * (K_ @ K_)
        t = np.array([0.05, -0.02, 4.0]) + 0.1 * rng.randn(3)
        poses.append(np.concatenate([R, t[:, None]], 1))
    poses = jnp.asarray(np.stack(poses), jnp.float32)
    intr = jnp.asarray(np.tile(np.array([[40.0, 0, 26], [0, 40, 20], [0, 0, 1]]), (3, 1, 1)), jnp.float32)
    depth_range = jnp.asarray([2.0, 6.0])
    return cfg, params, poses, intr, depth_range


def _bundles(poses, intr, key):
    k1, k2, k3 = jax.random.split(key, 3)
    rng = np.random.RandomState(2)
    pix_a = jnp.asarray(rng.rand(8, 2) * np.array([50, 38]), jnp.float32)
    pix_b = jnp.asarray(rng.rand(1, 12, 2) * np.array([50, 38]), jnp.float32)
    pix_c = jnp.asarray(rng.rand(1, 8, 2) * np.array([50, 38]), jnp.float32)
    dmax = jnp.asarray(2.5 + 2.0 * rng.rand(1, 8), jnp.float32)
    return [
        RayBundle(pixels=pix_a, pose_w2c=poses, intr=intr, key=k1, stratified=True),
        RayBundle(pixels=pix_b, pose_w2c=poses[:1], intr=intr[:1], key=k2, stratified=True),
        RayBundle(pixels=pix_c, pose_w2c=poses[1:2], intr=intr[1:2], kind="tomax",
                  depth_min=jnp.asarray(2.0), depth_max=dmax, no_grad=True),
        RayBundle(pixels=pix_c, pose_w2c=poses[2:], intr=intr[2:], key=k3, stratified=True),
    ]


def _compare(fine):
    cfg, params, poses, intr, depth_range = _setup(fine)
    key = jax.random.PRNGKey(7)
    progress = jnp.asarray(1.0)

    def run(merge):
        outs = renderer.render_bundles(
            params, cfg, _bundles(poses, intr, key), depth_range, progress,
            fine_enabled=fine, merge=merge,
        )
        return outs

    ref = run(False)
    got = run(True)
    assert len(ref) == len(got)
    for r, g in zip(ref, got):
        assert set(r.keys()) == set(g.keys()), (set(r) ^ set(g))
        for k in r:
            np.testing.assert_allclose(
                np.asarray(g[k]), np.asarray(r[k]), rtol=2e-5, atol=2e-6,
                err_msg=f"key={k} fine={fine}",
            )

    # gradient equivalence, incl. zero grads through the no_grad bundle
    def loss(p, merge):
        outs = renderer.render_bundles(
            p, cfg, _bundles(poses, intr, key), depth_range, progress,
            fine_enabled=fine, merge=merge,
        )
        tot = 0.0
        for i, o in enumerate(outs):
            w = 1.0 if i != 2 else jax.lax.stop_gradient(jnp.mean(o["all_cumulated"]))
            tot = tot + w * (jnp.mean(o["rgb"] ** 2) + jnp.mean(o["depth"]))
            if fine and "rgb_fine" in o:
                tot = tot + w * jnp.mean(o["rgb_fine"] ** 2)
        return tot

    g_ref = jax.grad(lambda p: loss(p, False))(params)
    g_got = jax.grad(lambda p: loss(p, True))(params)
    for (lr, gr) in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_got)):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(lr), rtol=3e-4, atol=1e-6)


def test_render_bundles_merge_equivalence_coarse():
    _compare(fine=False)


def test_render_bundles_merge_equivalence_fine():
    _compare(fine=True)


def test_trainer_combined_loss_merged_vs_sequential():
    """Full SPARF loss stack (photometric + corres + depth_cons): the merged
    driver must produce the same losses and gradients as per-bundle renders."""
    from sparf_tpu.training.joint_trainer import PoseAndNerfTrainerPerScene

    cfg = PRESETS["joint_pose_nerf_training/synthetic/sparf"]()
    cfg = override_options(cfg, ConfigDict(
        env=ConfigDict(), scene="spheres", max_iter=400,
        synthetic=dict(H=40, W=52, n_train=3, n_test=1),
        arch=dict(layers_feat=[None, 32, 32, 32, 32], layers_rgb=[None, 16, 3], skip=[2]),
        nerf=ConfigDict(sample_intvs=16, sample_intvs_fine=8, rand_rays=64,
                        fine_sampling=True),
        depth_cons_nbr_rays=64,
        min_nbr_matches=50, use_gt_correspondences=True,
        val_steps=100000, snapshot_steps=100000, vis_steps=100000,
    ))
    tr = PoseAndNerfTrainerPerScene(cfg, workspace=tempfile.mkdtemp())
    key = jax.random.PRNGKey(3)
    it = jnp.asarray(300.0)
    prog = jnp.asarray(0.75)
    poses = tr.current_poses_w2c()

    def total(nerf_params, merge):
        tr.cfg.tpu.merged_render = merge
        builder = tr.make_loss_builder(sample_in_center=False, fine_enabled=True)
        ld, stats = builder(nerf_params, poses, key, it, prog)
        return sum(jnp.sum(v) for v in ld.values()), (ld, stats)

    (l_ref, (ld_ref, st_ref)), g_ref = jax.value_and_grad(
        lambda p: total(p, False), has_aux=True)(tr.state.nerf_params)
    (l_got, (ld_got, st_got)), g_got = jax.value_and_grad(
        lambda p: total(p, True), has_aux=True)(tr.state.nerf_params)

    assert set(ld_ref) == set(ld_got)
    for k in ld_ref:
        np.testing.assert_allclose(np.asarray(ld_got[k]), np.asarray(ld_ref[k]),
                                   rtol=1e-4, atol=1e-7, err_msg=k)
    np.testing.assert_allclose(np.asarray(l_got), np.asarray(l_ref), rtol=1e-4)
    for (lr, gr) in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_got)):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(lr), rtol=5e-4, atol=1e-6)
