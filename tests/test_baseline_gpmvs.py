"""GPMVS baseline: cost volume correctness, GP layer behavior, harness run."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdvnet.baselines import gpmvs as G
from tdvnet.data import synthetic


IMG = (48, 64)


def test_photometric_cost_dips_at_true_depth():
    sc = synthetic.make_scene(n_views=3, img_size=IMG, seed=4,
                              normalize=False)
    r = 1
    s_idx = jnp.asarray([0, 2])
    cost = G.photometric_cost_volume(
        jnp.asarray(sc["images"][r]), jnp.asarray(sc["images"][s_idx]),
        jnp.ones(2, bool), jnp.asarray(sc["rotmats"][r]),
        jnp.asarray(sc["tvecs"][r]), jnp.asarray(sc["K"][r]),
        jnp.asarray(sc["rotmats"][s_idx]), jnp.asarray(sc["tvecs"][s_idx]),
        jnp.asarray(sc["K"][s_idx]), IMG)
    assert cost.shape == (*IMG, G.N_PLANES)
    # photoconsistency: the cost at the plane nearest the GT depth must be
    # far below the mean cost over planes (argmin itself is physics-limited
    # by the smooth texture + tiny baselines of the synthetic trajectory)
    idepths = np.linspace(G.IDEPTH_MIN, G.IDEPTH_MAX, G.N_PLANES)
    gt = sc["depth"][r]
    sel = np.zeros_like(gt, bool)
    sel[8:-8, 8:-8] = gt[8:-8, 8:-8] > 0.6
    c = np.asarray(cost)[sel]                      # [M, D]
    gt_plane = np.abs(idepths[None, :] - 1.0 / gt[sel][:, None]).argmin(1)
    c_true = c[np.arange(c.shape[0]), gt_plane]
    # near-zero absolute photo-error at the true plane for typical pixels,
    # and clearly below the per-pixel mean over planes
    assert np.median(c_true) < 0.1, np.median(c_true)
    assert c_true.mean() < 0.8 * c.mean(1).mean(), \
        (c_true.mean(), c.mean())


def test_gp_layer_zero_distance_recovers_input():
    """With D=0 the kernel is constant: Z = relu of an average-like blend;
    with huge sigma2 the solve shrinks Z toward 0."""
    model = G.GPLayer()
    Y = jnp.asarray(np.random.default_rng(0).normal(size=(3, 8))
                    .astype(np.float32))
    D = jnp.zeros((3, 3))
    vs = model.init(jax.random.PRNGKey(0), D, Y)
    Z = model.apply(vs, D, Y)
    assert Z.shape == Y.shape
    assert np.isfinite(np.asarray(Z)).all()
    # far-apart frames → kernel ≈ diag → Z ≈ relu(c·Y) per-frame
    Dfar = jnp.full((3, 3), 1e3) - 1e3 * jnp.eye(3)
    Z2 = np.asarray(model.apply(vs, Dfar, Y))
    corr = np.corrcoef(Z2.ravel(), np.maximum(np.asarray(Y), 0).ravel())[0, 1]
    assert np.isfinite(corr)


def test_pose_distance_matrix():
    poses = np.repeat(np.eye(4, dtype=np.float32)[None], 3, 0)
    poses[1, :3, 3] = [0.3, 0, 0]
    poses[2, :3, 3] = [0.6, 0, 0]
    D = G.pose_distance_matrix(poses)
    np.testing.assert_allclose(np.diag(D), 0, atol=1e-6)
    np.testing.assert_allclose(D[0, 1], 0.3, atol=1e-3)
    np.testing.assert_allclose(D, D.T, atol=1e-6)


@pytest.mark.slow
def test_gpmvs_harness_run(tmp_path):
    from tools.make_synthetic_dataset import make_scene_dir
    from tdvnet.config import load_config
    from tdvnet.eval import harness

    root = str(tmp_path / "synth")
    os.makedirs(root)
    make_scene_dir(root, "s0", n_views=8, hw=IMG, seed=9)
    scenes = [os.path.join(root, "s0")]

    model, variables = G.init_gpmvs(jax.random.PRNGKey(0), IMG, seq_len=4)
    pred_fn = G.make_pred_fn(model, variables, IMG, seq_bucket=8)

    cfg = load_config({
        "batch": {"img_size": IMG},
        "eval": {"save_dir": str(tmp_path / "res"), "depth_img_size": IMG,
                 "pdist": 0.05, "n_src_on_either_side": 1},
    })
    avg = harness.main("gpmvs", pred_fn, cfg, depth=True, scenes=scenes)
    assert "metrics_2d.json" in avg
    assert np.isfinite(avg["metrics_2d.json"]["abs_rel"])


def test_gpmvs_loss_and_grads():
    model, variables = G.init_gpmvs(jax.random.PRNGKey(0), IMG, seq_len=2)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(2, *IMG, 3)).astype(np.float32))
    costs = jnp.asarray(rng.uniform(size=(2, *IMG, G.N_PLANES))
                        .astype(np.float32))
    D = jnp.asarray(G.pose_distance_matrix(
        np.repeat(np.eye(4, dtype=np.float32)[None], 2, 0)))
    gt = jnp.asarray(rng.uniform(1, 3, size=(2, *IMG)).astype(np.float32))

    def loss_fn(params):
        (_, disps), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            imgs, costs, D, True, mutable=["batch_stats"])
        return G.gpmvs_loss(disps, gt)

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.abs(g).sum())
                for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0
