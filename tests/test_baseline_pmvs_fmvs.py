"""PointMVSNet + FastMVSNet baselines."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdvnet.data import synthetic

IMG = (64, 80)
DEPTH_CFG = (0.5, 0.2, 16)


def test_local_knn_prefers_close_points():
    from tdvnet.baselines.pointmvsnet import local_knn

    H, W, L = 4, 5, 5
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.normal(size=(L * H * W, 3)).astype(np.float32))
    knn = np.asarray(local_knn(xyz, H, W, L, k=8))
    assert knn.shape == (L * H * W, 8)
    # each point's nearest candidate includes itself (distance 0)
    x = np.asarray(xyz)
    for p in range(0, L * H * W, 7):
        assert p in knn[p]
        d = np.linalg.norm(x[knn[p]] - x[p], axis=1)
        assert d.min() == 0.0


def test_prob_map_extractors():
    from tdvnet.baselines.pointmvsnet import (prob_map_from_flow,
                                              prob_map_from_volume)

    # delta distribution → prob map ~ 2 * peak? (floor==ceil at integers)
    R, D, h, w = 2, 8, 4, 4
    prob = np.zeros((R, D, h, w), np.float32)
    prob[:, 3] = 1.0
    depth = np.full((R, h, w), 0.5 + 3 * 0.1, np.float32)
    pm = np.asarray(prob_map_from_volume(jnp.asarray(prob),
                                         jnp.asarray(depth), 0.5, 0.1))
    np.testing.assert_allclose(pm, 2.0, atol=1e-5)

    fp = np.zeros((R, 5, h, w), np.float32)
    fp[:, 2] = 1.0
    fm = np.asarray(prob_map_from_flow(jnp.asarray(fp)))
    np.testing.assert_allclose(fm, 2.0, atol=1e-5)


@pytest.mark.slow
def test_pointmvsnet_forward():
    from tdvnet.baselines import pointmvsnet as PM

    model, variables = PM.init_pointmvsnet(jax.random.PRNGKey(0), IMG, 3,
                                           DEPTH_CFG)
    sc = synthetic.make_scene(n_views=3, img_size=IMG, seed=2)
    d, cp, fp = model.apply(
        variables, jnp.asarray(sc["images"]), jnp.asarray(sc["rotmats"]),
        jnp.asarray(sc["tvecs"]), jnp.asarray(sc["K"]), jnp.asarray([1]),
        jnp.asarray([[0, 2]]), jnp.ones((1, 2), bool), 2, False)
    assert np.isfinite(np.asarray(d)).all()
    assert d.shape[0] == 1 and cp.shape[0] == 1
    assert fp.shape[1] == 5  # flow probability over the 5 intervals


def test_gauss_newton_recovers_depth_perturbation():
    """GN on GT features: perturbed GT depth must move back toward GT."""
    from tdvnet.baselines.fastmvsnet import gauss_newton_step

    sc = synthetic.make_scene(n_views=3, img_size=IMG, seed=6,
                              normalize=False)
    # use RGB images as "features"
    feats = jnp.asarray(sc["images"])
    gt = sc["depth"][1]
    rng = np.random.default_rng(0)
    noisy = gt + rng.normal(0, 0.05, gt.shape).astype(np.float32)
    d1 = gauss_newton_step(
        jnp.asarray(noisy), feats[1], feats, jnp.asarray([0, 2]),
        jnp.ones(2, bool), jnp.asarray(sc["rotmats"]),
        jnp.asarray(sc["tvecs"]), jnp.asarray(sc["K"]), 1, IMG)
    err0 = np.abs(noisy - gt)
    err1 = np.abs(np.asarray(d1) - gt)
    sel = gt > 0.6
    # median error decreases after one GN step
    assert np.median(err1[sel]) < 0.9 * np.median(err0[sel]), \
        (np.median(err0[sel]), np.median(err1[sel]))


@pytest.mark.slow
def test_fastmvsnet_harness(tmp_path):
    from tools.make_synthetic_dataset import make_scene_dir
    from tdvnet.baselines import fastmvsnet as FM
    from tdvnet.config import load_config
    from tdvnet.eval import harness

    root = str(tmp_path / "synth")
    os.makedirs(root)
    make_scene_dir(root, "s0", n_views=7, hw=IMG, seed=17)
    model, variables = FM.init_fastmvsnet(jax.random.PRNGKey(0), IMG,
                                          3 + 2, DEPTH_CFG)
    pred_fn = FM.make_pred_fn(model, variables, chunk=3)
    cfg = load_config({
        "batch": {"img_size": IMG},
        "eval": {"save_dir": str(tmp_path / "res"), "depth_img_size": IMG,
                 "pdist": 0.05, "n_src_on_either_side": 1},
    })
    avg = harness.main("fastmvsnet", pred_fn, cfg, depth=True,
                       scenes=[os.path.join(root, "s0")])
    assert np.isfinite(avg["metrics_2d.json"]["abs_rel"])
    # prob map got saved into preds.npz
    import glob

    data = np.load(glob.glob(str(tmp_path / "res" / "fastmvsnet" / "scenes"
                                 / "*" / "preds.npz"))[0])
    assert "init_prob" in data
