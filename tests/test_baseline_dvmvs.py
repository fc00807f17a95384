"""DVMVS baselines: cost volume, pairnet forward, fusionnet recurrence."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdvnet.baselines import dvmvs as D
from tdvnet.data import synthetic

IMG = (64, 64)


def test_dot_cost_volume_peaks_at_true_depth():
    sc = synthetic.make_scene(n_views=3, img_size=IMG, seed=4,
                              normalize=False)
    # use raw RGB as "features" — dot product peaks where aligned
    r = 1
    s_idx = np.asarray([0, 2])
    cost = D.dot_cost_volume(
        jnp.asarray(sc["images"][r]), jnp.asarray(sc["images"][s_idx]),
        jnp.ones(2, bool),
        (jnp.asarray(sc["rotmats"][r]), jnp.asarray(sc["tvecs"][r]),
         jnp.asarray(sc["K"][r])),
        (jnp.asarray(sc["rotmats"][s_idx]), jnp.asarray(sc["tvecs"][s_idx]),
         jnp.asarray(sc["K"][s_idx])))
    assert cost.shape == (*IMG, D.N_PLANES)
    idepths = np.linspace(1 / D.MAX_DEPTH, 1 / D.MIN_DEPTH, D.N_PLANES)
    gt = sc["depth"][r]
    sel = np.zeros_like(gt, bool)
    sel[10:-10, 10:-10] = gt[10:-10, 10:-10] > 0.6
    c = np.asarray(cost)[sel]
    gt_plane = np.abs(idepths[None] - 1 / gt[sel][:, None]).argmin(1)
    c_true = c[np.arange(c.shape[0]), gt_plane]
    # correlation at the true plane above the per-pixel mean over planes
    assert c_true.mean() > 1.1 * c.mean(1).mean(), \
        (c_true.mean(), c.mean())


@pytest.mark.slow
def test_pairnet_forward_and_harness(tmp_path):
    from tools.make_synthetic_dataset import make_scene_dir
    from tdvnet.config import load_config
    from tdvnet.eval import harness

    model, variables = D.init_pairnet(jax.random.PRNGKey(0), IMG, chunk=4,
                                      k=1)
    pred_fn = D.make_pairnet_pred_fn(model, variables, chunk=4)

    root = str(tmp_path / "synth")
    os.makedirs(root)
    make_scene_dir(root, "s0", n_views=8, hw=IMG, seed=11)
    cfg = load_config({
        "batch": {"img_size": IMG},
        "eval": {"save_dir": str(tmp_path / "res"), "depth_img_size": IMG,
                 "pdist": 0.05, "n_src_on_either_side": 1},
    })
    avg = harness.main("pairnet", pred_fn, cfg, depth=True,
                       scenes=[os.path.join(root, "s0")])
    m = avg["metrics_2d.json"]
    assert np.isfinite(m["abs_rel"])
    # untrained net still outputs strictly in-range depths
    import glob

    preds = np.load(glob.glob(str(tmp_path / "res" / "pairnet" / "scenes"
                                  / "*" / "preds.npz"))[0])["depth_preds"]
    assert (preds >= D.MIN_DEPTH - 1e-3).all() \
        and (preds <= D.MAX_DEPTH + 1e-3).all()


@pytest.mark.slow
def test_fusionnet_recurrence():
    model, variables = D.init_fusionnet(jax.random.PRNGKey(0), IMG, k=1)
    sc = synthetic.make_scene(n_views=6, img_size=IMG, seed=3)
    views = {k: sc[k] for k in ["images", "rotmats", "tvecs", "K"]}

    class FakeDset:
        k = 1

    pred_fn = D.make_fusionnet_pred_fn(model, variables, IMG)
    depths = pred_fn(views, None, FakeDset())
    assert depths.shape == (4, *IMG)
    assert np.isfinite(depths).all()
    assert (depths > 0).all()
