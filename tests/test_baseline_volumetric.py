"""Atlas + NeuralRecon volumetric baselines."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdvnet.data import synthetic

IMG = (64, 80)


def test_backproject_accumulate_fills_frustum():
    from tdvnet.baselines.atlas import backproject_accumulate

    sc = synthetic.make_scene(n_views=2, img_size=IMG, seed=0)
    P = np.einsum("nij,njk->nik", sc["K"],
                  np.concatenate([sc["rotmats"], sc["tvecs"][..., None]], 2))
    feats = jnp.ones((2, IMG[0] // 4, IMG[1] // 4, 5))
    origin = jnp.asarray([-2.0, -2.0, 0.0])
    vol, valid = backproject_accumulate(feats, jnp.asarray(P), origin,
                                        (20, 20, 14), 0.2)
    v = np.asarray(valid)[..., 0]
    # the outward-looking cameras see ~1% of the whole room volume
    assert 0.003 < v.mean() < 0.5, v.mean()
    # features arrive exactly where valid
    m = np.asarray(vol)
    assert (m[v > 0] != 0).any()
    assert np.abs(m[v == 0]).max() == 0.0


@pytest.mark.slow
def test_atlas_harness_mesh(tmp_path):
    from tools.make_synthetic_dataset import make_scene_dir
    from tdvnet.baselines import atlas as A
    from tdvnet.config import load_config
    from tdvnet.eval import harness

    root = str(tmp_path / "synth")
    os.makedirs(root)
    make_scene_dir(root, "s0", n_views=6, hw=IMG, seed=13)
    model, variables = A.init_atlas(jax.random.PRNGKey(0), IMG, (24, 24, 24))
    pred_fn = A.make_pred_fn(model, variables, voxel_size=0.12, max_dim=48)
    cfg = load_config({
        "batch": {"img_size": IMG},
        "eval": {"save_dir": str(tmp_path / "res"), "depth_img_size": IMG,
                 "pdist": 0.05, "n_src_on_either_side": 1,
                 "tsdf_img_batch": 8, "tsdf_margin": 0.3},
    })
    avg = harness.main("atlas", pred_fn, cfg, depth=False,
                       scenes=[os.path.join(root, "s0")])
    assert "metrics_2d.json" in avg and "metrics_3d_masked.json" in avg
    assert np.isfinite(avg["metrics_3d_masked.json"]["fscore"])


@pytest.mark.slow
def test_neuralrecon_fragments(tmp_path):
    from tdvnet.baselines import neuralrecon as NR

    model, variables = NR.init_neuralrecon(jax.random.PRNGKey(0), IMG,
                                           (16, 16, 16))
    sc = synthetic.make_scene(n_views=12, img_size=IMG, seed=5)
    views = {k: sc[k] for k in ["images", "rotmats", "tvecs", "K"]}

    class FD:
        k = 0

    pred_fn = NR.make_pred_fn(model, variables, voxel_fine=0.15,
                              frag_dim=16, max_global_dim=64)
    verts, faces = pred_fn(views, None, FD())
    # untrained net: mesh may be empty or noisy, but the incremental pipeline
    # must run and produce a consistent container
    assert verts.ndim == 2 and verts.shape[1] == 3
    assert faces.ndim == 2 and faces.shape[1] == 3
    if len(verts):
        assert np.isfinite(verts).all()


def test_neuralrecon_loss_finite():
    from tdvnet.baselines import neuralrecon as NR

    rng = np.random.default_rng(0)
    dims = (16, 16, 16)
    occ_all = [jnp.asarray(rng.normal(size=(d // s,) * 3).astype(np.float32))
               for s, d in zip(NR.SCALES, [16] * 3)]
    tsdf = jnp.asarray(rng.uniform(-1, 1, size=dims).astype(np.float32))
    gt = jnp.asarray(rng.uniform(-1, 1, size=dims).astype(np.float32))
    w = jnp.asarray((rng.uniform(size=dims) > 0.5).astype(np.float32))
    loss = NR.neuralrecon_loss(occ_all, tsdf, gt, w, dims)
    assert np.isfinite(float(loss))
