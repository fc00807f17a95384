"""End-to-end eval harness on a synthetic info.json dataset (BASELINE
config 4 shape): dataset loader → keyframing → preds.npz → 2D metrics →
point-cloud fusion → F-score → aggregation, with GT depth as the method
(metrics must be ~perfect)."""
import dataclasses
import json
import os

import numpy as np
import pytest

from tdvnet.config import load_config


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    from tools.make_synthetic_dataset import make_scene_dir

    root = str(tmp_path_factory.mktemp("synthset"))
    for s in range(2):
        make_scene_dir(root, f"synth_{s:04d}", n_views=10, hw=(60, 80),
                       seed=s)
    return root


def test_harness_gt_passthrough(synth_root, tmp_path):
    from tdvnet.eval import harness

    cfg = load_config({
        "batch": {"img_size": (60, 80)},
        "eval": {
            "save_dir": str(tmp_path / "results"),
            "depth_img_size": (60, 80),
            "pdist": 0.05,
            "n_src_on_either_side": 1,
            "z_thresh": 0.02,
            "n_consistent_thresh": 2,
        },
    })
    scenes = sorted(os.path.join(synth_root, d) for d in os.listdir(synth_root))

    def gt_pred_fn(views, scene_dir, dset):
        k = dset.k
        return views["depth"][k:-k]

    avg = harness.main("gt_passthrough", gt_pred_fn, cfg, depth=True,
                       scenes=scenes)
    assert "metrics_2d.json" in avg
    m2d = avg["metrics_2d.json"]
    assert m2d["abs_rel"] < 0.01, m2d
    assert m2d["d_125"] > 0.99, m2d
    m3d = avg["metrics_3d_0.020_2v_masked.json"]
    # precision ~1 (every fused point on-surface); completeness is bounded by
    # the keyframe subset's coverage vs the all-views GT mesh
    assert m3d["prec"] > 0.95, m3d
    assert m3d["fscore"] > 0.75, m3d
    assert m3d["acc"] < 0.03, m3d

    # idempotent caching: second run reuses preds + metrics
    avg2 = harness.main("gt_passthrough", gt_pred_fn, cfg, depth=True,
                        scenes=scenes)
    assert avg2["metrics_2d.json"] == m2d


def test_harness_dp_fused(synth_root, tmp_path):
    """make_3dvnet_pred_fn(mesh=, dp=True) end-to-end through the harness
    (VERDICT r4 #5): a 2-device DP group serves both scenes from ONE SPMD
    dispatch, group-prefetched through `dset`, and the metrics aggregate
    exactly like the per-scene path."""
    import jax
    from jax.sharding import Mesh

    from tdvnet.config import tiny_test_config
    from tdvnet.data import batch as B, synthetic
    from tdvnet.eval import harness
    from tdvnet.models.threedvnet import ThreeDVNet

    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg,
        batch=dataclasses.replace(cfg.batch, img_size=(64, 80),
                                  depth_img_size=(60, 80)),
        eval=dataclasses.replace(
            cfg.eval, save_dir=str(tmp_path / "results_dp"),
            depth_img_size=(60, 80), pdist=0.05, n_src_on_either_side=1,
            eval_grid_size=(16, 16, 16), eval_max_anchors=4096,
            fused_chunk=4, grid_bucket=8, z_thresh=0.02,
            n_consistent_thresh=2))
    scenes = sorted(os.path.join(synth_root, d)
                    for d in os.listdir(synth_root))

    bc = cfg.batch
    model = ThreeDVNet(cfg.model)
    fb = B.collate_scenes(
        [synthetic.make_batch_scene(bc.n_views, bc.img_size,
                                    bc.depth_img_size, seed=0)],
        bc.n_views, bc.n_ref, bc.n_src_on_either_side)
    variables = jax.jit(lambda r, b: model.init(
        r, b, offsets=[0.05], n_iters=1, lam=0.0, train=False))(
        jax.random.PRNGKey(0), fb)

    import jax as _jax
    mesh = Mesh(np.asarray(_jax.devices()[:2]), ("data",))
    pred_fn = harness.make_3dvnet_pred_fn(model, variables, cfg,
                                          mesh=mesh, dp=True)
    avg = harness.main("dvnet_dp", pred_fn, cfg, depth=True, scenes=scenes)
    assert "metrics_2d.json" in avg
    m2d = avg["metrics_2d.json"]
    # untrained tiny net: only require finite, plausible outputs and a
    # complete metric pipeline
    assert np.isfinite(m2d["abs_rel"]), m2d
    # both scenes produced preds through the ONE group dispatch
    for s in scenes:
        p = os.path.join(str(tmp_path / "results_dp"), "dvnet_dp", "scenes",
                         os.path.basename(s), "preds.npz")
        assert os.path.exists(p)


def test_harness_mesh_method(synth_root, tmp_path):
    """depth=False path: method returns a mesh; harness renders depth from it
    and runs the volumetric metrics (trim_mesh → TSDF refusion)."""
    from tdvnet.eval import harness
    from tdvnet.ops import ply

    cfg = load_config({
        "batch": {"img_size": (60, 80)},
        "eval": {
            "save_dir": str(tmp_path / "results_mesh"),
            "depth_img_size": (60, 80),
            "pdist": 0.05,
            "n_src_on_either_side": 1,
            "tsdf_img_batch": 8,
            "tsdf_margin": 0.3,
        },
    })
    scenes = sorted(os.path.join(synth_root, d)
                    for d in os.listdir(synth_root))[:1]

    def mesh_pred_fn(views, scene_dir, dset):
        # "predict" the GT mesh itself
        info = json.load(open(os.path.join(scene_dir, "info.json")))
        verts, faces, _ = ply.read_ply(info["gt_mesh"])
        return verts, faces

    avg = harness.main("gt_mesh", mesh_pred_fn, cfg, depth=False,
                       scenes=scenes)
    assert "metrics_3d_masked.json" in avg
    m = avg["metrics_3d_masked.json"]
    assert m["fscore"] > 0.8, m
    m2d = avg["metrics_2d.json"]
    assert m2d["abs_rel"] < 0.05, m2d
