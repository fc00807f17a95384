"""Sharded whole-scene eval == unsharded (VERDICT r1 #4: the halo U-Net
wired into the real eval path, not just a dryrun)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from tdvnet.config import tiny_test_config
from tdvnet.data import batch as B, synthetic
from tdvnet.eval.whole_scene import SceneInference
from tdvnet.models.threedvnet import ThreeDVNet


def test_sharded_scene_inference_matches_unsharded():
    n_sp = 4
    mesh = Mesh(np.asarray(jax.devices()[:n_sp]), ("space",))
    cfg = tiny_test_config()
    cfg = dataclasses.replace(cfg, eval=dataclasses.replace(
        cfg.eval, eval_grid_size=(64, 16, 16), eval_max_anchors=4096,
        n_src_on_either_side=1, init_depth_batch=4, offset_batch=4,
        upsample_batch=8, grid_bucket=8))
    bc = cfg.batch
    views = synthetic.make_scene(n_views=6, img_size=bc.img_size, seed=3)

    model = ThreeDVNet(cfg.model)
    scenes = [synthetic.make_batch_scene(bc.n_views, bc.img_size,
                                         bc.depth_img_size, seed=0)]
    fb = B.collate_scenes(scenes, bc.n_views, bc.n_ref,
                          bc.n_src_on_either_side)
    variables = jax.jit(lambda r, b: model.init(
        r, b, offsets=[0.05], n_iters=1, lam=0.0, train=False))(
        jax.random.PRNGKey(0), fb)

    inf_ref = SceneInference(model, variables, cfg, offsets_list=((0.05,),))
    d_ref = inf_ref.predict_scene(views)

    inf_sh = SceneInference(model, variables, cfg, offsets_list=((0.05,),),
                            mesh=mesh)
    d_sh = inf_sh.predict_scene(views)

    assert np.isfinite(d_sh).all()
    np.testing.assert_allclose(d_sh, d_ref, rtol=1e-4, atol=1e-4)


def test_fused_dp_eval_matches_single(monkeypatch):
    """DP-over-scenes fused driver == per-scene fused driver (VERDICT r3
    #6: the fast two-dispatch path under a mesh, one scene per device)."""
    from tdvnet.eval.fused_scene import (FusedSceneInference,
                                         FusedSceneInferenceDP)

    n_dev = 4
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("data",))
    cfg = tiny_test_config()
    cfg = dataclasses.replace(cfg, eval=dataclasses.replace(
        cfg.eval, eval_grid_size=(16, 16, 16), eval_max_anchors=4096,
        n_src_on_either_side=1, fused_chunk=4, grid_bucket=8))
    bc = cfg.batch
    # different lengths exercise ref-bucket padding within a group
    views_list = [synthetic.make_scene(n_views=n, img_size=bc.img_size,
                                       seed=s)
                  for s, n in [(3, 6), (4, 5), (5, 6)]]

    model = ThreeDVNet(cfg.model)
    scenes = [synthetic.make_batch_scene(bc.n_views, bc.img_size,
                                         bc.depth_img_size, seed=0)]
    fb = B.collate_scenes(scenes, bc.n_views, bc.n_ref,
                          bc.n_src_on_either_side)
    variables = jax.jit(lambda r, b: model.init(
        r, b, offsets=[0.05], n_iters=1, lam=0.0, train=False))(
        jax.random.PRNGKey(0), fb)

    offs = ((0.05,),)
    dp = FusedSceneInferenceDP(model, variables, cfg, mesh,
                               offsets_list=offs)
    d_dp = list(dp.predict_scenes(views_list))

    single = FusedSceneInference(model, variables, cfg, offsets_list=offs)
    # the DP group uses ONE grid (max extent over the group); pin the
    # single-scene driver to the same grid for exact comparison
    exts = []
    for v in views_list:
        st = single._dispatch_prep(v)
        bb = np.asarray(st["out"][4])
        exts.append(bb[1] - bb[0])
    ext = np.where(np.isfinite(exts), exts, 0.0).max(0)
    gc = single._grid_from_extent(ext)
    monkeypatch.setattr(single, "_grid_from_extent", lambda e: gc)

    for v, dd in zip(views_list, d_dp):
        ds = single.predict_scene(v)
        assert dd.shape == ds.shape
        np.testing.assert_allclose(dd, ds, rtol=2e-3, atol=2e-3)
