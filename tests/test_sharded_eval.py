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
