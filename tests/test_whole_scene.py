"""Flagship chunked whole-scene inference on the tiny config: the streaming
SceneInference path must run a scene longer than every chunk size and
produce finite, plausible depth for every ref view."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdvnet.config import tiny_test_config
from tdvnet.data import synthetic


@pytest.mark.slow
def test_scene_inference_streams_chunks():
    from tdvnet.models.threedvnet import ThreeDVNet
    from tdvnet.eval.whole_scene import SceneInference
    from tdvnet.data import batch as B

    cfg = tiny_test_config()
    cfg = dataclasses.replace(cfg, eval=dataclasses.replace(
        cfg.eval, init_depth_batch=4, offset_batch=3, upsample_batch=5,
        n_src_on_either_side=1,
        eval_grid_size=(16, 16, 16), eval_max_anchors=2048))

    bc = cfg.batch
    model = ThreeDVNet(cfg.model)
    fb = B.collate_scenes(
        [synthetic.make_batch_scene(bc.n_views, bc.img_size,
                                    bc.depth_img_size, seed=0)],
        bc.n_views, bc.n_ref, bc.n_src_on_either_side)
    variables = model.init(jax.random.PRNGKey(0), fb, offsets=[0.05],
                           n_iters=1, lam=0.0, train=False)

    sc = synthetic.make_scene(n_views=11, img_size=bc.img_size, seed=2)
    views = {k: sc[k] for k in ["images", "rotmats", "tvecs", "K"]}

    inf = SceneInference(model, variables, cfg,
                         offsets_list=[[0.05, 0.025]])
    depth = inf.predict_scene(views)
    assert depth.shape == (9, *bc.img_size)
    assert np.isfinite(depth).all()
    assert (depth > 0.2).all() and (depth < 10).all()
