"""Golden-value regression of the full flagship forward on fixed seeds
(SURVEY §4: the reference has no tests; golden values pin our numerics on
CPU so refactors that silently change behavior fail loudly).

Regenerate with the snippet in this file's history if an *intentional*
numerics change lands (document why in the commit message).
"""
import numpy as np
import jax
import pytest

from tdvnet.config import tiny_test_config
from tdvnet.data import batch as B, synthetic

GOLDEN_LOSS = 27.17440414428711
GOLDEN_DEPTH_MEAN = 0.8770878911018372
GOLDEN_DEPTH_STD = 0.003134023165330291
GOLDEN_INIT_ABS_REL = 0.2552167475223541


@pytest.mark.slow
def test_flagship_forward_golden():
    from tdvnet.models.threedvnet import ThreeDVNet

    cfg = tiny_test_config()
    bc = cfg.batch
    fb = B.collate_scenes(
        [synthetic.make_batch_scene(bc.n_views, bc.img_size,
                                    bc.depth_img_size, seed=123)],
        bc.n_views, bc.n_ref, bc.n_src_on_either_side)
    m = ThreeDVNet(cfg.model)
    vs = m.init(jax.random.PRNGKey(42), fb, offsets=[0.05], n_iters=1,
                lam=0.5, train=False)
    out = m.apply(vs, fb, offsets=[0.05], n_iters=1, lam=0.5, train=False,
                  with_metrics=True)
    d = np.asarray(out["depth_pred"])
    assert float(out["loss"]) == pytest.approx(GOLDEN_LOSS, rel=1e-4)
    assert float(d.mean()) == pytest.approx(GOLDEN_DEPTH_MEAN, rel=1e-4)
    assert float(d.std()) == pytest.approx(GOLDEN_DEPTH_STD, rel=1e-2)
    assert float(out["initial"]["abs_rel"]) == pytest.approx(
        GOLDEN_INIT_ABS_REL, rel=1e-3)


GOLDEN_FUSED_MEAN = 0.8769615292549133
GOLDEN_FUSED_STD = 0.0030582230538129807
GOLDEN_FUSED_PIX = [0.8752748966217041, 0.8761805295944214,
                    0.8689519166946411]


@pytest.mark.slow
def test_fused_driver_golden():
    """Golden pin of the two-dispatch fused eval driver at a small but
    real whole-scene shape (VERDICT r3 weak #7: the round-3 suite had no
    golden on the driver that produces the shipped comparison numbers)."""
    import dataclasses

    from tdvnet.eval.fused_scene import FusedSceneInference
    from tdvnet.models.threedvnet import ThreeDVNet

    cfg = tiny_test_config()
    cfg = dataclasses.replace(cfg, eval=dataclasses.replace(
        cfg.eval, eval_grid_size=(16, 16, 16), eval_max_anchors=4096,
        n_src_on_either_side=1, fused_chunk=4, grid_bucket=8))
    bc = cfg.batch
    views = synthetic.make_scene(n_views=6, img_size=bc.img_size, seed=11)
    m = ThreeDVNet(cfg.model)
    fb = B.collate_scenes(
        [synthetic.make_batch_scene(bc.n_views, bc.img_size,
                                    bc.depth_img_size, seed=123)],
        bc.n_views, bc.n_ref, bc.n_src_on_either_side)
    vs = jax.jit(lambda r, b: m.init(r, b, offsets=[0.05], n_iters=1,
                                     lam=0.5, train=False))(
        jax.random.PRNGKey(42), fb)
    inf = FusedSceneInference(m, vs, cfg, offsets_list=((0.05, 0.025),),
                              fetch_mm=False)
    d = np.asarray(inf.predict_scene(views))
    assert d.shape == (4, 64, 80)
    assert float(d.mean()) == pytest.approx(GOLDEN_FUSED_MEAN, rel=1e-4)
    assert float(d.std()) == pytest.approx(GOLDEN_FUSED_STD, rel=1e-2)
    got = [float(d[0, 10, 10]), float(d[1, 30, 40]), float(d[-1, -5, -5])]
    np.testing.assert_allclose(got, GOLDEN_FUSED_PIX, rtol=1e-3)
