"""Model smoke + behavior tests on the tiny CPU config (BASELINE config 1/2)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdvnet.config import tiny_test_config
from tdvnet.data import batch as B
from tdvnet.data import synthetic


@pytest.fixture(scope="module")
def cfg():
    return tiny_test_config()


@pytest.fixture(scope="module")
def fbatch(cfg):
    bc = cfg.batch
    scenes = [synthetic.make_batch_scene(bc.n_views, bc.img_size,
                                         bc.depth_img_size, seed=s)
              for s in range(bc.n_scenes)]
    return B.collate_scenes(scenes, bc.n_views, bc.n_ref,
                            bc.n_src_on_either_side)


def test_backbone_scale_contract(cfg):
    from tdvnet.models.backbone import MnasMulti

    m = MnasMulti()
    x = jnp.zeros((2, 64, 80, 3))
    vs = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(vs, x)
    shapes = [o.shape for o in outs]
    assert shapes == [(2, 32, 40, 16), (2, 16, 20, 24), (2, 8, 10, 40),
                      (2, 4, 5, 96), (2, 2, 3, 320)]


def test_mvsnet_depth_range(cfg, fbatch):
    from tdvnet.models.mvsnet import MVSNet

    c = cfg.model
    dc = c.depth_test
    net = MVSNet(c.feat_dim, c.img_size, c.cost_base_channels)
    vs = net.init(jax.random.PRNGKey(0), fbatch.images, fbatch.rotmats,
                  fbatch.tvecs, fbatch.K, fbatch.ref_idx, fbatch.src_idx,
                  fbatch.src_mask, dc.depth_start, dc.depth_interval,
                  dc.n_intervals, dc.size)
    depth, prob, half, quarter, eighth = net.apply(
        vs, fbatch.images, fbatch.rotmats, fbatch.tvecs, fbatch.K,
        fbatch.ref_idx, fbatch.src_idx, fbatch.src_mask, dc.depth_start,
        dc.depth_interval, dc.n_intervals, dc.size)
    R = fbatch.n_refs
    assert depth.shape == (R, *dc.size)
    assert prob.shape == (R, dc.n_intervals, *dc.size)
    d = np.asarray(depth)
    assert (d >= dc.depth_start - 1e-4).all() and (d <= dc.depth_end + 1e-4).all()
    assert np.isfinite(d).all()
    # prob sums to 1 over planes
    np.testing.assert_allclose(np.asarray(prob).sum(1), 1.0, atol=1e-4)
    assert half.shape == (fbatch.n_imgs, 32, 40, c.feat_dim)
    assert quarter.shape == (fbatch.n_imgs, 16, 20, c.feat_dim)


def test_scene_unet_respects_mask(cfg, rng):
    from tdvnet.models.scene_unet import SceneUNet

    dims = cfg.model.unet_dims
    net = SceneUNet(dims, cfg.model.unet_groups, cfg.model.unet_res)
    B_, G = 1, 16
    grid = jnp.asarray(rng.normal(size=(B_, G, G, G, dims[0])).astype(np.float32))
    mask = jnp.asarray((rng.uniform(size=(B_, G, G, G, 1)) > 0.9)
                       .astype(np.float32))
    vs = net.init(jax.random.PRNGKey(0), grid, mask)
    outs = net.apply(vs, grid, mask)
    assert [o["stride"] for o in outs] == [4, 2, 1]
    for o in outs:
        g, m = np.asarray(o["grid"]), np.asarray(o["mask"])
        # strictly zero off the active set
        assert np.abs(g * (1 - m)).max() == 0.0
        assert np.isfinite(g).all()
    # changing the *input* at inactive cells must not change active outputs
    grid2 = grid + 100.0 * (1 - mask) * jnp.asarray(
        rng.normal(size=grid.shape).astype(np.float32))
    outs2 = net.apply(vs, grid2, mask)
    np.testing.assert_allclose(np.asarray(outs[-1]["grid"]),
                               np.asarray(outs2[-1]["grid"]), atol=1e-4)


def test_full_forward_and_grads(cfg, fbatch):
    from tdvnet.models.threedvnet import ThreeDVNet

    net = ThreeDVNet(cfg.model)
    rngs = jax.random.PRNGKey(0)
    vs = net.init(rngs, fbatch, offsets=[0.05], n_iters=1, lam=0.5,
                  train=False)
    out, _ = net.apply(vs, fbatch, offsets=[0.05, 0.025], n_iters=1, lam=0.5,
                       train=True, mutable=["batch_stats"])
    assert np.isfinite(float(out["loss"]))
    assert out["depth_pred"].shape == (fbatch.n_refs, *cfg.batch.img_size)
    assert len(out["ref"]) == 2
    for stage in ["initial", "quarter", "half", "final"]:
        assert np.isfinite(float(out[stage]["abs_rel"]))

    # gradients flow into every submodule
    def loss_fn(params):
        o, _ = net.apply({"params": params, "batch_stats": vs["batch_stats"]},
                         fbatch, offsets=[0.05], n_iters=1, lam=0.5,
                         train=True, mutable=["batch_stats"],
                         with_metrics=False)
        return o["loss"]

    grads = jax.grad(loss_fn)(vs["params"])
    leaves = {}
    for mod in ["mvsnet", "pointnet", "scene_unet", "decoder",
                "refine_quarter", "refine_half", "refine_full"]:
        g = jax.tree_util.tree_leaves(grads[mod])
        norm = float(sum(jnp.abs(x).sum() for x in g))
        leaves[mod] = norm
        assert np.isfinite(norm), mod
        assert norm > 0, f"no gradient into {mod}: {leaves}"


def test_propagation_net_identity_weight_limit(rng):
    """With uniform weights the output is the 3x3 box mean of depth."""
    from tdvnet.models.upsampling import unfold3x3

    d = jnp.asarray(rng.normal(size=(2, 8, 10)).astype(np.float32))
    u = unfold3x3(d)
    assert u.shape == (2, 8, 10, 9)
    # center channel (dy=1, dx=1 → index 4) is the original depth
    np.testing.assert_allclose(np.asarray(u[..., 4]), np.asarray(d))
