"""The im2col conv3d lowering is exact vs XLA's native conv.

Covers `tdvnet/ops/conv3d.py` + the `impl="im2col"` switch on the conv
blocks: same param tree, same outputs (fp32, CPU) for CostRegNet and
SceneUNet — so the lowering is checkpoint-interchangeable with the
shipped weights.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdvnet.ops.conv3d import conv3d_im2col, same_pads


def _ref_conv(x, w, strides, padding, input_dilation=(1, 1, 1)):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=strides, padding=padding,
        lhs_dilation=input_dilation,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


@pytest.mark.parametrize("stride,dilation,pad", [
    (1, 1, ((1, 1), (1, 1), (1, 1))),
    (2, 1, ((0, 1), (0, 1), (0, 1))),
    (1, 2, ((1, 2), (1, 2), (1, 2))),
])
def test_conv3d_im2col_matches_xla(stride, dilation, pad):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 6, 6, 5), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 3, 5, 7), jnp.float32)
    got = conv3d_im2col(x, w, (stride,) * 3, pad, (dilation,) * 3)
    want = _ref_conv(x, w, (stride,) * 3, pad, (dilation,) * 3)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("stride,dilation,pad,d_slab", [
    (1, 1, ((1, 1), (1, 1), (1, 1)), 3),
    (2, 1, ((0, 1), (0, 1), (0, 1)), 2),
    (1, 2, ((1, 2), (1, 2), (1, 2)), 5),
])
def test_conv3d_im2col_slabbed_matches_xla(stride, dilation, pad, d_slab):
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 9, 6, 6, 5), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 3, 5, 7), jnp.float32)
    got = conv3d_im2col(x, w, (stride,) * 3, pad, (dilation,) * 3,
                        d_slab=d_slab)
    want = _ref_conv(x, w, (stride,) * 3, pad, (dilation,) * 3)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_same_pads_matches_xla_same():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 6, 4, 3), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 3, 3, 4), jnp.float32)
    for s in (1, 2):
        pad = same_pads(x.shape[1:4], (3, 3, 3), (s,) * 3)
        got = conv3d_im2col(x, w, (s,) * 3, pad)
        want = jax.lax.conv_general_dilated(
            x, w, (s,) * 3, "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-4)


def test_costregnet_impl_interchangeable():
    from tdvnet.models.mvsnet import CostRegNet

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 16, 8, 8, 8), jnp.float32)
    net_x = CostRegNet(base=8, impl="xla")
    net_i = CostRegNet(base=8, impl="im2col")
    vs = net_x.init(jax.random.PRNGKey(0), x, False)
    vs_i = net_i.init(jax.random.PRNGKey(0), x, False)
    # identical param trees => checkpoint interchangeable
    assert jax.tree_util.tree_structure(vs) \
        == jax.tree_util.tree_structure(vs_i)
    ya = net_x.apply(vs, x, False)
    yb = net_i.apply(vs, x, False)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                               rtol=1e-4, atol=1e-4)


def test_scene_unet_impl_interchangeable():
    from tdvnet.models.scene_unet import SceneUNet

    rng = np.random.RandomState(3)
    grid = jnp.asarray(rng.randn(1, 8, 8, 8, 16), jnp.float32)
    mask = jnp.asarray(rng.rand(1, 8, 8, 8, 1) < 0.3, jnp.float32)
    net_x = SceneUNet((16, 24, 24), (4, 4, 4), (1, 1, 1), impl="xla")
    net_i = SceneUNet((16, 24, 24), (4, 4, 4), (1, 1, 1), impl="im2col")
    vs = net_x.init(jax.random.PRNGKey(0), grid, mask)
    vs_i = net_i.init(jax.random.PRNGKey(0), grid, mask)
    assert jax.tree_util.tree_structure(vs) \
        == jax.tree_util.tree_structure(vs_i)
    outs_a = net_x.apply(vs, grid, mask)
    outs_b = net_i.apply(vs, grid, mask)
    for a, b in zip(outs_a, outs_b):
        np.testing.assert_allclose(np.asarray(a["grid"]),
                                   np.asarray(b["grid"]),
                                   rtol=1e-4, atol=1e-4)
