"""Pallas kernel parity vs the XLA reference paths (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdvnet.kernels import depthops_pallas as KP


def test_softargmax_depth_matches_xla(rng):
    R, D, h, w = 2, 16, 8, 16
    cost = jnp.asarray(rng.normal(size=(R, D, h, w)).astype(np.float32))
    dvals = jnp.linspace(0.5, 5.0, D)
    out = KP.softargmax_depth(cost, dvals, interpret=True)

    prob = jax.nn.softmax(-cost, axis=1)
    ref = jnp.sum(prob * dvals[None, :, None, None], axis=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_propagation_blend_matches_xla(rng):
    from tdvnet.models.upsampling import unfold3x3

    N, H, W = 2, 8, 16
    logits = jnp.asarray(rng.normal(size=(N, H, W, 9)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(1, 4, size=(N, H, W)).astype(np.float32))
    out = KP.propagation_blend(logits, depth, interpret=True)

    wgt = jax.nn.softmax(logits, axis=-1)
    ref = jnp.sum(wgt * unfold3x3(depth), axis=-1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
