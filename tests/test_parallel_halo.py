"""Halo-exchange sharded conv == unsharded conv (bitwise semantics)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def test_halo_conv_matches_dense():
    from tdvnet.parallel.halo import halo_masked_conv3d

    n_dev = 4
    devs = jax.devices()[:n_dev]
    mesh = Mesh(np.asarray(devs), ("space",))
    rng = np.random.default_rng(0)
    B_, gx, gy, gz, Ci, Co = 1, 16, 8, 8, 6, 5
    x = rng.normal(size=(B_, gx, gy, gz, Ci)).astype(np.float32)
    m = (rng.uniform(size=(B_, gx, gy, gz, 1)) > 0.5).astype(np.float32)
    w = rng.normal(size=(3, 3, 3, Ci, Co)).astype(np.float32) * 0.1

    ref = jax.lax.conv_general_dilated(
        jnp.array(x), jnp.array(w), (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) * m

    xs = jax.device_put(jnp.array(x), NamedSharding(mesh, P(None, "space")))
    ms = jax.device_put(jnp.array(m), NamedSharding(mesh, P(None, "space")))
    out = halo_masked_conv3d(xs, ms, jnp.array(w), mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_halo_exchange_contents():
    from tdvnet.parallel.halo import exchange_halo_x

    n_dev = 4
    devs = jax.devices()[:n_dev]
    mesh = Mesh(np.asarray(devs), ("space",))
    gx = 8
    x = jnp.arange(gx, dtype=jnp.float32).reshape(1, gx, 1, 1, 1)
    x = jnp.broadcast_to(x, (1, gx, 2, 2, 3))
    xs = jax.device_put(x, NamedSharding(mesh, P(None, "space")))

    def local(xb):
        return exchange_halo_x(xb, "space", 1)

    out = jax.shard_map(local, mesh=mesh, in_specs=(P(None, "space"),),
                        out_specs=P(None, "space"))(xs)
    # each local block grows 2 slabs: global shape becomes n_dev*(2+halo2)
    o = np.asarray(out).reshape(n_dev, 4, 2, 2, 3)
    # shard 0: left halo zero, then [0,1], then right halo = 2
    np.testing.assert_allclose(o[0, :, 0, 0, 0], [0, 0, 1, 2])
    np.testing.assert_allclose(o[1, :, 0, 0, 0], [1, 2, 3, 4])
    np.testing.assert_allclose(o[3, :, 0, 0, 0], [5, 6, 7, 0])
