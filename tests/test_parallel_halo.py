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


def test_sharded_scene_unet_matches_unsharded():
    """Full SceneUNet with x-sharded grid + halo exchange == unsharded,
    same params (SURVEY config 5: scene volume blocks + halo exchange)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding
    from tdvnet.models.scene_unet import SceneUNet

    n_dev = 4
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("space",))
    rng = np.random.default_rng(1)
    B_, gx, gy, gz, C = 1, 32, 8, 8, 8
    grid = jnp.asarray(rng.normal(size=(B_, gx, gy, gz, C)).astype(np.float32))
    mask = jnp.asarray((rng.uniform(size=(B_, gx, gy, gz, 1)) > 0.6)
                       .astype(np.float32))

    dims, groups, res = (8, 12, 12), (2, 2, 2), (1, 1, 1)
    net = SceneUNet(dims, groups, res)
    vs = net.init(jax.random.PRNGKey(0), grid, mask)
    ref = net.apply(vs, grid, mask)

    net_sh = SceneUNet(dims, groups, res, axis_name="space")

    def local(v, g, m):
        return net_sh.apply(v, g, m)

    gs = jax.device_put(grid, NamedSharding(mesh, P(None, "space")))
    ms = jax.device_put(mask, NamedSharding(mesh, P(None, "space")))
    out = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(None, "space"), P(None, "space")),
        out_specs=[{"grid": P(None, "space"), "mask": P(None, "space"),
                    "stride": P()} for _ in range(3)],
        check_vma=False)(vs, gs, ms)

    for o_ref, o_sh in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o_sh["grid"]),
                                   np.asarray(o_ref["grid"]),
                                   atol=2e-4), o_ref["stride"]


def test_masked_group_norm_multi_scene():
    """B=2 masked GroupNorm == per-scene B=1 results (regression: a
    broadcasting bug made B>=2 produce a shape error / wrong stats)."""
    from tdvnet.models.layers import masked_group_norm

    rng = np.random.default_rng(0)
    B_, g, C, G = 2, 4, 8, 2
    x = jnp.asarray(rng.normal(size=(B_, g, g, g, C)).astype(np.float32))
    m = jnp.asarray((rng.uniform(size=(B_, g, g, g, 1)) > 0.4)
                    .astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.5, 1.5, C).astype(np.float32))
    bias = jnp.asarray(rng.uniform(-0.2, 0.2, C).astype(np.float32))

    full = masked_group_norm(x, m, G, scale, bias)
    for b in range(B_):
        one = masked_group_norm(x[b:b + 1], m[b:b + 1], G, scale, bias)
        np.testing.assert_allclose(np.asarray(full[b]), np.asarray(one[0]),
                                   rtol=1e-5, atol=1e-5)
