"""Spatially-sharded 3D convolution with halo exchange over ICI.

The scene feature volume can exceed one chip at whole-scene eval scale
(SURVEY §5.7): shard the grid's x-axis across the mesh's 'space' axis and
exchange 1-voxel halos with `ppermute` (neighbor exchange rides ICI like a
ring) so 3^3 convs see across block boundaries.  Edge devices receive zeros
(grid boundary).  This is the context-parallel analog for the volumetric
model — brand-new design, no reference counterpart (the reference is
single-GPU Minkowski).
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def exchange_halo_x(x: jnp.ndarray, axis_name: str, halo: int = 1) -> jnp.ndarray:
    """Pad a local block [B, gx_local, gy, gz, C] with neighbors' boundary
    slabs along x (zeros at mesh edges).  Must run inside shard_map."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    # send my right edge to my right neighbor => it becomes their left halo
    right_perm = [(i, (i + 1) % n) for i in range(n)]
    left_perm = [(i, (i - 1) % n) for i in range(n)]
    from_left = jax.lax.ppermute(x[:, -halo:], axis_name, right_perm)
    from_right = jax.lax.ppermute(x[:, :halo], axis_name, left_perm)
    from_left = jnp.where(idx == 0, 0.0, from_left)
    from_right = jnp.where(idx == n - 1, 0.0, from_right)
    return jnp.concatenate([from_left, x, from_right], axis=1)


def _conv3d(x, w, x_padding):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1, 1),
        padding=(x_padding, (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def halo_masked_conv3d(x: jnp.ndarray, mask: jnp.ndarray, w: jnp.ndarray,
                       mesh: Mesh, axis_name: str = "space") -> jnp.ndarray:
    """Masked 3x3x3 conv over an x-sharded grid, numerically identical to the
    unsharded `MaskedConv3d` (tests/test_parallel_halo.py proves it).

    x: [B, gx, gy, gz, Cin] sharded on gx; w: [3, 3, 3, Cin, Cout].
    """

    def local(xb, mb, wb):
        xp = exchange_halo_x(xb, axis_name, 1)
        y = _conv3d(xp, wb, x_padding=(0, 0))
        return y * mb

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis_name), P(None, axis_name), P()),
        out_specs=P(None, axis_name))(x, mask, w)


def sharded_grid_specs(mesh: Mesh, axis_name: str = "space"):
    """NamedShardings for (grid, mask) with the x-axis sharded."""
    return (NamedSharding(mesh, P(None, axis_name)),
            NamedSharding(mesh, P(None, axis_name)))
