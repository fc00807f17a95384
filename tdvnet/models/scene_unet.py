"""Scene-level 3D U-Net over a masked dense voxel grid.

TPU-native replacement for the reference's MinkowskiEngine `SparseUNet`
(`mv3d/subnetworks/scenemodeling.py:147-237`).  The sparse tensor becomes a
dense per-scene cropped grid + occupancy mask:

- a stride-1 Minkowski conv at an active site sums only active neighbors;
  a dense conv over a zero-filled grid computes the same value (bias-free),
  and multiplying the output by the mask removes the dilation at inactive
  sites — exact sparse semantics, pure MXU work;
- stride-2 downsampling: output active set = 2x max-pooled mask;
- GroupNorm statistics run over active voxels only (`MaskedGroupNorm`),
  matching Minkowski GroupNorm over the [N_active, C] feature matrix;
- transpose-conv upsampling writes onto the skip connection's active set.

The densified grid is what the reference's own dense fallback builds per
batch (`mv3d/subnetworks/refinement.py:46-97`); here it IS the
representation, sized by a static `GridConfig` crop.  Returns one pyramid
dict per scale (coarsest first, like `SparseUNet.forward`).

Spatial sharding (SURVEY §5.7, config 5): every layer takes an optional
`axis_name`.  When set — running inside `shard_map` with the grid's x-axis
sharded over that mesh axis — convs exchange 1-voxel halos via `ppermute`
(`tdvnet.parallel.halo`) and GroupNorm psums its statistics, making the
sharded U-Net numerically identical to the unsharded one with the same
params (tests/test_parallel_halo.py).  Requires the local x-extent to stay
even through every stride-2 level.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from tdvnet.models.layers import Im2colConv3d, MaskedGroupNorm, \
    downsample_mask
from tdvnet.ops.conv3d import same_pads


def _halo_x(x, axis_name):
    from tdvnet.parallel.halo import exchange_halo_x

    return exchange_halo_x(x, axis_name, 1)


class MaskedConv3d(nn.Module):
    features: int
    strides: int = 1
    kernel: int = 3
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None
    impl: str = "xla"                # conv lowering: "xla" | "im2col"

    def _conv(self, x, padding):
        k, s = self.kernel, self.strides
        if self.impl == "im2col":
            return Im2colConv3d(self.features, (k, k, k), (s, s, s),
                                padding, use_bias=self.use_bias,
                                dtype=self.dtype, name="Conv_0")(x)
        return nn.Conv(self.features, (k, k, k), strides=(s, s, s),
                       padding=padding, use_bias=self.use_bias,
                       dtype=self.dtype)(x)

    @nn.compact
    def __call__(self, x, mask_out):
        k, s = self.kernel, self.strides
        if self.axis_name is None or k == 1:
            pad = same_pads(x.shape[1:4], (k, k, k), (s, s, s))
            return self._conv(x, pad) * mask_out
        xp = _halo_x(x, self.axis_name)
        if s == 1:
            # SAME(1,1) in x becomes VALID over [halo, x, halo]
            y = self._conv(xp, ((0, 0), (1, 1), (1, 1)))
        else:
            # XLA SAME for stride 2 / kernel 3 / even extents pads (0, 1):
            # windows start at the shard's first cell, so only the RIGHT
            # halo is consumed in x; y/z get the same (0, 1) padding
            y = self._conv(xp[:, 1:], ((0, 0), (0, 1), (0, 1)))
        return y * mask_out


class MaskedUpConv3d(nn.Module):
    """2x transposed conv onto a finer active set."""

    features: int
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None
    impl: str = "xla"

    @nn.compact
    def __call__(self, x, mask_out):
        if self.impl == "im2col":
            conv = Im2colConv3d(self.features, (3, 3, 3), (1, 1, 1),
                                ((1, 2), (1, 2), (1, 2)),
                                input_dilation=(2, 2, 2), use_bias=False,
                                dtype=self.dtype, name="Conv_0")
        else:
            conv = nn.Conv(self.features, (3, 3, 3), strides=(1, 1, 1),
                           input_dilation=(2, 2, 2),
                           padding=((1, 2), (1, 2), (1, 2)),
                           use_bias=False, dtype=self.dtype)
        if self.axis_name is None:
            return conv(x) * mask_out
        # halo-extend the coarse grid, upconv, crop the neighbors' outputs
        xp = _halo_x(x, self.axis_name)
        y = conv(xp)[:, 2:-2]
        return y * mask_out


class SparseResidual3d(nn.Module):
    """conv-gn-relu-conv-gn(+zero-init scale) + skip, masked
    (reference `SparseResidual3d`, `scenemodeling.py:16-44`)."""

    features: int
    num_groups: int
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None
    impl: str = "xla"

    @nn.compact
    def __call__(self, x, mask):
        a, im = self.axis_name, self.impl
        y = MaskedConv3d(self.features, dtype=self.dtype, axis_name=a,
                         impl=im)(x, mask)
        y = MaskedGroupNorm(self.num_groups, self.features, axis_name=a)(
            y, mask)
        y = nn.relu(y) * mask
        y = MaskedConv3d(self.features, dtype=self.dtype, axis_name=a,
                         impl=im)(y, mask)
        y = MaskedGroupNorm(self.num_groups, self.features,
                            zero_init_scale=True, axis_name=a)(y, mask)
        return nn.relu(y + x) * mask


class SceneUNet(nn.Module):
    """3-scale masked dense U-Net (dims/groups/res per reference defaults)."""

    dims: Tuple[int, int, int] = (64, 128, 128)
    n_groups: Tuple[int, int, int] = (4, 8, 8)
    n_res: Tuple[int, int, int] = (1, 2, 3)
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None
    impl: str = "xla"

    @nn.compact
    def __call__(self, grid, mask, axis_name: Optional[str] = None):
        """grid: [B, gx, gy, gz, dims[0]]; mask: [B, gx, gy, gz, 1].

        axis_name: call-time override of the attribute (same param tree
        either way) — lets one bound module run both replicated and
        halo-sharded inside a shard_map (2-D data x space mesh).

        Returns a list of scale dicts coarsest-first:
          {"grid": [B, x, y, z, C], "mask": ..., "stride": int}
        """
        a = axis_name if axis_name is not None else self.axis_name
        L = len(self.dims)
        if a is not None:
            assert grid.shape[1] % (2 ** (L - 1)) == 0, (
                f"spatially-sharded SceneUNet needs the local x-extent "
                f"({grid.shape[1]}) divisible by {2 ** (L - 1)} (stride-2 "
                f"levels); pick grid_size[0] divisible by "
                f"{2 ** (L - 1)} * mesh_size")
        # mask in the compute dtype: a f32 mask would promote every
        # `x * mask` product (i.e. all activations) to f32
        masks = [mask.astype(self.dtype)]
        for _ in range(L - 1):
            masks.append(downsample_mask(masks[-1]))

        # encoder
        x = grid * mask
        skips = []
        for lvl in range(L):
            if lvl > 0:
                x = MaskedConv3d(self.dims[lvl], strides=2, use_bias=True,
                                 dtype=self.dtype, axis_name=a,
                                 impl=self.impl)(x, masks[lvl])
                x = MaskedGroupNorm(self.n_groups[lvl], self.dims[lvl],
                                    axis_name=a)(x, masks[lvl])
                x = nn.relu(x) * masks[lvl]
            for _ in range(self.n_res[lvl]):
                x = SparseResidual3d(self.dims[lvl], self.n_groups[lvl],
                                     self.dtype, axis_name=a,
                                     impl=self.impl)(x, masks[lvl])
            skips.append(x)

        # decoder: coarsest-first output list, like the reference
        out = [{"grid": skips[-1], "mask": masks[-1], "stride": 2 ** (L - 1)}]
        x = skips[-1]
        for lvl in range(L - 2, -1, -1):
            x = MaskedUpConv3d(self.dims[lvl], self.dtype, axis_name=a,
                               impl=self.impl)(x, masks[lvl])
            x = MaskedGroupNorm(self.n_groups[lvl], self.dims[lvl],
                                axis_name=a)(x, masks[lvl])
            x = nn.relu(x) * masks[lvl]
            x = jnp.concatenate([x, skips[lvl]], axis=-1)
            x = MaskedConv3d(self.dims[lvl], kernel=1, use_bias=True,
                             dtype=self.dtype, axis_name=a,
                             impl=self.impl)(x, masks[lvl])
            x = MaskedGroupNorm(self.n_groups[lvl], self.dims[lvl],
                                axis_name=a)(x, masks[lvl])
            x = nn.relu(x) * masks[lvl]
            for _ in range(self.n_res[lvl]):
                x = SparseResidual3d(self.dims[lvl], self.n_groups[lvl],
                                     self.dtype, axis_name=a,
                                     impl=self.impl)(x, masks[lvl])
            out.append({"grid": x, "mask": masks[lvl], "stride": 2 ** lvl})
        return out
