"""Per-voxel PointNet encoder over the compact anchor set.

Counterpart of the reference `PointNet`
(`mv3d/subnetworks/scenemodeling.py:116-144`): 4 linear blocks, each
followed by a segment-max pool over the points of each voxel and a
concat-back.  Points route to their anchor via `point2anchor`; invalid
points live in the dump slot (index `n_anchors`) which is dropped from the
output.  All matmuls are [P, C] x [C, C'] MXU GEMMs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

NEG = -1e30


def _segmax(x, seg, n_seg, sorted_ids=False):
    out = jax.ops.segment_max(x, seg, num_segments=n_seg,
                              indices_are_sorted=sorted_ids)
    return jnp.where(out <= NEG / 2, 0.0, out)


class PointNet(nn.Module):
    hidden_dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, point2anchor, point_valid, n_anchors: int,
                 indices_are_sorted: bool = False):
        """x: [P, in_dim]; point2anchor: [P] in [0, n_anchors] (n_anchors =
        dump slot); returns anchor features [n_anchors, out_dim].

        indices_are_sorted=True (stage-C fast path): the caller permuted
        points into anchor-sorted order (`VoxelGrid.order`/`p2a_sorted`),
        so every segment-max pool and pooled-gather here runs over
        NONDECREASING ids — XLA skips the generic scatter lowering.  The
        result is permutation-invariant (max pools), so the two paths are
        numerically identical per anchor."""
        h = self.hidden_dim
        dense = lambda f, name: nn.Dense(f, dtype=self.dtype, name=name)
        n_seg = n_anchors + 1
        srt = indices_are_sorted
        vmask = point_valid[:, None].astype(x.dtype)

        y = dense(h, "fc_pos")(x)
        y = dense(h, "fc1")(nn.relu(y))
        for i, name in enumerate(["fc2", "fc3", "fc4"]):
            pooled = _segmax(jnp.where(vmask > 0, y, NEG), point2anchor,
                             n_seg, srt)
            back = pooled.at[point2anchor].get(indices_are_sorted=srt)
            y = jnp.concatenate([y, back], axis=-1)
            y = dense(h, name)(nn.relu(y))
        pooled = _segmax(jnp.where(vmask > 0, y, NEG), point2anchor, n_seg,
                         srt)
        out = dense(self.out_dim, "fc_out")(nn.relu(pooled))
        return out[:n_anchors]
