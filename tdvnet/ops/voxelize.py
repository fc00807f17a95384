"""Static-capacity voxelization of a batched point cloud.

TPU-native replacement for the reference's `voxelize`
(`mv3d/utils.py:38-64`, which uses torch_geometric `voxel_grid` +
`torch.unique` — both dynamic-shape CUDA ops).  Here the active voxel set is
computed with a sort + compacted-unique at a fixed `max_anchors` capacity:

  1. quantize points into a fixed per-scene grid anchored at the masked
     bbox-min (the reference's re-based `idx3d`, `utils.py:60-62`);
  2. key = scene_id * n_cells + flat_cell_idx; invalid/out-of-grid points get
     a sentinel key that sorts last;
  3. argsort keys, mark first-occurrences, prefix-sum → compact anchor ids;
  4. overflow and invalid points land in a dump slot (index `max_anchors`)
     which every consumer masks out.

Everything is static-shape; the only data-dependent quantity is the *content*
of the masks.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class VoxelGrid(NamedTuple):
    """Compact active-voxel (anchor) set plus the dense-grid geometry."""

    point2anchor: jnp.ndarray   # [P] int32 in [0, max_anchors]; max_anchors = dump
    anchor_idx3: jnp.ndarray    # [A, 3] int32 cell coords (garbage where invalid)
    anchor_scene: jnp.ndarray   # [A] int32
    anchor_center: jnp.ndarray  # [A, 3] world coords of voxel centers
    anchor_valid: jnp.ndarray   # [A] bool
    origins: jnp.ndarray        # [n_scenes, 3] grid origin (bbox min) per scene
    point_valid: jnp.ndarray    # [P] bool — in-grid and input-valid
    # sorted-order view (round 5, stage-C scatter path): `order` permutes
    # points into anchor-sorted order and `p2a_sorted = point2anchor[order]`
    # is NONDECREASING — segment ops over it can declare
    # indices_are_sorted=True, which XLA lowers without the generic
    # scatter path (measured in tools/profile_initial_depth.py --c0)
    order: jnp.ndarray          # [P] int32 permutation (anchor-sorted)
    p2a_sorted: jnp.ndarray     # [P] int32, nondecreasing
    # capacity-overflow observability (the reference never drops geometry —
    # `mv3d/utils.py:38-64` is fully dynamic; these counters make our static
    # caps visible instead of silent):
    n_out_of_grid: jnp.ndarray  # [] int32: input-valid points outside the grid
    n_overflow: jnp.ndarray     # [] int32: points dropped by anchor capacity


def scene_origins(pts: jnp.ndarray, pt_scene: jnp.ndarray,
                  pt_valid: jnp.ndarray, n_scenes: int) -> jnp.ndarray:
    """Masked per-scene bbox minimum, shape [n_scenes, 3]."""
    big = jnp.float32(1e9)
    masked = jnp.where(pt_valid[:, None], pts, big)
    mins = jax.ops.segment_min(masked, pt_scene, num_segments=n_scenes)
    return jnp.where(jnp.isfinite(mins) & (mins < big), mins, 0.0)


def voxelize(pts: jnp.ndarray, pt_scene: jnp.ndarray, pt_valid: jnp.ndarray,
             edge_len: float, grid_size: Tuple[int, int, int],
             max_anchors: int, n_scenes: int,
             origins: jnp.ndarray | None = None) -> VoxelGrid:
    """Quantize points to voxels and compact the active set.

    pts: [P, 3] world points; pt_scene: [P] scene ids; pt_valid: [P].
    Returns a VoxelGrid with capacity `max_anchors` (+1 dump slot implicit).
    """
    P = pts.shape[0]
    gx, gy, gz = grid_size
    n_cells = gx * gy * gz
    if origins is None:
        origins = scene_origins(pts, pt_scene, pt_valid, n_scenes)

    rel = (pts - origins[pt_scene]) / edge_len
    idx3 = jnp.floor(rel).astype(jnp.int32)
    in_grid = ((idx3[:, 0] >= 0) & (idx3[:, 0] < gx)
               & (idx3[:, 1] >= 0) & (idx3[:, 1] < gy)
               & (idx3[:, 2] >= 0) & (idx3[:, 2] < gz))
    valid = in_grid & pt_valid

    flat = (idx3[:, 0] * gy + idx3[:, 1]) * gz + idx3[:, 2]
    sentinel = jnp.int32(n_scenes * n_cells)  # sorts after every real key
    key = jnp.where(valid, pt_scene * n_cells + flat, sentinel)

    order = jnp.argsort(key)
    sk = key[order]
    is_real = sk != sentinel
    first = jnp.concatenate([is_real[:1],
                             (sk[1:] != sk[:-1]) & is_real[1:]])
    aid_sorted = jnp.cumsum(first.astype(jnp.int32)) - 1
    # invalid → dump; overflow beyond capacity → dump
    aid_sorted = jnp.where(is_real & (aid_sorted < max_anchors), aid_sorted,
                           max_anchors)
    point2anchor = jnp.zeros((P,), jnp.int32).at[order].set(
        aid_sorted, unique_indices=True)

    # anchor attributes: min over members (all equal) with dump slot dropped
    anchor_key = jax.ops.segment_min(sk, aid_sorted,
                                     num_segments=max_anchors + 1,
                                     indices_are_sorted=True)[:max_anchors]
    anchor_valid = (anchor_key < sentinel) & (anchor_key >= 0)
    anchor_key_safe = jnp.where(anchor_valid, anchor_key, 0)
    anchor_scene = (anchor_key_safe // n_cells).astype(jnp.int32)
    aflat = anchor_key_safe % n_cells
    ax = aflat // (gy * gz)
    ay = (aflat // gz) % gy
    az = aflat % gz
    anchor_idx3 = jnp.stack([ax, ay, az], axis=-1).astype(jnp.int32)
    anchor_center = (origins[anchor_scene]
                     + (anchor_idx3.astype(jnp.float32) + 0.5) * edge_len)

    n_out_of_grid = jnp.sum((pt_valid & ~in_grid).astype(jnp.int32))
    n_overflow = jnp.sum((is_real & (aid_sorted >= max_anchors))
                         .astype(jnp.int32))
    return VoxelGrid(point2anchor=point2anchor, anchor_idx3=anchor_idx3,
                     anchor_scene=anchor_scene, anchor_center=anchor_center,
                     anchor_valid=anchor_valid, origins=origins,
                     point_valid=valid, n_out_of_grid=n_out_of_grid,
                     n_overflow=n_overflow, order=order.astype(jnp.int32),
                     p2a_sorted=aid_sorted)


def scatter_anchors_to_dense(anchor_feats: jnp.ndarray, vg: VoxelGrid,
                             grid_size: Tuple[int, int, int],
                             n_scenes: int):
    """Scatter compact anchor features into a dense [B, gx, gy, gz, C] grid.

    Returns (grid, occupancy [B, gx, gy, gz, 1]).  Invalid anchors go to a
    dump row that is sliced off.
    """
    gx, gy, gz = grid_size
    n_cells = gx * gy * gz
    C = anchor_feats.shape[-1]
    flat = ((vg.anchor_idx3[:, 0] * gy + vg.anchor_idx3[:, 1]) * gz
            + vg.anchor_idx3[:, 2])
    # seg is NONDECREASING: compact anchor ids were assigned in sorted-key
    # order, so anchor_scene * n_cells + flat == anchor_key (ascending over
    # valid anchors) and every invalid anchor maps to the trailing dump row
    seg = jnp.where(vg.anchor_valid, vg.anchor_scene * n_cells + flat,
                    n_scenes * n_cells)
    feats = jnp.where(vg.anchor_valid[:, None], anchor_feats, 0.0)
    dense = jax.ops.segment_sum(feats, seg,
                                num_segments=n_scenes * n_cells + 1,
                                indices_are_sorted=True)
    occ = jax.ops.segment_sum(vg.anchor_valid.astype(anchor_feats.dtype), seg,
                              num_segments=n_scenes * n_cells + 1,
                              indices_are_sorted=True)
    dense = dense[:-1].reshape(n_scenes, gx, gy, gz, C)
    occ = jnp.minimum(occ[:-1], 1.0).reshape(n_scenes, gx, gy, gz, 1)
    return dense, occ
