"""Masked and segment reductions.

TPU-native replacement for torch_scatter (`scatter(mean/max/min)` used at
`mv3d/subnetworks/mvsnet.py:214-216`, `mv3d/subnetworks/scenemodeling.py:129-141`,
`mv3d/utils.py:50,61`).  Two flavors:

- axis reductions over a masked fixed-size axis (our [R, S] source tables
  replace the reference's ref/src edge lists, so the cost-volume "scatter
  mean" becomes a plain masked mean — no scatter at all);
- `segment_*` wrappers with static segment counts for point→voxel pooling.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis: int, eps: float = 1e-8):
    """Mean of x over `axis` counting only entries where mask is True.

    mask broadcasts against x (mask has the reduced axis; trailing feature
    axes of x may be absent from mask).
    """
    m = jnp.broadcast_to(jnp.expand_dims(mask, tuple(range(mask.ndim, x.ndim))),
                         x.shape).astype(x.dtype)
    cnt = jnp.sum(m, axis=axis)
    return jnp.sum(x * m, axis=axis) / jnp.maximum(cnt, eps)


def masked_mean_var(x: jnp.ndarray, mask: jnp.ndarray, axis: int,
                    eps: float = 1e-8):
    """Masked mean and (biased) variance over `axis`, fp32 accumulation.

    Reproduces the reference's E[x^2] - E[x]^2 variance aggregation
    (`mv3d/subnetworks/mvsnet.py:213-216`) but accumulates in fp32 — in bf16
    the cancellation is catastrophic (SURVEY §7.3.6).
    """
    xf = x.astype(jnp.float32)
    mean = masked_mean(xf, mask, axis, eps)
    mean_sq = masked_mean(xf * xf, mask, axis, eps)
    return mean, mean_sq - mean * mean


def segment_sum(x, seg_ids, num_segments):
    return jax.ops.segment_sum(x, seg_ids, num_segments=num_segments)


def segment_max(x, seg_ids, num_segments, fill=0.0):
    """Segment max; empty segments get `fill` instead of -inf."""
    out = jax.ops.segment_max(x, seg_ids, num_segments=num_segments)
    return jnp.where(jnp.isfinite(out), out, fill)


def segment_min(x, seg_ids, num_segments, fill=0.0):
    out = jax.ops.segment_min(x, seg_ids, num_segments=num_segments)
    return jnp.where(jnp.isfinite(out), out, fill)


def segment_mean(x, seg_ids, num_segments, eps: float = 1e-8):
    s = jax.ops.segment_sum(x, seg_ids, num_segments=num_segments)
    cnt = jax.ops.segment_sum(jnp.ones(x.shape[:1], x.dtype), seg_ids,
                              num_segments=num_segments)
    cnt = cnt.reshape(cnt.shape + (1,) * (s.ndim - 1))
    return s / jnp.maximum(cnt, eps)
