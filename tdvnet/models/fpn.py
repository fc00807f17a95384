"""Feature pyramid over the 5 backbone scales (torchvision-FPN semantics).

Counterpart of the reference's `FeatureShrinker`
(`mv3d/subnetworks/mvsnet.py:83-105`): lateral 1x1 convs to `feat_dim`,
top-down nearest-neighbor upsample + add, then a 3x3 smoothing conv per
level.  Returns features at strides 2, 4, 8, 16, 32.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from tdvnet.ops.sampling import resize_nearest_nhwc


class FPN(nn.Module):
    feat_dim: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        laterals = [
            nn.Conv(self.feat_dim, (1, 1), use_bias=True, dtype=self.dtype,
                    name=f"lateral{i}")(f)
            for i, f in enumerate(feats)
        ]
        # top-down pathway (coarsest → finest)
        merged = [None] * len(laterals)
        merged[-1] = laterals[-1]
        for i in range(len(laterals) - 2, -1, -1):
            up = resize_nearest_nhwc(merged[i + 1], laterals[i].shape[1:3])
            merged[i] = laterals[i] + up
        outs = [
            nn.Conv(self.feat_dim, (3, 3), padding="SAME", use_bias=True,
                    dtype=self.dtype, name=f"smooth{i}")(m)
            for i, m in enumerate(merged)
        ]
        return tuple(outs)
