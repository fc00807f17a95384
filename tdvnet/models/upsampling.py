"""Guided depth upsampling via learned 3x3 neighbor-weight softmax.

Counterpart of the reference `PropagationNet`
(`mv3d/subnetworks/upsampling.py:14-36`): 4 convs over [guide, depth] → 9
logits → softmax → weighted sum of the replicate-padded 3x3 depth
neighborhood.  The unfold becomes 9 static shifted slices (pure VPU work
XLA fuses with the weighting).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from tdvnet.models.layers import ConvBnRelu


def unfold3x3(depth: jnp.ndarray) -> jnp.ndarray:
    """depth [N, H, W] → [N, H, W, 9] replicate-padded 3x3 neighborhoods.

    Channel order matches torch nn.Unfold row-major (dy, dx) so learned
    weights are transferable.
    """
    p = jnp.pad(depth, ((0, 0), (1, 1), (1, 1)), mode="edge")
    H, W = depth.shape[1:]
    views = [p[:, dy:dy + H, dx:dx + W]
             for dy in range(3) for dx in range(3)]
    return jnp.stack(views, axis=-1)


class PropagationNet(nn.Module):
    hidden: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, guide: jnp.ndarray, depth: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        """guide: [N, H, W, C]; depth: [N, H, W] → refined depth [N, H, W]."""
        x = jnp.concatenate([guide.astype(self.dtype),
                             depth[..., None].astype(self.dtype)], axis=-1)
        x = ConvBnRelu(self.hidden, dtype=self.dtype)(x, train)
        x = ConvBnRelu(self.hidden, dtype=self.dtype)(x, train)
        x = ConvBnRelu(self.hidden, dtype=self.dtype)(x, train)
        x = ConvBnRelu(9, dtype=self.dtype)(x, train)
        w = nn.softmax(x.astype(jnp.float32), axis=-1)
        return jnp.sum(w * unfold3x3(depth), axis=-1)
