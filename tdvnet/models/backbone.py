"""MNASNet-1.0-contract image backbone (Flax, NHWC).

The reference uses a pretrained torchvision MnasNet1.0 split into 5 stages
with output channels (16, 24, 40, 96, 320) at strides (2, 4, 8, 16, 32)
(`mv3d/subnetworks/mvsnet.py:55-73`).  This is a from-scratch Flax
implementation of the same (public) MNASNet architecture honoring that exact
5-scale contract, so the FPN and everything downstream see identical shapes.
`tools/convert_torchvision_mnasnet.py` can load torchvision weights into it
when a checkpoint file is available (zero-egress images train from scratch).
"""
from __future__ import annotations


import jax.numpy as jnp
from flax import linen as nn


class _MBConv(nn.Module):
    """Inverted-residual block: expand 1x1 → depthwise kxk → project 1x1."""

    features: int
    expansion: int
    stride: int
    kernel: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        mid = in_ch * self.expansion
        bn = lambda: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                  epsilon=1e-5, dtype=self.dtype)
        y = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = nn.relu(bn()(y))
        # torch pads k//2 on BOTH sides even for stride 2 (XLA "SAME" pads
        # (0, 1) there) — explicit padding keeps pretrained torchvision
        # weights alignment-exact (tests/test_backbone_convert.py)
        p = self.kernel // 2
        y = nn.Conv(mid, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)),
                    feature_group_count=mid, use_bias=False,
                    dtype=self.dtype)(y)
        y = nn.relu(bn()(y))
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = bn()(y)
        if self.stride == 1 and in_ch == self.features:
            y = y + x
        return y


class _Stack(nn.Module):
    features: int
    expansion: int
    stride: int
    kernel: int
    n_blocks: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.n_blocks):
            x = _MBConv(self.features, self.expansion,
                        self.stride if i == 0 else 1, self.kernel,
                        self.dtype)(x, train)
        return x


class MnasMulti(nn.Module):
    """5-scale feature extractor with the MnasNet1.0 channel contract.

    Returns (c1 @ s2 / 16ch, c2 @ s4 / 24ch, c3 @ s8 / 40ch,
             c4 @ s16 / 96ch, c5 @ s32 / 320ch).
    """

    dtype: jnp.dtype = jnp.float32
    width: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        bn = lambda: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                  epsilon=1e-5, dtype=self.dtype)
        # stem: conv s2 → depthwise → project to 16 (explicit (1, 1)
        # padding = torch alignment; see _MBConv)
        y = nn.Conv(32, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=d)(x)
        y = nn.relu(bn()(y))
        y = nn.Conv(32, (3, 3), padding="SAME", feature_group_count=32,
                    use_bias=False, dtype=d)(y)
        y = nn.relu(bn()(y))
        y = nn.Conv(16, (1, 1), use_bias=False, dtype=d)(y)
        c1 = bn()(y)                                     # stride 2, 16ch

        c2 = _Stack(24, 3, 2, 3, 3, d)(c1, train)        # stride 4, 24ch
        c3 = _Stack(40, 3, 2, 5, 3, d)(c2, train)        # stride 8, 40ch
        y = _Stack(80, 6, 2, 5, 3, d)(c3, train)
        c4 = _Stack(96, 6, 1, 3, 2, d)(y, train)         # stride 16, 96ch
        y = _Stack(192, 6, 2, 5, 4, d)(c4, train)
        c5 = _Stack(320, 6, 1, 3, 1, d)(y, train)        # stride 32, 320ch
        return c1, c2, c3, c4, c5
