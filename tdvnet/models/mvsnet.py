"""2D stage: features → plane-sweep variance cost volume → 3D regularization
→ soft-argmax initial depth.

TPU-native counterpart of the reference MVSNet subnetwork
(`mv3d/subnetworks/mvsnet.py:133-229`): the warping/variance path is the
fused op in `tdvnet.ops.costvolume` (no edge gather/scatter), and the
`CostRegNet` 3D U-Net runs in NDHWC so every conv hits the MXU.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from tdvnet.models.backbone import MnasMulti
from tdvnet.models.fpn import FPN
from tdvnet.models.layers import ConvBnRelu, ConvTransposeUp3d, Im2colConv3d
from tdvnet.ops import costvolume


class CostRegNet(nn.Module):
    """3-level 3D U-Net cost regularizer (reference `mvsnet.py:133-163`)."""

    base: int = 8
    dtype: jnp.dtype = jnp.float32
    impl: str = "xla"                # conv lowering: "xla" | "im2col"

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, d, im = self.base, self.dtype, self.impl
        c3 = lambda f, s: ConvBnRelu(f, (3, 3, 3), (s, s, s), dtype=d,
                                     impl=im)
        conv0 = c3(b, 1)(x, train)
        conv2 = c3(2 * b, 1)(c3(2 * b, 2)(conv0, train), train)
        conv4 = c3(4 * b, 1)(c3(4 * b, 2)(conv2, train), train)
        y = c3(8 * b, 1)(c3(8 * b, 2)(conv4, train), train)
        y = conv4 + ConvTransposeUp3d(4 * b, d, impl=im)(y, train)
        y = conv2 + ConvTransposeUp3d(2 * b, d, impl=im)(y, train)
        y = conv0 + ConvTransposeUp3d(b, d, impl=im)(y, train)
        if im == "im2col":
            return Im2colConv3d(1, (3, 3, 3), (1, 1, 1),
                                ((1, 1), (1, 1), (1, 1)), use_bias=True,
                                dtype=d, name="Conv_0")(y)
        return nn.Conv(1, (3, 3, 3), padding="SAME", dtype=d)(y)


class MVSNet(nn.Module):
    """Initial depth predictor.

    `__call__(images, ...)` mirrors `MVSNet.forward` (`mvsnet.py:176-229`)
    but takes the padded batch's camera/table arrays explicitly.
    """

    feat_dim: int = 32
    img_size: Tuple[int, int] = (256, 320)
    cost_base: int = 8
    dtype: jnp.dtype = jnp.float32
    warp_mode: str = "auto"          # see plane_sweep_cost_volume
    warp_alpha_max: float = 0.25
    conv3d_impl: str = "xla"         # CostRegNet lowering: "xla" | "im2col"

    def setup(self):
        self.backbone = MnasMulti(dtype=self.dtype)
        self.fpn = FPN(self.feat_dim, dtype=self.dtype)
        self.cost_reg = CostRegNet(self.cost_base, dtype=self.dtype,
                                   impl=self.conv3d_impl)

    def extract_features(self, images, train: bool = False):
        """images [N, H, W, 3] → (half, quarter, eighth) FPN features."""
        c = self.backbone(images, train)
        p = self.fpn(c)
        return p[0], p[1], p[2]

    def predict_depth(self, feats_quarter, rotmats, tvecs, K, ref_idx,
                      src_idx, src_mask, depth_start, depth_interval,
                      n_planes, depth_size, train: bool = False):
        """Cost volume → regularization → soft-argmax expectation.

        Returns (depth [R, h, w], prob_volume [R, D, h, w]).
        """
        var = costvolume.plane_sweep_cost_volume(
            feats_quarter, rotmats, tvecs, K, ref_idx, src_idx, src_mask,
            depth_start, depth_interval, n_planes, self.img_size, depth_size,
            mode=self.warp_mode, alpha_max=self.warp_alpha_max,
            weights_dtype=(jnp.bfloat16 if self.dtype == jnp.bfloat16
                           else jnp.float32))
        cost = self.cost_reg(var.astype(self.dtype), train)[..., 0]  # [R,D,h,w]
        depth_end = depth_start + depth_interval * (n_planes - 1)
        depth_vals = jnp.linspace(depth_start, depth_end, n_planes,
                                  dtype=jnp.float32)
        prob = nn.softmax(-cost.astype(jnp.float32), axis=1)
        depth = jnp.sum(prob * depth_vals[None, :, None, None], axis=1)
        return depth, prob

    def __call__(self, images, rotmats, tvecs, K, ref_idx, src_idx, src_mask,
                 depth_start, depth_interval, n_planes, depth_size,
                 train: bool = False):
        half, quarter, eighth = self.extract_features(images, train)
        depth, prob = self.predict_depth(quarter, rotmats, tvecs, K, ref_idx,
                                         src_idx, src_mask, depth_start,
                                         depth_interval, n_planes, depth_size,
                                         train)
        return depth, prob, half, quarter, eighth
