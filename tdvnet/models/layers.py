"""Shared conv blocks (channel-last NHWC / NDHWC, MXU-friendly).

Counterparts of the reference's `conv_bn_relu` / `ConvBnRelu3d` /
`DeconvBnRelu3d` helpers (`mv3d/subnetworks/mvsnet.py:10-36`) plus the masked
variants that give dense 3D convs the semantics of Minkowski sparse convs
(see `scene_unet.py`).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from tdvnet.ops.conv3d import conv3d_im2col


class Im2colConv3d(nn.Module):
    """`nn.Conv`-compatible 3D conv via the im2col/matmul lowering.

    Same param tree as `nn.Conv` (kernel [kd,kh,kw,Cin,Cout], optional
    bias) so it is checkpoint-interchangeable when given ``name="Conv_0"``
    — see `tdvnet/ops/conv3d.py` for why this exists.
    """

    features: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    padding: Tuple[Tuple[int, int], ...] = ((1, 1), (1, 1), (1, 1))
    input_dilation: Tuple[int, int, int] = (1, 1, 1)
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (*self.kernel_size, cin, self.features))
        y = conv3d_im2col(x.astype(self.dtype), kernel.astype(self.dtype),
                          self.strides, self.padding, self.input_dilation)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class ConvBnRelu(nn.Module):
    """Conv (no bias) + BatchNorm + ReLU for 2D or 3D channel-last inputs."""

    features: int
    kernel_size: Tuple[int, ...] = (3, 3)
    strides: Tuple[int, ...] = (1, 1)
    dtype: jnp.dtype = jnp.float32
    impl: str = "xla"                # "xla" | "im2col" (3D only)

    @nn.compact
    def __call__(self, x, train: bool = False):
        # torch pads k//2 on BOTH sides even at stride 2; XLA "SAME" pads
        # (0, 1) there on even inputs — explicit padding keeps converted
        # reference weights alignment-exact (identical to SAME at stride 1)
        pad = tuple((k // 2, k // 2) for k in self.kernel_size)
        if self.impl == "im2col" and len(self.kernel_size) == 3:
            x = Im2colConv3d(self.features, self.kernel_size, self.strides,
                             pad, use_bias=False, dtype=self.dtype,
                             name="Conv_0")(x)
        else:
            x = nn.Conv(self.features, self.kernel_size, self.strides,
                        padding=pad, use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        return nn.relu(x)


class ConvTransposeUp3d(nn.Module):
    """Stride-2 3D transposed conv ×2 upsampling + BN + ReLU.

    Implemented as input-dilated conv (lhs_dilation=2, padding (1,2)) which
    yields exactly 2x each spatial dim for kernel 3 — the shape contract of
    the reference's `DeconvBnRelu3d(..., output_padding=1)`
    (`mv3d/subnetworks/mvsnet.py:28-36`).
    """

    features: int
    dtype: jnp.dtype = jnp.float32
    impl: str = "xla"

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.impl == "im2col":
            x = Im2colConv3d(self.features, (3, 3, 3), (1, 1, 1),
                             ((1, 2), (1, 2), (1, 2)),
                             input_dilation=(2, 2, 2), use_bias=False,
                             dtype=self.dtype, name="Conv_0")(x)
        else:
            x = nn.Conv(self.features, (3, 3, 3), strides=(1, 1, 1),
                        input_dilation=(2, 2, 2),
                        padding=((1, 2), (1, 2), (1, 2)),
                        use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        return nn.relu(x)


def masked_group_norm(x: jnp.ndarray, mask: jnp.ndarray, num_groups: int,
                      scale: jnp.ndarray, bias: jnp.ndarray,
                      eps: float = 1e-5,
                      axis_name: str | None = None) -> jnp.ndarray:
    """GroupNorm over *active* voxels only.

    x: [B, gx, gy, gz, C]; mask: [B, gx, gy, gz, 1] in {0,1}.
    Equivalent to torch GroupNorm applied to the [N_active, C] feature matrix
    of a sparse tensor (reference `MinkowskiGroupNorm`,
    `mv3d/subnetworks/scenemodeling.py:78-113`): statistics are computed per
    (batch, group) over active sites and the group's channels.

    axis_name: when running inside shard_map over a spatially-sharded grid,
    statistics psum over that axis so the normalization is global.
    """
    B, gx, gy, gz, C = x.shape
    G = num_groups
    xg = x.reshape(B, -1, G, C // G).astype(jnp.float32)      # [B, V, G, c]
    m = mask.reshape(B, -1, 1, 1).astype(jnp.float32)
    cnt = jnp.sum(m, axis=1) * (C // G)                        # [B, 1, 1]-ish
    s1 = jnp.sum(xg * m, axis=(1, 3), keepdims=True)
    s2 = jnp.sum(xg * xg * m, axis=(1, 3), keepdims=True)
    if axis_name is not None:
        cnt = jax.lax.psum(cnt, axis_name)
        s1 = jax.lax.psum(s1, axis_name)
        s2 = jax.lax.psum(s2, axis_name)
    cnt = jnp.maximum(cnt, 1.0)
    # cnt is [B, 1, 1]; one trailing axis aligns it with s1/s2 [B, 1, G, 1]
    # ([:, None, :, None] here would make a 5-D tensor that silently
    # broadcast an extra batch dim — wrong stats for n_scenes >= 2)
    denom = cnt[..., None]
    mean = s1 / denom
    var = s2 / denom - mean * mean
    xn = (xg - mean) * jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    xn = xn.reshape(B, gx, gy, gz, C).astype(x.dtype)
    # affine + mask in the input dtype: f32 params/mask would silently
    # promote every U-Net activation (and its HBM traffic) to f32
    return (xn * scale.astype(x.dtype) + bias.astype(x.dtype)) \
        * mask.astype(x.dtype)


class MaskedGroupNorm(nn.Module):
    """Parameterized masked GroupNorm (affine)."""

    num_groups: int
    features: int
    zero_init_scale: bool = False
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, mask):
        init = nn.initializers.zeros if self.zero_init_scale \
            else nn.initializers.ones
        scale = self.param("scale", init, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return masked_group_norm(x, mask, self.num_groups, scale, bias,
                                 axis_name=self.axis_name)


def downsample_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """2x max-pool of a [B, gx, gy, gz, 1] occupancy mask — the active set of
    a stride-2 sparse conv (site exists iff any child voxel is active)."""
    return nn.max_pool(mask, (2, 2, 2), strides=(2, 2, 2))
