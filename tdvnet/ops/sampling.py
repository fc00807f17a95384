"""Bilinear / trilinear gather sampling with zero padding.

TPU-native replacement for `torch.nn.functional.grid_sample` (used throughout
the reference: `mv3d/subnetworks/mvsnet.py:209`, `mv3d/lightningmodel.py:165,225`,
`mv3d/subnetworks/refinement.py:91`) and `ME.MinkowskiInterpolation`
(`mv3d/subnetworks/refinement.py:26,39`).

Semantics match grid_sample(mode='bilinear', padding_mode='zeros',
align_corners=True): queries are in *pixel/cell* coordinates here (callers
never round-trip through [-1, 1]); out-of-bounds corner taps contribute zero.
Implemented as 4/8 clipped gathers with masked weights — XLA lowers these to
efficient dynamic-gathers on TPU; the fused cost-volume Pallas kernel replaces
the hot path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample(feat: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Sample a feature map at continuous pixel coordinates.

    feat: [H, W, C]; xy: [P, 2] (x, y) pixel coords (align-corners grid).
    Returns [P, C] float32; taps outside [0,W-1]x[0,H-1] contribute zero.
    """
    H, W, C = feat.shape
    x, y = xy[..., 0], xy[..., 1]
    x0f, y0f = jnp.floor(x), jnp.floor(y)
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    wx = x - x0f
    wy = y - y0f

    def tap(xi, yi, wgt):
        inb = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        xi_c = jnp.clip(xi, 0, W - 1)
        yi_c = jnp.clip(yi, 0, H - 1)
        vals = feat[yi_c, xi_c]  # [P, C]
        return vals * (wgt * inb.astype(feat.dtype))[..., None]

    out = (tap(x0, y0, (1 - wx) * (1 - wy))
           + tap(x0 + 1, y0, wx * (1 - wy))
           + tap(x0, y0 + 1, (1 - wx) * wy)
           + tap(x0 + 1, y0 + 1, wx * wy))
    return out


# vmapped over a leading batch axis of both the features and the queries
bilinear_sample_batched = jax.vmap(bilinear_sample, in_axes=(0, 0))


def trilinear_sample(vol: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Sample a dense 3D feature volume at continuous cell coordinates.

    vol: [X, Y, Z, C]; q: [P, 3] (x, y, z) in cell units (cell i at coord i).
    Returns [P, C]; taps outside the volume contribute zero — this reproduces
    `ME.MinkowskiInterpolation` on a densified grid (inactive cells hold 0).
    """
    X, Y, Z, C = vol.shape
    q0f = jnp.floor(q)
    q0 = q0f.astype(jnp.int32)
    w = q - q0f  # [P, 3]

    out = jnp.zeros((q.shape[0], C), dtype=vol.dtype)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                xi = q0[:, 0] + dx
                yi = q0[:, 1] + dy
                zi = q0[:, 2] + dz
                wgt = (jnp.where(dx, w[:, 0], 1 - w[:, 0])
                       * jnp.where(dy, w[:, 1], 1 - w[:, 1])
                       * jnp.where(dz, w[:, 2], 1 - w[:, 2]))
                inb = ((xi >= 0) & (xi <= X - 1) & (yi >= 0) & (yi <= Y - 1)
                       & (zi >= 0) & (zi <= Z - 1))
                vals = vol[jnp.clip(xi, 0, X - 1), jnp.clip(yi, 0, Y - 1),
                           jnp.clip(zi, 0, Z - 1)]
                out = out + vals * (wgt * inb.astype(vol.dtype))[:, None]
    return out


trilinear_sample_batched = jax.vmap(trilinear_sample, in_axes=(0, 0))


def resize_nearest(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Nearest-neighbor resize over the trailing-but-channel spatial dims.

    x: [..., H, W]; matches torch `F.interpolate(mode='nearest')` exactly:
    src index = floor(dst * H_in / H_out).
    """
    H, W = x.shape[-2], x.shape[-1]
    h, w = out_hw
    ys = jnp.floor(jnp.arange(h) * (H / h)).astype(jnp.int32)
    xs = jnp.floor(jnp.arange(w) * (W / w)).astype(jnp.int32)
    return x[..., ys[:, None], xs[None, :]]


def resize_nearest_nhwc(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Nearest resize for channel-last [..., H, W, C] tensors (torch parity)."""
    H, W = x.shape[-3], x.shape[-2]
    h, w = out_hw
    ys = jnp.floor(jnp.arange(h) * (H / h)).astype(jnp.int32)
    xs = jnp.floor(jnp.arange(w) * (W / w)).astype(jnp.int32)
    return x[..., ys[:, None], xs[None, :], :]
