"""Exact im2col/matmul lowering for small-channel 3D convolutions.

Why this exists: XLA-TPU lowers NDHWC `conv_general_dilated` with tiny
channel counts (CostRegNet runs 8/16/32/64 channels — reference
`mv3d/subnetworks/mvsnet.py:133-163`) at ~0.3% MFU: the output-channel
dimension maps onto the 128-wide MXU lanes, so an 8-channel conv uses
6% of the systolic array and the op becomes latency-bound.  Lowering the
conv as  *patch-extraction → one big matmul*  instead puts the full
`kd·kh·kw·Cin` receptive field on the contraction axis (27×8 = 216 for
the first CostRegNet level), turning the op into a bandwidth-bound
streaming matmul that runs at the HBM roofline rather than the
small-conv latency wall (docs/ROOFLINE.md §3 "B initial depth").

The lowering is mathematically identical to `lax.conv_general_dilated`
(cross-correlation, no kernel flip, same padding semantics including
input dilation for stride-2 transposed convs), so it is a drop-in
`impl=` switch on the conv blocks in `tdvnet/models/layers.py` —
checkpoint param trees are unchanged (tests/test_conv3d_im2col.py).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


# transient-patch budget for the automatic D-slab choice: big enough to
# stream the matmul at the HBM roofline, small enough that the 27x patch
# duplication of the finest CostRegNet level never OOMs
_PATCH_BUDGET_BYTES = 256 * 1024 * 1024


def _im2col_body(xp, kernel, strides, od):
    kd, kh, kw, cin, cout = kernel.shape
    sd, sh, sw = strides
    n, _, Hp, Wp, _ = xp.shape
    oh = (Hp - kh) // sh + 1
    ow = (Wp - kw) // sw + 1
    cols = []
    for dz in range(kd):
        for dy in range(kh):
            for dx in range(kw):
                cols.append(jax.lax.slice(
                    xp,
                    (0, dz, dy, dx, 0),
                    (n, dz + (od - 1) * sd + 1, dy + (oh - 1) * sh + 1,
                     dx + (ow - 1) * sw + 1, cin),
                    (1, sd, sh, sw, 1)))
    patches = jnp.concatenate(cols, axis=-1)        # [N,od,oh,ow,k3*Cin]
    w = kernel.reshape(kd * kh * kw * cin, cout)
    y = jax.lax.dot_general(
        patches.reshape(-1, kd * kh * kw * cin), w,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return y.reshape(n, od, oh, ow, cout).astype(xp.dtype)


def conv3d_im2col(x: jnp.ndarray, kernel: jnp.ndarray,
                  strides: Sequence[int],
                  padding: Sequence[Tuple[int, int]],
                  input_dilation: Sequence[int] = (1, 1, 1),
                  d_slab: int | None = None) -> jnp.ndarray:
    """3D conv as patch-concat + matmul.

    x: [N, D, H, W, Cin] channel-last; kernel: [kd, kh, kw, Cin, Cout]
    (flax `nn.Conv` layout).  `padding` is per-spatial-dim (lo, hi);
    `input_dilation` > 1 inserts zeros between input elements (the
    transposed-conv-as-dilated-conv trick, same as flax `input_dilation`).
    Returns [N, D', H', W', Cout] in x.dtype with fp32 accumulation.

    d_slab: chunk the OUTPUT depth axis into slabs of this size (lax.map),
    bounding the transient patch tensor — the k^3·Cin-fold patch
    duplication is ~10 GB at the finest CostRegNet level otherwise.
    Default: chosen automatically to keep patches under ~256 MB.
    """
    kd, kh, kw, cin, cout = kernel.shape
    assert x.shape[-1] == cin, (x.shape, kernel.shape)
    sd, sh, sw = strides
    # one lax.pad does both the edge padding and the interior (dilation)
    # zero-insertion
    pad_cfg = [(0, 0, 0)] + [
        (int(p[0]), int(p[1]), int(d) - 1)
        for p, d in zip(padding, input_dilation)] + [(0, 0, 0)]
    xp = jax.lax.pad(x, jnp.zeros((), x.dtype), pad_cfg)
    n, Dp, Hp, Wp, _ = xp.shape
    od = (Dp - kd) // sd + 1
    oh = (Hp - kh) // sh + 1
    ow = (Wp - kw) // sw + 1

    if d_slab is None:
        patch_bytes = n * od * oh * ow * kd * kh * kw * cin * x.dtype.itemsize
        d_slab = od if patch_bytes <= _PATCH_BUDGET_BYTES else max(
            1, int(od * _PATCH_BUDGET_BYTES / patch_bytes))
    if d_slab >= od:
        return _im2col_body(xp, kernel, strides, od)

    nslab = -(-od // d_slab)
    # pad the input so every slab reads a full static window
    need = ((nslab * d_slab - 1) * sd + kd) - Dp
    if need > 0:
        xp = jax.lax.pad(xp, jnp.zeros((), x.dtype),
                         [(0, 0, 0), (0, need, 0), (0, 0, 0), (0, 0, 0),
                          (0, 0, 0)])
    win = (d_slab - 1) * sd + kd

    def slab(i):
        x0 = jax.lax.dynamic_slice_in_dim(xp, i * d_slab * sd, win, axis=1)
        return _im2col_body(x0, kernel, strides, d_slab)

    ys = jax.lax.map(slab, jnp.arange(nslab))       # [nslab,N,slab,oh,ow,O]
    y = jnp.moveaxis(ys, 0, 1).reshape(n, nslab * d_slab, oh, ow, cout)
    return y[:, :od]


def same_pads(in_sizes: Sequence[int], kernel: Sequence[int],
              strides: Sequence[int]) -> Tuple[Tuple[int, int], ...]:
    """XLA 'SAME' padding amounts (lo, hi) per spatial dim."""
    out = []
    for i, k, s in zip(in_sizes, kernel, strides):
        o = -(-i // s)                                # ceil
        total = max((o - 1) * s + k - i, 0)
        out.append((total // 2, total - total // 2))
    return tuple(out)
