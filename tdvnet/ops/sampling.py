"""Bilinear / trilinear gather sampling with zero padding.

TPU-native replacement for `torch.nn.functional.grid_sample` (used throughout
the reference: `mv3d/subnetworks/mvsnet.py:209`, `mv3d/lightningmodel.py:165,225`,
`mv3d/subnetworks/refinement.py:91`) and `ME.MinkowskiInterpolation`
(`mv3d/subnetworks/refinement.py:26,39`).

Semantics match grid_sample(mode='bilinear', padding_mode='zeros',
align_corners=True): queries are in *pixel/cell* coordinates here (callers
never round-trip through [-1, 1]); out-of-bounds corner taps contribute zero.
Implemented as 4/8 clipped gathers with masked weights; the packed variants
below fetch a full interpolation stencil per gather row (TPU gather cost is
per row).  The hottest warp (plane-sweep cost volume) bypasses gathers
entirely via the two-pass homography matmul in `tdvnet.ops.warp`.
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


def pack_bilinear_quads(feat: jnp.ndarray) -> jnp.ndarray:
    """Pack each 2x2 tap neighborhood into one gather row.

    feat: [H, W, C] → [(H+1)*(W+1), 4C] float32 where row (y+1)*(W+1)+(x+1)
    holds [f(y,x), f(y,x+1), f(y+1,x), f(y+1,x+1)] of the ZERO-PADDED map
    (taps outside the image are zero — grid_sample zeros-padding semantics).

    Why: on TPU, XLA's gather cost is per ROW plus a per-byte term
    (round-3 measurement, tools/bench_gather_variants.py: 1.76M 512B-row
    gathers = 10.8 ms fp32 vs 7.9 ms bf16 incl. epilogue), so fetching all
    four bilinear taps in one 4C-wide gather is ~4x cheaper than four
    C-wide gathers, and the table keeps the INPUT dtype (bf16 halves the
    gathered bytes).  This is the TPU-shaped replacement for the
    reference's `grid_sample` warp (`mv3d/subnetworks/mvsnet.py:209`).
    """
    H, W, C = feat.shape
    p = jnp.pad(feat, ((1, 1), (1, 1), (0, 0)))
    q = jnp.concatenate([p[:-1, :-1], p[:-1, 1:], p[1:, :-1], p[1:, 1:]],
                        axis=-1)                       # [H+1, W+1, 4C]
    return q.reshape((H + 1) * (W + 1), 4 * C)


def bilinear_sample_quads(quads: jnp.ndarray, xy: jnp.ndarray,
                          img_hw) -> jnp.ndarray:
    """Bilinear sample from a quad-packed table (see pack_bilinear_quads).

    quads: [(H+1)*(W+1), 4C]; xy: [P, 2] pixel coords; img_hw: (H, W) of
    the original map.  Equivalent to `bilinear_sample(feat, xy)`; the
    interpolation runs in the table's dtype (bf16 tables halve the
    epilogue traffic; weights are exact in bf16 only to ~3 decimal digits,
    within the feature noise floor).
    """
    H, W = img_hw
    C4 = quads.shape[-1]
    C = C4 // 4
    x, y = xy[..., 0], xy[..., 1]
    x0f, y0f = jnp.floor(x), jnp.floor(y)
    wx = (x - x0f)[:, None].astype(quads.dtype)
    wy = (y - y0f)[:, None].astype(quads.dtype)
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    # anchors in [-1, W-1+1): every partially-in-bounds point keeps its true
    # anchor (padded zeros supply the out-of-image taps); fully-out points
    # are clamped and masked.
    inb = (x0 >= -1) & (x0 <= W - 1) & (y0 >= -1) & (y0 <= H - 1)
    xi = jnp.clip(x0 + 1, 0, W)
    yi = jnp.clip(y0 + 1, 0, H)
    rows = jnp.take(quads, yi * (W + 1) + xi, axis=0)  # [P, 4C]
    f00, f01, f10, f11 = (rows[:, :C], rows[:, C:2 * C],
                          rows[:, 2 * C:3 * C], rows[:, 3 * C:])
    out = ((1 - wx) * (1 - wy) * f00 + wx * (1 - wy) * f01
           + (1 - wx) * wy * f10 + wx * wy * f11)
    return out * inb[:, None].astype(out.dtype)


bilinear_sample_quads_batched = jax.vmap(bilinear_sample_quads,
                                         in_axes=(0, 0, None))


PATCH_K = 4  # 4x4 tap patch: covers hypothesis anchors within +-1 texel
             # of the center hypothesis's anchor


def pack_bilinear_patches(feat: jnp.ndarray) -> jnp.ndarray:
    """Pack each 4x4 tap neighborhood into one gather row.

    feat: [H, W, C] → [(H+1)*(W+1), 16C] where row (y0+1)*(W+1)+(x0+1)
    holds the taps (y0-1..y0+2, x0-1..x0+2) of the ZERO-PADDED map, in
    dy-major dx-minor order.

    Why (round 5, pointflow fast path): the 2n+1 depth hypotheses of one
    pixel project onto a sub-texel epipolar span per source view
    (quarter-res disparity f*B*(2n*offset)/d^2 ~ 0.2-1.8 texels across
    all 7 at the eval geometry), so ONE patch row centered on the middle
    hypothesis serves every hypothesis's bilinear footprint — (2n+1)x
    fewer gather rows, and the 16C row (1 KB at C=32 bf16) sits exactly
    at the measured per-row/bandwidth crossover
    (tools/bench_gather_variants.py).  Taps outside the image are zero
    (grid_sample zeros-padding, `mv3d/subnetworks/refinement.py:76`)."""
    H, W, C = feat.shape
    pp = jnp.pad(feat, ((2, 2), (2, 2), (0, 0)))       # [H+4, W+4, C]
    # anchor a_y = y0+1 in [0, H]; tap dy reads pp[a_y + dy] (see derivation
    # in patch_sample_hypotheses)
    q = jnp.concatenate([pp[dy:dy + H + 1, dx:dx + W + 1]
                         for dy in range(PATCH_K) for dx in range(PATCH_K)],
                        axis=-1)                       # [H+1, W+1, 16C]
    return q.reshape((H + 1) * (W + 1), PATCH_K * PATCH_K * C)


def patch_sample_hypotheses(patches: jnp.ndarray, xy_c: jnp.ndarray,
                            xy_h: jnp.ndarray, img_hw) -> jnp.ndarray:
    """Bilinear-sample all hypotheses of each pixel from one patch row.

    patches: [(H+1)*(W+1), 16C] (pack_bilinear_patches); xy_c: [P, 2]
    center-hypothesis coords (feature-grid pixels); xy_h: [Hh, P, 2] all
    hypotheses' coords; img_hw: (H, W) of the original map.

    Exact vs per-hypothesis `bilinear_sample_quads` whenever each
    hypothesis's anchor lies within +-1 texel of the center anchor (the
    epipolar-span condition above); outside, the local coordinate clamps
    to the patch edge (approximation — quality-gated, the fast path's
    acceptance harness is tools/fastpath_gate.py).  A hypothesis whose
    own footprint is fully outside the image returns 0 (same mask rule
    as the quad path)."""
    H, W = img_hw
    KK = PATCH_K * PATCH_K
    C = patches.shape[-1] // KK
    xc0 = jnp.floor(xy_c[:, 0]).astype(jnp.int32)
    yc0 = jnp.floor(xy_c[:, 1]).astype(jnp.int32)
    inb_c = (xc0 >= -1) & (xc0 <= W - 1) & (yc0 >= -1) & (yc0 <= H - 1)
    xi = jnp.clip(xc0 + 1, 0, W)
    yi = jnp.clip(yc0 + 1, 0, H)
    rows = jnp.take(patches, yi * (W + 1) + xi, axis=0)   # [P, 16C]
    patch = rows.reshape(-1, PATCH_K, PATCH_K, C)

    # local continuous coords inside the patch (patch origin = anchor - 1)
    lx = xy_h[..., 0] - (xc0.astype(jnp.float32) - 1.0)   # [Hh, P]
    ly = xy_h[..., 1] - (yc0.astype(jnp.float32) - 1.0)
    lx = jnp.clip(lx, 0.0, PATCH_K - 1 - 1e-4)
    ly = jnp.clip(ly, 0.0, PATCH_K - 1 - 1e-4)
    ix = jnp.clip(jnp.floor(lx).astype(jnp.int32), 0, PATCH_K - 2)
    iy = jnp.clip(jnp.floor(ly).astype(jnp.int32), 0, PATCH_K - 2)
    fx = (lx - ix.astype(jnp.float32)).astype(patch.dtype)
    fy = (ly - iy.astype(jnp.float32)).astype(patch.dtype)

    # per-hypothesis in-bounds mask: same anchor rule as the quad path,
    # AND the center row must be real (a clamped center row holds the
    # wrong neighborhood)
    xh0 = jnp.floor(xy_h[..., 0]).astype(jnp.int32)
    yh0 = jnp.floor(xy_h[..., 1]).astype(jnp.int32)
    inb = ((xh0 >= -1) & (xh0 <= W - 1) & (yh0 >= -1) & (yh0 <= H - 1)
           & inb_c[None, :])

    eye = jnp.eye(PATCH_K, dtype=patch.dtype)
    wx = eye[ix] * (1 - fx)[..., None] + eye[ix + 1] * fx[..., None]
    wy = eye[iy] * (1 - fy)[..., None] + eye[iy + 1] * fy[..., None]
    # [Hh,P,4] x [Hh,P,4] x [P,4,4,C] -> [Hh,P,C]
    f = jnp.einsum("hpy,hpx,pyxc->hpc", wy, wx, patch)
    return f * inb[..., None].astype(f.dtype)


patch_sample_hypotheses_batched = jax.vmap(patch_sample_hypotheses,
                                           in_axes=(0, 0, 0, None))


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


def pack_trilinear_octs(vol: jnp.ndarray) -> jnp.ndarray:
    """Pack each 2x2x2 tap neighborhood into one gather row.

    vol: [X, Y, Z, C] → [(X+1)*(Y+1)*(Z+1), 8C] (same dtype) where the row
    for anchor (x,y,z) holds the 8 corner features of the zero-padded
    volume.  Same rationale as `pack_bilinear_quads`: XLA's TPU gather
    cost is per row, so 1 wide gather beats 8 narrow ones.
    """
    X, Y, Z, C = vol.shape
    p = jnp.pad(vol, ((1, 1), (1, 1), (1, 1), (0, 0)))
    parts = [p[dx:dx + X + 1, dy:dy + Y + 1, dz:dz + Z + 1]
             for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)]
    o = jnp.concatenate(parts, axis=-1)            # [X+1, Y+1, Z+1, 8C]
    return o.reshape((X + 1) * (Y + 1) * (Z + 1), 8 * C)


def trilinear_sample_octs(octs: jnp.ndarray, q: jnp.ndarray,
                          vol_xyz) -> jnp.ndarray:
    """Trilinear sample from an oct-packed table (see pack_trilinear_octs).

    octs: [(X+1)(Y+1)(Z+1), 8C]; q: [P, 3] cell coords; vol_xyz: (X, Y, Z).
    Exactly equivalent to `trilinear_sample(vol, q)`.
    """
    X, Y, Z = vol_xyz
    C = octs.shape[-1] // 8
    q0f = jnp.floor(q)
    q0 = q0f.astype(jnp.int32)
    w = (q - q0f).astype(jnp.float32)              # [P, 3]
    inb = ((q0[:, 0] >= -1) & (q0[:, 0] <= X - 1)
           & (q0[:, 1] >= -1) & (q0[:, 1] <= Y - 1)
           & (q0[:, 2] >= -1) & (q0[:, 2] <= Z - 1))
    xi = jnp.clip(q0[:, 0] + 1, 0, X)
    yi = jnp.clip(q0[:, 1] + 1, 0, Y)
    zi = jnp.clip(q0[:, 2] + 1, 0, Z)
    rows = jnp.take(octs, (xi * (Y + 1) + yi) * (Z + 1) + zi, axis=0)
    # interpolate in the table's dtype: the epilogue reads 8C and writes C
    # per query, so a f32 upcast would double the dominant HBM traffic
    # (weights built in f32, quantized once at the multiply)
    out = jnp.zeros((q.shape[0], C), octs.dtype)
    i = 0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                wgt = (jnp.where(dx, w[:, 0], 1 - w[:, 0])
                       * jnp.where(dy, w[:, 1], 1 - w[:, 1])
                       * jnp.where(dz, w[:, 2], 1 - w[:, 2]))
                out = out + rows[:, i * C:(i + 1) * C] \
                    * wgt[:, None].astype(octs.dtype)
                i += 1
    return out * inb[:, None].astype(out.dtype)


trilinear_sample_octs_batched = jax.vmap(trilinear_sample_octs,
                                         in_axes=(0, 0, None))


def quantize_per_channel_int8(vol: jnp.ndarray):
    """Symmetric per-channel int8 quantization of a feature volume.

    vol: [..., C] float → (q [..., C] int8, scale [C] f32) with
    q = round(vol / scale), scale = absmax_c / 127.  Zeros stay exactly
    zero, so masked-dense inactive-cell semantics are preserved.

    Eval fast path: the pointflow scene-feature gather is bandwidth-bound
    at the ~78 GB/s XLA gather ceiling (docs/ROOFLINE.md §3) — int8 rows
    halve the dominant gather bytes vs bf16 for ~0.4% rms feature error.
    """
    absmax = jnp.max(jnp.abs(vol.astype(jnp.float32)),
                     axis=tuple(range(vol.ndim - 1)))
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.round(vol.astype(jnp.float32) / scale).astype(jnp.int8)
    return q, scale


def trilinear_sample_octs_scaled(octs: jnp.ndarray, scale: jnp.ndarray,
                                 q: jnp.ndarray, vol_xyz,
                                 out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """`trilinear_sample_octs` over an int8-quantized oct table.

    octs: [(X+1)(Y+1)(Z+1), 8C] int8; scale: [C] f32 per-channel dequant.
    Interpolates in `out_dtype` and dequantizes ONCE after the weighted
    sum (the 8 octs of a channel share its scale, and interpolation is
    linear, so post-scaling is exact).
    """
    X, Y, Z = vol_xyz
    C = octs.shape[-1] // 8
    q0f = jnp.floor(q)
    q0 = q0f.astype(jnp.int32)
    w = (q - q0f).astype(jnp.float32)
    inb = ((q0[:, 0] >= -1) & (q0[:, 0] <= X - 1)
           & (q0[:, 1] >= -1) & (q0[:, 1] <= Y - 1)
           & (q0[:, 2] >= -1) & (q0[:, 2] <= Z - 1))
    xi = jnp.clip(q0[:, 0] + 1, 0, X)
    yi = jnp.clip(q0[:, 1] + 1, 0, Y)
    zi = jnp.clip(q0[:, 2] + 1, 0, Z)
    rows = jnp.take(octs, (xi * (Y + 1) + yi) * (Z + 1) + zi, axis=0) \
        .astype(out_dtype)
    out = jnp.zeros((q.shape[0], C), out_dtype)
    i = 0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                wgt = (jnp.where(dx, w[:, 0], 1 - w[:, 0])
                       * jnp.where(dy, w[:, 1], 1 - w[:, 1])
                       * jnp.where(dz, w[:, 2], 1 - w[:, 2]))
                out = out + rows[:, i * C:(i + 1) * C] \
                    * wgt[:, None].astype(out_dtype)
                i += 1
    out = out * (scale[None, :].astype(out_dtype))
    return out * inb[:, None].astype(out.dtype)


trilinear_sample_octs_scaled_batched = jax.vmap(
    trilinear_sample_octs_scaled, in_axes=(0, 0, 0, None))


def _up2_axis_zeropad(vol: jnp.ndarray, axis: int, out_len: int) -> jnp.ndarray:
    """Exact 2x linear upsampling along one axis with zero-pad semantics.

    Node i of the input sits at output coord 2i; odd output nodes are the
    midpoint average, with the one-past-the-end tap ZERO (matching
    `trilinear_sample`'s zero padding).  Output is cropped/zero-padded to
    `out_len` — positions beyond 2*(n-1)+1 are exactly zero, which is what
    direct trilinear sampling of the coarse grid returns there.
    """
    n = vol.shape[axis]
    nxt = jnp.concatenate(
        [jax.lax.slice_in_dim(vol, 1, n, axis=axis),
         jnp.zeros_like(jax.lax.slice_in_dim(vol, 0, 1, axis=axis))],
        axis=axis)
    mid = ((vol + nxt) * vol.dtype.type(0.5)).astype(vol.dtype)
    y = jnp.stack([vol, mid], axis=axis + 1)
    shape = list(vol.shape)
    shape[axis] = 2 * n
    y = y.reshape(shape)
    if out_len <= 2 * n:
        return jax.lax.slice_in_dim(y, 0, out_len, axis=axis)
    pad = [(0, 0)] * y.ndim
    pad[axis] = (0, out_len - 2 * n)
    return jnp.pad(y, pad)


def upsample_linear_zeropad(vol: jnp.ndarray, factor: int,
                            out_xyz) -> jnp.ndarray:
    """Exact trilinear upsampling of [B, X, Y, Z, C] by a power-of-two
    factor onto a finer nested lattice (coarse node i ↦ fine node
    factor*i), with zero-padding semantics outside the coarse volume.

    Key identity (used by `combine_scales`): a multilinear function
    restricted to a sub-box is multilinear in the sub-box's corners, so
    trilinear_sample(coarse, p/factor) == trilinear_sample(upsampled, p)
    EXACTLY for every p — including outside, where both are zero.
    """
    assert factor & (factor - 1) == 0, factor
    f = factor
    while f > 1:
        tgt = [min(2 * s, o if f == 2 else 2 * s)
               for s, o in zip(vol.shape[1:4], out_xyz)]
        for ax, t in zip((1, 2, 3), tgt):
            vol = _up2_axis_zeropad(vol, ax, t)
        f //= 2
    # final crop/pad to the exact fine dims
    for ax, o in zip((1, 2, 3), out_xyz):
        n = vol.shape[ax]
        if n > o:
            vol = jax.lax.slice_in_dim(vol, 0, o, axis=ax)
        elif n < o:
            pad = [(0, 0)] * vol.ndim
            pad[ax] = (0, o - n)
            vol = jnp.pad(vol, pad)
    return vol


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
