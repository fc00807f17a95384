"""Plane-sweep warp as structured matmuls (two-pass homography resampling).

TPU-first replacement for the gather-based plane-sweep sampling
(`tdvnet.ops.costvolume._source_variance`; reference op
`/root/reference/mv3d/subnetworks/mvsnet.py:187-216`).  XLA's TPU gather
costs ~8 ns per ROW regardless of width, so the 27M-row gather per
init-depth chunk is latency-bound at ~2% of HBM bandwidth.  This module
moves the work to the MXU instead:

For one (ref, src, depth-plane) the warp is a homography H: output grid
pixel (p, q, 1) -> source feature coords (u, v, 1).  Fix an output row q:

    u(p) = (a1 p + b1) / (a3 p + b3)          a_i = H[i0], b_i(q) = H[i1] q + H[i2]
    v(p) = (a2 p + b2) / (a3 p + b3)

Eliminating p gives v = alpha(q) * u + beta(q): the warped scanline is a
STRAIGHT LINE in the source image, with

    alpha = (a3 b2 - a2 b3) / (a3 b1 - a1 b3)
    beta  = (a2 b1 - a1 b2) / (a3 b1 - a1 b3)

(exact identity, no approximation).  The bilinear warp then factors into
two 1D linear interpolations, each a dense contraction with 2-tap "hat"
weight matrices built elementwise (relu(1 - |pos - iota|), which also
reproduces grid_sample zero-padding semantics at the borders):

    pass 1 (y):  G[q, x, c]   = sum_y  hat(alpha q x + beta - y) F[y, x, c]
    pass 2 (x):  out[q, p, c] = sum_x  hat(u(q, p) - x) G[q, x, c]

This is the classic two-pass (Catmull-Smith) decomposition: pass 1 samples
each source column where the scanline crosses it (y = alpha*x + beta)
rather than at the output pixel's exact v — a sub-pixel difference bounded
by |alpha| (the scanline slope).  For MVS source windows (neighboring
views, mild relative rotation) |alpha| << 1 and the result matches the
direct bilinear gather to ~1e-3; `max_abs_alpha` lets callers detect the
degenerate near-vertical-scanline case (|alpha| large) and fall back to
the gather path.

Weight matrices are far too large to keep (O(R*S*D*q*x*y)), so planes are
processed in scanned blocks and the per-source accumulation is fused into
the variance sums — only the [R, D, h, w, C] variance volume survives.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


_HI = jax.lax.Precision.HIGHEST


def plane_sweep_homographies(rotmats, tvecs, K, ref_idx, src_idx,
                             depth_start: float, depth_interval: float,
                             n_planes: int, img_size: Tuple[int, int],
                             plane_size: Tuple[int, int],
                             feat_size: Tuple[int, int]) -> jnp.ndarray:
    """Homographies H [R, S, D, 3, 3]: ref plane-grid (p, q, 1) -> source
    FEATURE-grid coords (u, v, 1).

    Grid conventions match `camera.build_img_grid` / the gather path:
    plane-grid index i maps to full-image pixel i * (W-1)/(w-1)
    (align-corners), and full-image pixels map to feature coords by
    (Wf-1)/(W-1).
    """
    H_img, W_img = img_size
    h, w = plane_size
    Hf, Wf = feat_size
    R = rotmats[ref_idx]                                   # [Rr, 3, 3]
    t_r = tvecs[ref_idx]
    Rs = rotmats[src_idx]                                  # [Rr, S, 3, 3]
    t_s = tvecs[src_idx]
    Ks = K[src_idx]
    K_r_inv = jnp.linalg.inv(K[ref_idx])                   # [Rr, 3, 3]

    # relative pose: X_s = R_sr X_r + t_sr
    R_sr = jnp.einsum("rsij,rkj->rsik", Rs, R,
                      precision=_HI)                       # R_s R_r^T
    t_sr = t_s - jnp.einsum("rsij,rj->rsi", R_sr, t_r, precision=_HI)

    # H_inf + (1/d) K_s t_sr e3^T   (plane-induced homography at depth d)
    A = jnp.einsum("rsij,rsjk,rkl->rsil", Ks, R_sr, K_r_inv,
                   precision=_HI)                          # [Rr, S, 3, 3]
    Kt = jnp.einsum("rsij,rsj->rsi", Ks, t_sr, precision=_HI)
    d = depth_start + depth_interval * jnp.arange(n_planes,
                                                  dtype=jnp.float32)
    e3 = jnp.zeros((3,), jnp.float32).at[2].set(1.0)
    Hd = (A[:, :, None] + (1.0 / d)[None, None, :, None, None]
          * Kt[:, :, None, :, None] * e3[None, None, None, None, :])

    # grid/feature scalings (diagonal homographies)
    sgx = (W_img - 1.0) / max(w - 1.0, 1.0)
    sgy = (H_img - 1.0) / max(h - 1.0, 1.0)
    sfx = (Wf - 1.0) / (W_img - 1.0)
    sfy = (Hf - 1.0) / (H_img - 1.0)
    Dg = jnp.diag(jnp.array([sgx, sgy, 1.0], jnp.float32))
    Df = jnp.diag(jnp.array([sfx, sfy, 1.0], jnp.float32))
    return jnp.einsum("ij,rsdjk,kl->rsdil", Df, Hd, Dg, precision=_HI)


def _row_coeffs(Hm, h: int):
    """Per-output-row scanline coefficients from H [..., 3, 3].

    Returns (a [..., 3], b [..., h, 3], alpha [..., h], beta [..., h]) with
    a_i = H[i, 0], b_i(q) = H[i, 1] q + H[i, 2].
    """
    q = jnp.arange(h, dtype=jnp.float32)
    a = Hm[..., :, 0]                                       # [..., 3]
    b = Hm[..., :, 1, None] * q + Hm[..., :, 2, None]       # [..., 3, h]
    b = jnp.moveaxis(b, -1, -2)                             # [..., h, 3]
    a_ = a[..., None, :]                                    # [..., 1, 3]
    # alpha = (a3 b2 - a2 b3) / (a3 b1 - a1 b3); beta = (a2 b1 - a1 b2)/(.)
    den = a_[..., 2] * b[..., 0] - a_[..., 0] * b[..., 2]
    alpha = (a_[..., 2] * b[..., 1] - a_[..., 1] * b[..., 2]) / den
    beta = (a_[..., 1] * b[..., 0] - a_[..., 0] * b[..., 1]) / den
    return a, b, alpha, beta


def max_abs_alpha(Hm, h: int) -> jnp.ndarray:
    """Max |scanline slope| over all (ref, src, plane, row) — a host-side
    health check: the two-pass warp degrades when scanlines approach
    vertical (|alpha| >~ 1)."""
    _, _, alpha, _ = _row_coeffs(Hm, h)
    return jnp.max(jnp.abs(alpha))


def _hat(pos, n: int, dtype):
    """hat-function weight matrix: w[..., i] = max(0, 1 - |pos - i|).

    pos [...], returns [..., n].  Rows whose pos is outside [-1, n] get all
    zeros — exactly grid_sample's zeros padding for out-of-image taps.
    Non-finite pos (degenerate homography rows) also produce zeros."""
    i = jnp.arange(n, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(pos[..., None] - i))
    return jnp.where(jnp.isfinite(w), w, 0.0).astype(dtype)


def warp_variance_matmul(feats, Hmat, src_mask, plane_size: Tuple[int, int],
                         weights_dtype=jnp.bfloat16,
                         plane_block: int = 96,
                         src_unroll: int | None = None):
    """Fused two-pass warp + masked source variance.

    feats:    [N, Hf, Wf, C] source feature maps.
    Hmat:     [R, S, D, 3, 3] plane-grid -> feature-coord homographies
              (from `plane_sweep_homographies`; src axis resolves feats
              via src_idx OUTSIDE — pass feats_g = feats[src_idx]).
    src_mask: [R, S] validity.
    src_unroll: legacy knob — the source loop is now always a Python
              unroll (dots-first/reduce-last, see `block` below); kept
              for API compatibility and still validated >= 1.
    Returns var [R, D, h, w, C] float32.

    feats here must already be gathered per (ref, src): [R, S, Hf, Wf, C].
    """
    h, w = plane_size
    Rr, S, D = Hmat.shape[:3]
    Hf, Wf, C = feats.shape[2:]
    cnt = jnp.maximum(jnp.sum(src_mask.astype(jnp.float32), axis=1), 1.0)
    mask_f = src_mask.astype(jnp.float32)

    nb = -(-D // plane_block)
    Dp = nb * plane_block
    Hp = jnp.pad(Hmat, ((0, 0), (0, 0), (0, Dp - D), (0, 0), (0, 0)))
    # [nb, R, S, pb, 3, 3]
    Hb = jnp.moveaxis(Hp.reshape(Rr, S, nb, plane_block, 3, 3), 2, 0)
    fx = feats.astype(weights_dtype)

    p_idx = jnp.arange(w, dtype=jnp.float32)
    x_idx = jnp.arange(Wf, dtype=jnp.float32)
    if src_unroll is not None and src_unroll < 1:
        raise ValueError(f"src_unroll must be >= 1, got {src_unroll}")

    def block(carry, Hblk):
        # Hblk: [R, S, pb, 3, 3]
        # per-source remat: the backward pass recomputes the (huge) hat
        # weight matrices from the homography coefficients instead of
        # keeping them as residuals (same pattern as the gather path)
        @jax.checkpoint
        def one_source(s):
            a, b, alpha, beta = _row_coeffs(Hblk[:, s], h)  # [R,pb,...]
            # pass 1: y-interp of every source column at the scanline
            v_col = (alpha[..., None] * x_idx
                     + beta[..., None])                     # [R,pb,h,Wf]
            Wy = _hat(v_col, Hf, weights_dtype)             # [R,pb,h,Wf,Hf]
            # hat rows have <=2 nonzeros, so the pass-1 contraction sums
            # only two products — emitting it in the weights dtype is
            # harmless and halves the G intermediate's HBM traffic
            G = jnp.einsum("rdqxy,ryxc->rdqxc", Wy, fx[:, s],
                           preferred_element_type=weights_dtype)
            # pass 2: x-interp at u(q, p)
            num = a[..., None, 0:1] * p_idx + b[..., 0:1]   # [R,pb,h,w]
            den = a[..., None, 2:3] * p_idx + b[..., 2:3]
            u = num / den
            Wx = _hat(u, Wf, weights_dtype)                 # [R,pb,h,w,Wf]
            # emit per-source warped values in the weights dtype (the
            # gather path samples features in their storage dtype too);
            # the variance reduction below accumulates in fp32
            return jnp.einsum("rdqpx,rdqxc->rdqpc", Wx, G,
                              preferred_element_type=weights_dtype)

        # dots-first, reduce-last (round 5): every source's two dots run
        # with NO accumulator carries between them, then ONE fusion
        # reduces the S outputs into the variance.  The previous unrolled
        # scan chained acc = acc + f(dot_s) across sources, forcing XLA
        # to round-trip two fp32 [R,pb,h,w,C] accumulators through HBM
        # around every dot — measured 63.3 -> 55.8 ms/exec at the 18-ref
        # eval shapes (tools/exp_warp_variants.py), and the accumulators
        # vanish from the live set entirely
        outs = [one_source(s) for s in range(S)]
        denom = cnt[:, None, None, None, None]
        msk = [mask_f[:, s][:, None, None, None, None] for s in range(S)]
        acc_v = sum(o.astype(jnp.float32) * m for o, m in zip(outs, msk))
        acc_sq = sum(jnp.square(o.astype(jnp.float32)) * m
                     for o, m in zip(outs, msk))
        mean = acc_v / denom
        return carry, acc_sq / denom - mean * mean

    _, var_b = jax.lax.scan(block, None, Hb)                # [nb,R,pb,h,w,C]
    var = jnp.moveaxis(var_b, 0, 1).reshape(Rr, Dp, h, w, C)[:, :D]
    return var


def plane_sweep_variance_matmul(feats, rotmats, tvecs, K, ref_idx, src_idx,
                                src_mask, depth_start: float,
                                depth_interval: float, n_planes: int,
                                img_size: Tuple[int, int],
                                plane_size: Tuple[int, int],
                                weights_dtype=jnp.bfloat16,
                                plane_block: int = 96,
                                src_unroll: int | None = None) -> jnp.ndarray:
    """Drop-in MXU replacement for the gather-based plane-sweep variance:
    returns [R, D, h, w, C] float32 like
    `costvolume.plane_sweep_cost_volume`."""
    Hf, Wf = feats.shape[1:3]
    Hm = plane_sweep_homographies(rotmats, tvecs, K, ref_idx, src_idx,
                                  depth_start, depth_interval, n_planes,
                                  img_size, plane_size, (Hf, Wf))
    Hm = jax.lax.stop_gradient(Hm)
    feats_g = feats[src_idx]                                # [R, S, Hf, Wf, C]
    return warp_variance_matmul(feats_g, Hm, src_mask, plane_size,
                                weights_dtype, plane_block, src_unroll)
