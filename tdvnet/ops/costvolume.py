"""Plane-sweep variance cost volume and point-feature variance gathering.

TPU-first redesign of the reference warping pipeline
(`mv3d/subnetworks/mvsnet.py:187-216`: build frustum points → project into
each ref↔src edge → grid_sample → scatter-mean variance): here the ref/src
graph is a fixed [R, S] table, so variance is a masked reduction over the
source axis S — no edge gather/scatter, and XLA fuses the projection math
into the sampling gathers.  Accumulation over sources runs as a `lax.scan`
(S is small) so only one [R, D*h*w, C] sampled tensor is live at a time.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from tdvnet.ops import camera
from tdvnet.ops.sampling import (bilinear_sample_quads_batched,
                                 pack_bilinear_quads)


# fp32-element budget for one sampled [R, P_chunk, C] tensor (~256 MB);
# the point axis is scanned in chunks so whole-scene eval never
# materializes multi-GB feature tensors
_CHUNK_BUDGET_ELEMS = 64 * 1024 * 1024


def _pick_chunks(R: int, P: int, C: int) -> int:
    """Chunk count so R*ceil(P/n)*C fits the budget (P pads up to n*Pc —
    no divisor requirement, so prime P no longer degrades to P chunks)."""
    need = (R * P * C + _CHUNK_BUDGET_ELEMS - 1) // _CHUNK_BUDGET_ELEMS
    return max(1, min(int(need), P))


def _source_variance(pts_world: jnp.ndarray, feats: jnp.ndarray,
                     src_idx: jnp.ndarray, src_mask: jnp.ndarray,
                     P_all: jnp.ndarray, img_size: Tuple[int, int]):
    """Masked per-point feature variance over each ref's source views.

    pts_world: [R, P, 3] world points belonging to ref view r.
    feats:     [N, Hf, Wf, C] feature maps (any resolution).
    src_idx:   [R, S] image indices; src_mask: [R, S] validity.
    P_all:     [N, 3, 4] projection matrices (full-image pixel units).
    img_size:  (H, W) full image size the projections are expressed in.

    Returns (var [R, P, C] fp32, mean [R, P, C] fp32).
    """
    R, P, _ = pts_world.shape
    S = src_idx.shape[1]
    Hf, Wf, C = feats.shape[1:]
    H, W = img_size
    # pixel → feature-grid coords (align-corners: x_f = x * (Wf-1)/(W-1))
    sx = (Wf - 1.0) / (W - 1.0)
    sy = (Hf - 1.0) / (H - 1.0)
    scale = jnp.array([sx, sy], dtype=jnp.float32)
    cnt = jnp.maximum(jnp.sum(src_mask.astype(jnp.float32), axis=1), 1.0)
    # one 4C-wide gather per point instead of four C-wide ones — XLA's TPU
    # gather cost is per row, not per element (see pack_bilinear_quads)
    quads = jax.vmap(pack_bilinear_quads)(feats)

    def variance_of(pts_chunk):
        Pc = pts_chunk.shape[1]

        # per-step remat: without it the backward pass stacks every scan
        # iteration's gathered [R, Pc, C] features (6 GB at train shapes —
        # the round-2 HBM OOM); recomputing the gather in the backward
        # keeps only the carry live
        @jax.checkpoint
        def body(carry, s):
            acc, acc_sq = carry
            idx = src_idx[:, s]                  # [R]
            xy, _ = camera.project_points(pts_chunk, P_all[idx])
            f = bilinear_sample_quads_batched(quads[idx], xy * scale,
                                              (Hf, Wf))
            m = src_mask[:, s].astype(jnp.float32)[:, None, None]
            return (acc + f * m, acc_sq + f * f * m), None

        init = (jnp.zeros((R, Pc, C), jnp.float32),
                jnp.zeros((R, Pc, C), jnp.float32))
        (acc, acc_sq), _ = jax.lax.scan(body, init, jnp.arange(S))
        denom = cnt[:, None, None]
        mean = acc / denom
        return acc_sq / denom - mean * mean, mean

    n_chunks = _pick_chunks(R, P, C)
    if n_chunks == 1:
        return variance_of(pts_world)
    Pc = -(-P // n_chunks)
    pad = n_chunks * Pc - P
    pts_p = jnp.pad(pts_world, ((0, 0), (0, pad), (0, 0)))
    pts_c = pts_p.reshape(R, n_chunks, Pc, 3).transpose(1, 0, 2, 3)
    _, (var_c, mean_c) = jax.lax.scan(
        lambda _, p: (None, jax.checkpoint(variance_of)(p)), None, pts_c)
    var = var_c.transpose(1, 0, 2, 3).reshape(R, n_chunks * Pc, C)[:, :P]
    mean = mean_c.transpose(1, 0, 2, 3).reshape(R, n_chunks * Pc, C)[:, :P]
    return var, mean


def plane_sweep_cost_volume(feats: jnp.ndarray, rotmats: jnp.ndarray,
                            tvecs: jnp.ndarray, K: jnp.ndarray,
                            ref_idx: jnp.ndarray, src_idx: jnp.ndarray,
                            src_mask: jnp.ndarray, depth_start: float,
                            depth_interval: float, n_planes: int,
                            img_size: Tuple[int, int],
                            plane_size: Tuple[int, int],
                            mode: str = "gather",
                            weights_dtype=jnp.float32,
                            alpha_max: float = 0.25,
                            src_unroll: int | None = None) -> jnp.ndarray:
    """Variance cost volume for each ref view.

    feats: [N, Hf, Wf, C] (quarter-res image features).
    ref_idx: [R] image index of each ref view; src_idx/src_mask: [R, S].
    mode: "gather" (quad-packed bilinear gathers, exact grid_sample
    semantics), "matmul" (two-pass homography resampling on the MXU —
    `tdvnet.ops.warp`, ~4.3x faster on v5e, O(scanline-slope) sub-pixel
    deviation from exact bilinear), or "auto" (matmul with a runtime
    `lax.cond` fallback to the exact gather path when the max scanline
    slope |alpha| over the batch exceeds `alpha_max` — rotation-heavy
    view pairs degrade the two-pass decomposition; reference exactness
    bar is bilinear `grid_sample`, `mv3d/subnetworks/mvsnet.py:187-211`).
    Returns [R, D, h, w, C] fp32 variance volume (NDHWC for the 3D U-Net).
    """
    h, w = plane_size

    def gather_variance(feats):
        pts = camera.plane_sweep_points(depth_start, depth_interval,
                                        n_planes, rotmats[ref_idx],
                                        tvecs[ref_idx], K[ref_idx],
                                        img_size, plane_size)
        P_all = camera.projection_matrix(K, rotmats, tvecs)
        var, _ = _source_variance(pts, feats, src_idx, src_mask, P_all,
                                  img_size)
        R = ref_idx.shape[0]
        return var.reshape(R, n_planes, h, w, -1)

    if mode == "gather":
        return gather_variance(feats)

    from tdvnet.ops import warp

    Hf, Wf = feats.shape[1:3]
    Hm = jax.lax.stop_gradient(warp.plane_sweep_homographies(
        rotmats, tvecs, K, ref_idx, src_idx, depth_start, depth_interval,
        n_planes, img_size, plane_size, (Hf, Wf)))

    def matmul_variance(feats):
        return warp.warp_variance_matmul(feats[src_idx], Hm, src_mask,
                                         plane_size,
                                         weights_dtype=weights_dtype,
                                         src_unroll=src_unroll)

    if mode == "matmul":
        return matmul_variance(feats)
    assert mode == "auto", mode
    alpha = warp.max_abs_alpha(Hm, h)
    return jax.lax.cond(alpha <= alpha_max, matmul_variance,
                        gather_variance, feats)


def hypothesis_point_variance(pts_world: jnp.ndarray, feats: jnp.ndarray,
                              src_idx: jnp.ndarray, src_mask: jnp.ndarray,
                              rotmats: jnp.ndarray, tvecs: jnp.ndarray,
                              K: jnp.ndarray,
                              img_size: Tuple[int, int]) -> jnp.ndarray:
    """Variance feature at arbitrary 3D points (PointFlow / scene pointcloud).

    Covers the reference's re-projection variance blocks
    (`mv3d/lightningmodel.py:146-169` and `:207-229`).
    pts_world: [R, P, 3] points owned by ref view r.
    Returns [R, P, C] fp32 variance features.
    """
    P_all = camera.projection_matrix(K, rotmats, tvecs)
    var, _ = _source_variance(pts_world, feats, src_idx, src_mask, P_all,
                              img_size)
    return var


def hypothesis_patch_variance(pts_hyp: jnp.ndarray, feats: jnp.ndarray,
                              src_idx: jnp.ndarray, src_mask: jnp.ndarray,
                              rotmats: jnp.ndarray, tvecs: jnp.ndarray,
                              K: jnp.ndarray,
                              img_size: Tuple[int, int]) -> jnp.ndarray:
    """Fast-path variance over depth-hypothesis fans: one 4x4-patch gather
    per (pixel, source) serves every hypothesis of that pixel.

    pts_hyp: [R, Hh, P, 3] — the Hh hypotheses of each of P pixels (fan
    along the ref ray, `mv3d/subnetworks/refinement.py:16-44` /
    `run_pointflow`).  Returns [R, Hh, P, C] fp32 — same contract as
    `hypothesis_point_variance` on the reshaped points.

    Exactness: identical to the quad path whenever each hypothesis's
    bilinear anchor is within +-1 texel of the center hypothesis's (the
    epipolar-span condition, see `pack_bilinear_patches`); otherwise the
    sample clamps to the patch edge.  Quality-gated op-mix change
    (tools/fastpath_gate.py), OFF in the strict-parity path.
    """
    from tdvnet.ops.sampling import (pack_bilinear_patches,
                                     patch_sample_hypotheses_batched)

    R, Hh, P, _ = pts_hyp.shape
    S = src_idx.shape[1]
    Hf, Wf, C = feats.shape[1:]
    H, W = img_size
    scale = jnp.array([(Wf - 1.0) / (W - 1.0), (Hf - 1.0) / (H - 1.0)],
                      dtype=jnp.float32)
    cnt = jnp.maximum(jnp.sum(src_mask.astype(jnp.float32), axis=1), 1.0)
    P_all = camera.projection_matrix(K, rotmats, tvecs)
    patches = jax.vmap(pack_bilinear_patches)(feats)
    c_h = Hh // 2
    flat = pts_hyp.reshape(R, Hh * P, 3)

    @jax.checkpoint
    def body(carry, s):
        acc, acc_sq = carry
        idx = src_idx[:, s]                              # [R]
        xy, _ = camera.project_points(flat, P_all[idx])
        xy = (xy * scale).reshape(R, Hh, P, 2)
        f = patch_sample_hypotheses_batched(
            patches[idx], xy[:, c_h], xy, (Hf, Wf))      # [R, Hh, P, C]
        m = src_mask[:, s].astype(jnp.float32)[:, None, None, None]
        return (acc + f * m, acc_sq + f * f * m), None

    init = (jnp.zeros((R, Hh, P, C), jnp.float32),
            jnp.zeros((R, Hh, P, C), jnp.float32))
    (acc, acc_sq), _ = jax.lax.scan(body, init, jnp.arange(S))
    denom = cnt[:, None, None, None]
    mean = acc / denom
    return acc_sq / denom - mean * mean
