"""Multi-view consistency point-cloud fusion — fully vectorized JAX.

Replaces BOTH of the reference's fusion paths with one device op:
- the external `fusibile` CUDA binary (`mv3d/eval/pointcloudfusion_gipuma.py:
  134-153`, shelled out via os.system), and
- the "**very** slow" per-ref python-loop torch fallback
  (`mv3d/eval/pointcloudfusion_custom.py:10-116`).

Semantics follow the torch fallback exactly (same thresholds/averaging):
for every pixel of every ref view, back-project at predicted depth, reproject
into every other view, nearest-sample that view's predicted depth, count
views with |z_reproj - z_sampled| < z_thresh; keep pixels seen consistently
by >= n_consistent views; the fused point is the mean of the ref point and
the consistent views' back-projected sample points.

The all-pairs sweep is embarrassingly parallel over (ref, src): we scan over
src views holding [C, P] chunks of refs on device, so memory is O(refs_chunk
* pixels) regardless of scene length.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tdvnet.ops import camera


def _nearest_sample_depth(depth: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor depth lookup with zeros padding.

    depth: [H, W]; xy: [P, 2] continuous pixel coords (align-corners grid,
    matching grid_sample(mode='nearest', align_corners=True): round to the
    nearest pixel center).
    """
    H, W = depth.shape
    xi = jnp.round(xy[:, 0]).astype(jnp.int32)
    yi = jnp.round(xy[:, 1]).astype(jnp.int32)
    inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
    vals = depth[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
    return jnp.where(inb, vals, 0.0)


@functools.partial(jax.jit, static_argnames=("z_thresh", "n_consistent"))
def _fuse_chunk(ref_depth, ref_R, ref_t, ref_K, all_depth, all_R, all_t,
                all_K, self_idx, z_thresh: float, n_consistent: int):
    """Fuse one chunk of C ref views against all N views.

    ref_*: [C, ...]; all_*: [N, ...]; self_idx: [C] index of each ref in the
    all_* arrays (excluded from its own consistency count).
    Returns (pts_avg [C, P, 3], valid [C, P]).
    """
    C, H, W = ref_depth.shape
    P = H * W
    N = all_depth.shape[0]

    pts = camera.backproject_grid(ref_depth, ref_K, ref_R, ref_t, (H, W))

    def body(carry, s):
        n_valid, pts_sum = carry
        Rs, ts, Ks, ds = all_R[s], all_t[s], all_K[s], all_depth[s]
        P_mat = camera.projection_matrix(Ks[None], Rs[None], ts[None])[0]
        xyz = jnp.einsum("ij,cpj->cpi", P_mat[:, :3], pts,
                         precision=jax.lax.Precision.HIGHEST) + P_mat[:, 3]
        z = xyz[..., 2]
        xy = xyz[..., :2] / z[..., None]
        z_samp = jax.vmap(lambda q: _nearest_sample_depth(ds, q))(xy)
        valid = ((jnp.abs(z - z_samp) < z_thresh)
                 & (xy[..., 0] >= 0) & (xy[..., 0] <= W - 1)
                 & (xy[..., 1] >= 0) & (xy[..., 1] <= H - 1)
                 & (z > 1e-4) & (z_samp > 0)
                 & (self_idx != s)[:, None])
        # back-project the sampled depth at the reprojected pixel
        K_inv = jnp.linalg.inv(Ks)
        ray = jnp.concatenate([xy, jnp.ones_like(z[..., None])], axis=-1)
        p_cam = jnp.einsum("ij,cpj->cpi", K_inv, ray,
                           precision=jax.lax.Precision.HIGHEST) \
            * z_samp[..., None]
        p_world = jnp.einsum("ji,cpj->cpi", Rs, p_cam - ts[None, None, :],
                             precision=jax.lax.Precision.HIGHEST)
        p_world = jnp.where(valid[..., None], p_world, 0.0)
        return (n_valid + valid.astype(jnp.int32),
                pts_sum + p_world), None

    init = (jnp.zeros((C, P), jnp.int32), jnp.zeros((C, P, 3), jnp.float32))
    (n_valid, pts_sum), _ = jax.lax.scan(body, init, jnp.arange(N))

    keep = n_valid >= n_consistent
    pts_avg = (pts + pts_sum) / (n_valid + 1).astype(jnp.float32)[..., None]
    # drop zero-depth ref pixels
    keep = keep & (ref_depth.reshape(C, P) > 0)
    return pts_avg, keep


def fuse_point_cloud(depth_preds: np.ndarray, images: np.ndarray,
                     rotmats: np.ndarray, tvecs: np.ndarray, K: np.ndarray,
                     z_thresh: float = 0.01, n_consistent: int = 3,
                     ref_chunk: int = 16) -> Tuple[np.ndarray, np.ndarray]:
    """Fuse a whole scene's depth maps into a consistent point cloud.

    depth_preds: [N, H, W]; images: [N, H, W, 3] (uint8 or float);
    rotmats/tvecs/K: world→cam cameras at depth resolution.
    Returns (points [M, 3], colors [M, 3]) as numpy arrays (host side).
    """
    N, H, W = depth_preds.shape
    all_depth = jnp.asarray(depth_preds, jnp.float32)
    all_R = jnp.asarray(rotmats, jnp.float32)
    all_t = jnp.asarray(tvecs, jnp.float32)
    all_K = jnp.asarray(K, jnp.float32)

    pts_out, rgb_out = [], []
    for c0 in range(0, N, ref_chunk):
        c1 = min(c0 + ref_chunk, N)
        idx = jnp.arange(c0, c1)
        pts_avg, keep = _fuse_chunk(all_depth[c0:c1], all_R[c0:c1],
                                    all_t[c0:c1], all_K[c0:c1], all_depth,
                                    all_R, all_t, all_K, idx,
                                    z_thresh=float(z_thresh),
                                    n_consistent=int(n_consistent))
        pts_np = np.asarray(pts_avg).reshape(-1, 3)
        keep_np = np.asarray(keep).reshape(-1)
        rgb = np.asarray(images[c0:c1]).reshape(-1, 3)
        pts_out.append(pts_np[keep_np])
        rgb_out.append(rgb[keep_np])
    return np.concatenate(pts_out, axis=0), np.concatenate(rgb_out, axis=0)
