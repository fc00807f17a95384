"""TSDF fusion — vectorized JAX scan over frames.

Replaces the reference's three TSDF integrators with a single device op:
- the live Atlas-style tensor integrator (`mv3d/eval/tsdf_atlas.py:341-447`),
- the dead PyCUDA inline kernel (`mv3d/eval/tsdf_andyzheng.py:69-143`),
- NeuralRecon's PyCUDA GT generator (`baselines/neuralrecon/tools/...`).

Semantics match `tsdf_atlas.TSDFFusion.integrate`: project every voxel
center into the frame (rounded pixel), sdf = (sampled_depth - voxel_z) /
trunc_margin clamped to max 1; voxels with sdf > -1 and valid projection
accumulate tsdf += sdf, weight += 1; `finalize` divides by weight.  Color
accumulates the same way.  The whole integration is one `lax.scan` over
frames — no per-frame host round trips.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class TSDFVolume(NamedTuple):
    tsdf: jnp.ndarray      # [V] accumulated sdf (divide by weight to read)
    weight: jnp.ndarray    # [V]
    color: jnp.ndarray     # [V, 3]
    origin: jnp.ndarray    # [3]
    voxel_size: float
    dims: Tuple[int, int, int]


def _voxel_world_coords(dims, voxel_size, origin):
    nx, ny, nz = dims
    ii, jj, kk = jnp.meshgrid(jnp.arange(nx), jnp.arange(ny), jnp.arange(nz),
                              indexing="ij")
    coords = jnp.stack([ii, jj, kk], axis=-1).reshape(-1, 3)
    return coords.astype(jnp.float32) * voxel_size + origin[None, :]


@functools.partial(jax.jit, static_argnames=("dims", "voxel_size",
                                             "trunc_ratio"))
def integrate_frames(depths: jnp.ndarray, colors: jnp.ndarray,
                     projections: jnp.ndarray, origin: jnp.ndarray,
                     dims: Tuple[int, int, int], voxel_size: float,
                     trunc_ratio: float = 3.0,
                     init: Optional[Tuple[jnp.ndarray, ...]] = None):
    """Integrate a stack of frames into a TSDF.

    depths: [N, H, W]; colors: [N, H, W, 3]; projections: [N, 3, 4]
    (K @ [R|t] world→pixel).  Returns (tsdf [V], weight [V], color [V, 3]).
    """
    N, H, W = depths.shape
    world = _voxel_world_coords(dims, voxel_size, origin)      # [V, 3]
    trunc = voxel_size * trunc_ratio
    V = world.shape[0]

    def body(carry, i):
        tsdf, weight, color = carry
        P = projections[i]
        cam = jnp.einsum("ij,vj->vi", P[:, :3], world,
                         precision=jax.lax.Precision.HIGHEST) + P[:, 3]
        pz = cam[:, 2]
        px = jnp.round(cam[:, 0] / pz).astype(jnp.int32)
        py = jnp.round(cam[:, 1] / pz).astype(jnp.int32)
        inb = (px >= 0) & (px < W) & (py >= 0) & (py < H) & (pz > 0)
        pxc = jnp.clip(px, 0, W - 1)
        pyc = jnp.clip(py, 0, H - 1)
        d = depths[i][pyc, pxc]
        rgb = colors[i][pyc, pxc]
        valid = inb & (d > 0)
        sdf = jnp.minimum((d - pz) / trunc, 1.0)
        valid = valid & (sdf > -1.0)
        vf = valid.astype(jnp.float32)
        return (tsdf + sdf * vf, weight + vf,
                color + rgb * vf[:, None]), None

    if init is None:
        init = (jnp.zeros(V, jnp.float32), jnp.zeros(V, jnp.float32),
                jnp.zeros((V, 3), jnp.float32))
    (tsdf, weight, color), _ = jax.lax.scan(body, init, jnp.arange(N))
    return tsdf, weight, color


def finalize(tsdf, weight, color, origin, dims, voxel_size) -> TSDFVolume:
    """Normalize accumulators; unobserved voxels get tsdf = 1 (empty)."""
    w = jnp.maximum(weight, 1e-8)
    vals = jnp.where(weight > 0, tsdf / w, 1.0)
    cols = jnp.where(weight[:, None] > 0, color / w[:, None], 0.0)
    return TSDFVolume(tsdf=vals, weight=weight, color=cols,
                      origin=jnp.asarray(origin), voxel_size=voxel_size,
                      dims=tuple(dims))


def compute_bounds(pts: np.ndarray, quantile: float = 0.995,
                   margin: float = 1.5) -> Tuple[np.ndarray, np.ndarray]:
    """Robust volume bounds from a point set (reference
    `processresults.py:102-105`: quantile bounds +- margin)."""
    lo = np.quantile(pts, 1 - quantile, axis=0) - margin
    hi = np.quantile(pts, quantile, axis=0) + margin
    return lo.astype(np.float32), hi.astype(np.float32)


def fuse_scene(depths: np.ndarray, colors: np.ndarray,
               projections: np.ndarray, voxel_size: float = 0.04,
               trunc_ratio: float = 3.0, quantile: float = 0.995,
               margin: float = 1.5, frame_batch: int = 100,
               max_dim: int = 416) -> TSDFVolume:
    """End-to-end TSDF fusion of a scene with automatic bounds.

    Bounds come from back-projecting the depth maps (quantile + margin like
    the reference); the volume is capped at max_dim voxels per axis.
    """
    N, H, W = depths.shape
    # bounds from sparse back-projection on host
    pts_all = []
    for i in range(0, N, frame_batch):
        d = jnp.asarray(depths[i:i + frame_batch])
        P = projections[i:i + frame_batch]
        # decompose P = K[R|t] not needed: invert full projective transform
        # by lifting to 4x4
        P4 = np.concatenate([P, np.tile(np.array([[[0, 0, 0, 1.0]]],
                                                 np.float32),
                                        (P.shape[0], 1, 1))], axis=1)
        Pinv = np.linalg.inv(P4)
        ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        stride = 4
        xs, ys = xs[::stride, ::stride], ys[::stride, ::stride]
        dd = np.asarray(d)[:, ::stride, ::stride]
        w_h = 1.0 / np.maximum(dd, 1e-9)
        pix = np.stack([np.broadcast_to(xs, dd.shape),
                        np.broadcast_to(ys, dd.shape),
                        np.ones_like(dd), w_h], axis=1)   # [B, 4, h, w]
        pix = pix.reshape(pix.shape[0], 4, -1)
        p = np.einsum("nij,njk->nik", Pinv, pix)
        with np.errstate(divide="ignore", invalid="ignore"):
            p = p[:, :3] / p[:, 3:]
        mask = (dd.reshape(dd.shape[0], -1) > 0)
        pts_all.append(p.transpose(0, 2, 1)[mask])
    pts_all = np.concatenate(pts_all, axis=0)
    pts_all = pts_all[np.isfinite(pts_all).all(axis=1)]
    if pts_all.shape[0] == 0:
        # all-empty depth maps (e.g. an untrained method renders nothing):
        # integrate over a minimal unit volume -> empty mesh, not a crash
        pts_all = np.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]], np.float32)
    lo, hi = compute_bounds(pts_all, quantile, margin)
    dims = np.minimum(np.ceil((hi - lo) / voxel_size).astype(int), max_dim)
    dims = tuple(int(x) for x in np.maximum(dims, 8))

    acc = None
    for i in range(0, N, frame_batch):
        out = integrate_frames(jnp.asarray(depths[i:i + frame_batch]),
                               jnp.asarray(colors[i:i + frame_batch],
                                           jnp.float32),
                               jnp.asarray(projections[i:i + frame_batch]),
                               jnp.asarray(lo), dims, float(voxel_size),
                               float(trunc_ratio), init=acc)
        acc = out
    return finalize(*acc, origin=lo, dims=dims, voxel_size=voxel_size)
