"""Camera geometry: projection, back-projection, plane-sweep frustum points.

TPU-native redesign of the reference geometry utilities
(`mv3d/utils.py:67-108` and the inline projection blocks in
`mv3d/lightningmodel.py:132-174,187-242`, `mv3d/subnetworks/mvsnet.py:187-206`):
everything is a pure jnp function over batched fixed-shape arrays, fp32.

Conventions (identical to the reference):
- ``rotmat`` R is world→camera rotation, ``tvec`` t the world→camera
  translation: ``x_cam = R @ x_world + t``.
- Pixel grids sample ``linspace(0, W-1, w_out)`` — i.e. a coarse h×w grid
  spans the *full* image including both edge pixel centers.
- Projections divide by ``|z| + 1e-8`` (sign-preserving via abs like the
  reference, which guards div/0 the same way).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_PREC = jax.lax.Precision.HIGHEST

EPS_Z = 1e-8


def build_img_grid(img_size: Tuple[int, int], plane_size: Tuple[int, int]) -> jnp.ndarray:
    """Homogeneous pixel coordinates of a coarse grid over the image.

    Returns [h*w, 3] float32 (x, y, 1) rows; matches `mv3d/utils.py:67-77`.
    """
    H, W = img_size
    h, w = plane_size
    xs = jnp.linspace(0.0, W - 1.0, w, dtype=jnp.float32)
    ys = jnp.linspace(0.0, H - 1.0, h, dtype=jnp.float32)
    xx, yy = jnp.meshgrid(xs, ys)  # [h, w] each, x varies along axis 1
    ones = jnp.ones_like(xx)
    return jnp.stack([xx, yy, ones], axis=-1).reshape(-1, 3)


def projection_matrix(K: jnp.ndarray, rotmat: jnp.ndarray, tvec: jnp.ndarray) -> jnp.ndarray:
    """P = K @ [R | t], shape [..., 3, 4]."""
    Rt = jnp.concatenate([rotmat, tvec[..., None]], axis=-1)
    return jnp.einsum("...ij,...jk->...ik", K, Rt, precision=_PREC)


def project_points(pts_world: jnp.ndarray, P: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Project world points with P=[K|Kt].

    pts_world: [..., N, 3]; P: [..., 3, 4].
    Returns (xy [..., N, 2] pixel coords, z [..., N] camera depth).
    """
    xyz = jnp.einsum("...ij,...nj->...ni", P[..., :3], pts_world, precision=_PREC) + P[..., None, :, 3]
    z = xyz[..., 2]
    denom = jnp.abs(z) + EPS_Z
    xy = xyz[..., :2] / denom[..., None]
    return xy, z


def backproject_grid(depth: jnp.ndarray, K: jnp.ndarray, rotmat: jnp.ndarray,
                     tvec: jnp.ndarray, img_size: Tuple[int, int]) -> jnp.ndarray:
    """Back-project per-pixel depths to world points.

    depth: [N, h, w]; K/rotmat: [N, 3, 3]; tvec: [N, 3].
    Returns world points [N, h*w, 3] (row-major y, x order).
    Mirrors `mv3d/lightningmodel.py:136-144`.
    """
    n, h, w = depth.shape
    grid = build_img_grid(img_size, (h, w))  # [h*w, 3]
    K_inv = jnp.linalg.inv(K)
    rays = jnp.einsum("nij,pj->npi", K_inv, grid, precision=_PREC)          # [N, P, 3] cam rays
    pts_cam = rays * depth.reshape(n, h * w, 1)
    return jnp.einsum("nji,npj->npi", rotmat, pts_cam - tvec[:, None, :], precision=_PREC)


def plane_sweep_points(depth_start: float, depth_interval: float, n_planes: int,
                       rotmat: jnp.ndarray, tvec: jnp.ndarray, K: jnp.ndarray,
                       img_size: Tuple[int, int],
                       plane_size: Tuple[int, int]) -> jnp.ndarray:
    """World-space frustum points of a fronto-parallel plane sweep.

    Returns [N, D*h*w, 3] with plane-major ordering (d, y, x) — the layout the
    reference flattens to (`mv3d/utils.py:86-108`).
    """
    n = rotmat.shape[0]
    h, w = plane_size
    grid = build_img_grid(img_size, plane_size)            # [h*w, 3]
    depth_end = depth_start + (n_planes - 1) * depth_interval
    depths = jnp.linspace(depth_start, depth_end, n_planes, dtype=jnp.float32)
    # [D, h*w, 3] pixel-homogeneous scaled by depth
    pts_img = grid[None, :, :] * depths[:, None, None]
    pts_img = pts_img.reshape(-1, 3)                       # [D*h*w, 3]
    K_inv = jnp.linalg.inv(K)
    pts_cam = jnp.einsum("nij,pj->npi", K_inv, pts_img, precision=_PREC)    # [N, D*h*w, 3]
    return jnp.einsum("nji,npj->npi", rotmat, pts_cam - tvec[:, None, :], precision=_PREC)


def camera_center(rotmat: jnp.ndarray, tvec: jnp.ndarray) -> jnp.ndarray:
    """World-space camera center c = -R^T t, shape [..., 3]."""
    return -jnp.einsum("...ji,...j->...i", rotmat, tvec, precision=_PREC)


def world_to_cam(pose: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Convert a cam→world 4x4 pose into (R, t) world→camera.

    R = P[:3,:3]^T, t = -R @ P[:3,3] (reference `mv3d/dsets/dataset.py:214-215`).
    """
    R = jnp.swapaxes(pose[..., :3, :3], -1, -2)
    t = -jnp.einsum("...ij,...j->...i", R, pose[..., :3, 3], precision=_PREC)
    return R, t


def normalize_pixel_coords(xy: jnp.ndarray, img_size: Tuple[int, int]) -> jnp.ndarray:
    """Map pixel coords to [-1, 1] with align-corners semantics."""
    H, W = img_size
    x = xy[..., 0] / (W - 1.0) * 2.0 - 1.0
    y = xy[..., 1] / (H - 1.0) * 2.0 - 1.0
    return jnp.stack([x, y], axis=-1)


def scale_intrinsics(K: jnp.ndarray, sx: float, sy: float) -> jnp.ndarray:
    """Rescale intrinsics for a resized image (row 0 *= sx, row 1 *= sy)."""
    scale = jnp.array([[sx], [sy], [1.0]], dtype=K.dtype)
    return K * scale
