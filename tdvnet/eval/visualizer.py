"""Reconstruction inspection without a GUI stack.

The reference visualizer is an interactive Open3D window
(`mv3d/eval/visualizer.py`); this environment has no display/Open3D, so this
renders side-by-side turntable views of each method's reconstruction (plus
the GT mesh) to PNG contact sheets using the native rasterizer + matplotlib.
"""
from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np

from tdvnet.ops import ply, raster


def _orbit_poses(center: np.ndarray, radius: float, height: float,
                 n: int = 4) -> np.ndarray:
    poses = []
    for i in range(n):
        ang = 2 * np.pi * i / n
        c = center + np.array([radius * np.cos(ang), radius * np.sin(ang),
                               height])
        fwd = center - c
        fwd = fwd / np.linalg.norm(fwd)
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right) + 1e-12
        down = np.cross(fwd, right)
        R = np.stack([right, down, fwd], axis=0)
        P = np.eye(4, dtype=np.float32)
        P[:3, :3] = R
        P[:3, 3] = -R @ c
        poses.append(P)
    return np.stack(poses)


def render_turntable(verts: np.ndarray, faces: np.ndarray,
                     img_size: Tuple[int, int] = (240, 320),
                     n_views: int = 4) -> np.ndarray:
    """Depth renders of a mesh from an orbit; returns [n, H, W]."""
    center = verts.mean(axis=0)
    extent = float(np.linalg.norm(verts.max(0) - verts.min(0)))
    poses = _orbit_poses(center, 0.9 * extent, 0.4 * extent, n_views)
    H, W = img_size
    f = 0.8 * W
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    K = np.repeat(K[None], n_views, 0)
    return raster.render_scene_depths(verts, faces, poses, K, img_size)


def compare_methods(scene_name: str, mesh_paths: Dict[str, str],
                    out_png: str, img_size: Tuple[int, int] = (240, 320)):
    """Contact sheet: one row per method, one column per orbit view."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = []
    labels = []
    for name, path in mesh_paths.items():
        if not os.path.exists(path):
            continue
        verts, faces, _ = ply.read_ply(path)
        if faces is None:
            continue
        rows.append(render_turntable(verts, faces, img_size))
        labels.append(name)
    if not rows:
        return None
    n_views = rows[0].shape[0]
    fig, axes = plt.subplots(len(rows), n_views,
                             figsize=(3 * n_views, 2.4 * len(rows)),
                             squeeze=False)
    for r, (depths, label) in enumerate(zip(rows, labels)):
        for c in range(n_views):
            d = depths[c]
            axes[r][c].imshow(np.where(d == 0, np.nan, d), cmap="viridis")
            axes[r][c].axis("off")
        axes[r][0].set_title(label, loc="left", fontsize=10)
    fig.suptitle(scene_name)
    fig.tight_layout()
    fig.savefig(out_png, dpi=110)
    plt.close(fig)
    return out_png


def visualize_results(save_dirs: Dict[str, str], out_dir: str,
                      pcd_pattern: str = "fused_0.010_3v_masked.ply"):
    """For every scene present in the given method result dirs, write a
    comparison sheet (methods x views) under out_dir."""
    os.makedirs(out_dir, exist_ok=True)
    first = next(iter(save_dirs.values()))
    scenes = sorted(os.listdir(os.path.join(first, "scenes")))
    outs = []
    for s in scenes:
        paths = {}
        for method, d in save_dirs.items():
            for candidate in ("trimmed_mesh_masked.ply", "mesh.ply",
                              pcd_pattern):
                p = os.path.join(d, "scenes", s, candidate)
                if os.path.exists(p):
                    paths[method] = p
                    break
        out = compare_methods(s, paths, os.path.join(out_dir, f"{s}.png"))
        if out:
            outs.append(out)
    return outs
