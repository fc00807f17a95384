"""Mesh → per-view depth rendering.

Python surface over the native C++ z-buffer rasterizer
(`native/rasterizer.cpp`), compiled on demand with g++ and bound via ctypes;
falls back to a vectorized numpy rasterizer when no compiler is available.
Replaces the reference's pyrender/OpenGL renderer
(`mv3d/eval/meshtodepth.py:6-58`); used for GT-visibility masking, depth
evaluation of volumetric methods, and mesh trimming.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "rasterizer.cpp")
_SO = os.path.join(_REPO_ROOT, "native", "librasterizer.so")

_lib = None
_lib_tried = False


def _load_native():
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
                           check=True, capture_output=True)
        lib = ctypes.CDLL(_SO)
        lib.rasterize_depth.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def _numpy_rasterize(verts_cam, faces, K, H, W):
    """Vectorized-per-triangle fallback (same math as the native path)."""
    depth = np.zeros((H, W), np.float32)
    near = 1e-4
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    tris = verts_cam[faces]                       # [T, 3, 3]
    keep = (tris[:, :, 2] > near).all(axis=1)     # fallback: drop clipped
    tris = tris[keep]
    for tri in tris:
        w = 1.0 / tri[:, 2]
        px = fx * tri[:, 0] * w + cx
        py = fy * tri[:, 1] * w + cy
        x0 = max(0, int(np.floor(px.min())))
        x1 = min(W - 1, int(np.ceil(px.max())))
        y0 = max(0, int(np.floor(py.min())))
        y1 = min(H - 1, int(np.ceil(py.max())))
        if x0 > x1 or y0 > y1:
            continue
        ax, ay = px[1] - px[0], py[1] - py[0]
        bx, by = px[2] - px[0], py[2] - py[0]
        det = ax * by - ay * bx
        if abs(det) < 1e-12:
            continue
        xs, ys = np.meshgrid(np.arange(x0, x1 + 1), np.arange(y0, y1 + 1))
        qx = xs - px[0]
        qy = ys - py[0]
        l1 = (qx * by - qy * bx) / det
        l2 = (ax * qy - ay * qx) / det
        l0 = 1.0 - l1 - l2
        inside = (l0 >= -1e-6) & (l1 >= -1e-6) & (l2 >= -1e-6)
        wz = l0 * w[0] + l1 * w[1] + l2 * w[2]
        inside &= wz > 0
        z = np.where(inside, 1.0 / np.maximum(wz, 1e-12), np.inf)
        sub = depth[y0:y1 + 1, x0:x1 + 1]
        old = np.where(sub == 0, np.inf, sub)
        depth[y0:y1 + 1, x0:x1 + 1] = np.where(z < old, z, sub)
    return depth


def render_depth(verts: np.ndarray, faces: np.ndarray, K: np.ndarray,
                 pose_w2c: np.ndarray, img_size: Tuple[int, int]
                 ) -> np.ndarray:
    """Render one depth map.  pose_w2c: [4,4] world→cam; K: [3,3]."""
    H, W = img_size
    lib = _load_native()
    if lib is not None:
        v = np.ascontiguousarray(verts, np.float32)
        f = np.ascontiguousarray(faces, np.int32)
        k = np.ascontiguousarray(K, np.float32)
        p = np.ascontiguousarray(pose_w2c, np.float32)
        out = np.zeros((H, W), np.float32)
        lib.rasterize_depth(
            v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(v),
            f.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), len(f),
            k.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            p.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            H, W, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out
    cam = verts @ pose_w2c[:3, :3].T + pose_w2c[:3, 3]
    return _numpy_rasterize(cam, faces, K, H, W)


def render_scene_depths(verts: np.ndarray, faces: np.ndarray,
                        poses_w2c: np.ndarray, K: np.ndarray,
                        img_size: Tuple[int, int] = (480, 640)) -> np.ndarray:
    """Render all views (reference `meshtodepth.process_scene`,
    `meshtodepth.py:51-58`).  poses_w2c: [N,4,4]; K: [N,3,3]."""
    out = np.empty((poses_w2c.shape[0], *img_size), np.float32)
    for i in range(poses_w2c.shape[0]):
        out[i] = render_depth(verts, faces, K[i], poses_w2c[i], img_size)
    return out
