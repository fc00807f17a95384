"""Dataset preprocessing into the `info.json` contract.

Behavior-parity rewrites of the reference preprocessors
(`data_preprocess/preprocess_{scannet,icl_nuim,tum_rgbd}.py`), emitting the
same byte-compatible `info.json` so either framework can consume the output:

- ScanNet: homography-warp color to the depth grid, skip non-finite poses,
  copy the GT mesh (`preprocess_scannet.py:36-134`);
- ICL-NUIM: freiburg pose parsing, axis-convention fix, depth /5000→mm,
  GT mesh by TSDF-fusing the GT depths (`preprocess_icl_nuim.py:64-206`);
- TUM-RGBD: timestamp association of color/depth/pose, same GT-mesh
  generation (`preprocess_tum_rgbd.py:129-200`).
"""
from __future__ import annotations

import glob
import json
import os
import shutil
from typing import Optional

import numpy as np

ICL_K = np.array([[481.20, 0, 319.50],
                  [0, -480.00, 239.50],
                  [0, 0, 1]])
TUM_K = np.array([[525.0, 0, 319.5],
                  [0, 525.0, 239.5],
                  [0, 0, 1]])


def warp_color_to_depth(color: np.ndarray, depth_hw, K_color: np.ndarray,
                        K_depth: np.ndarray) -> np.ndarray:
    """Resample a color image onto the depth camera's pixel grid via the
    intrinsics homography (nearest, zeros) — `preprocess_scannet.py:36-70`."""
    nh, nw = depth_hw
    H = K_color @ np.linalg.inv(K_depth)
    xs, ys = np.meshgrid(np.arange(nw, dtype=np.float64),
                         np.arange(nh, dtype=np.float64))
    grid = np.stack([xs, ys, np.ones_like(xs)], axis=-1) @ H.T
    u = grid[..., 0] / (grid[..., 2] + 1e-8)
    v = grid[..., 1] / (grid[..., 2] + 1e-8)
    ui = np.round(u).astype(np.int64)
    vi = np.round(v).astype(np.int64)
    oh, ow = color.shape[:2]
    inb = (ui >= 0) & (ui < ow) & (vi >= 0) & (vi < oh)
    out = np.zeros((nh, nw, 3), color.dtype)
    out[inb] = color[vi[inb], ui[inb]]
    return out


def quat_to_rotmat(q: np.ndarray) -> np.ndarray:
    """Rotation matrix from (x, y, z, w) quaternion."""
    x, y, z, w = q / np.linalg.norm(q)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def _fix_pose_axis(P: np.ndarray) -> np.ndarray:
    """ICL-NUIM axis convention: pre-rotate pi/2 about x
    (`preprocess_icl_nuim.py:64-73`)."""
    c, s = 0.0, 1.0  # cos/sin of pi/2
    R = np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float64)
    F = np.eye(4)
    F[:3, :3] = R
    return F @ P


def generate_gt_mesh(scene_dir: str, voxel_size: float = 0.02,
                     img_batch: int = 20, trunc_ratio: float = 3.0):
    """GT mesh by TSDF-fusing a scene's GT depth maps
    (`preprocess_icl_nuim.py:75-137`).  Returns (verts, faces)."""
    import cv2

    from tdvnet.ops import marching, tsdf

    info = json.load(open(os.path.join(scene_dir, "info.json")))
    K = np.asarray(info["intrinsics"], np.float32)
    frames = info["frames"]
    depths, Ps = [], []
    for f in frames:
        d = cv2.imread(f["filename_depth"], cv2.IMREAD_ANYDEPTH)
        d = d.astype(np.float32) / 1000.0
        d[~np.isfinite(d)] = 0.0
        depths.append(d)
        pose = np.asarray(f["pose"], np.float64)
        R = pose[:3, :3].T
        t = -R @ pose[:3, 3]
        Ps.append((K @ np.concatenate([R, t[:, None]], 1)).astype(np.float32))
    depths = np.stack(depths)
    colors = np.zeros((*depths.shape, 3), np.float32)
    vol = tsdf.fuse_scene(depths, colors, np.stack(Ps),
                          voxel_size=voxel_size, trunc_ratio=trunc_ratio,
                          frame_batch=img_batch)
    return marching.tsdf_to_mesh(vol)


def preprocess_scannet_scene(src: str, dst: str) -> None:
    import cv2

    name = os.path.basename(src.rstrip("/"))
    os.makedirs(os.path.join(dst, "color"), exist_ok=True)
    os.makedirs(os.path.join(dst, "depth"), exist_ok=True)
    data = {"scene": name, "path": dst, "frames": []}

    mesh_src = os.path.join(src, f"{name}_vh_clean_2.ply")
    mesh_dst = os.path.join(dst, f"{name}_vh_clean_2.ply")
    if os.path.exists(mesh_src):
        shutil.copy(mesh_src, mesh_dst)
    data["gt_mesh"] = mesh_dst

    K_color = np.loadtxt(os.path.join(src, "intrinsic",
                                      "intrinsic_color.txt"))[:3, :3]
    K_depth = np.loadtxt(os.path.join(src, "intrinsic",
                                      "intrinsic_depth.txt"))[:3, :3]
    data["intrinsics"] = K_depth.tolist()

    frames = sorted((f for f in os.listdir(os.path.join(src, "color"))
                     if f.endswith(".jpg")),
                    key=lambda x: int(x.split(".")[0]))
    for fr in frames:
        fid = int(fr.split(".")[0])
        pose = np.loadtxt(os.path.join(src, "pose", f"{fid}.txt"))
        if not np.all(np.isfinite(pose)):
            continue
        color = cv2.imread(os.path.join(src, "color", fr))
        depth = cv2.imread(os.path.join(src, "depth", f"{fid}.png"),
                           cv2.IMREAD_ANYDEPTH)
        c_dst = os.path.join(dst, "color", f"{fid}.jpg".zfill(9))
        d_dst = os.path.join(dst, "depth", f"{fid}.png".zfill(9))
        if color.shape[:2] != depth.shape[:2]:
            color = warp_color_to_depth(color, depth.shape, K_color, K_depth)
        if not os.path.exists(c_dst):
            cv2.imwrite(c_dst, color)
        if not os.path.exists(d_dst):
            cv2.imwrite(d_dst, depth)
        data["frames"].append({"filename_color": c_dst,
                               "filename_depth": d_dst,
                               "pose": pose.tolist()})
    json.dump(data, open(os.path.join(dst, "info.json"), "w"))


def preprocess_icl_nuim_scene(scene: str, overwrite_mesh: bool = False) -> None:
    import cv2

    from tdvnet.ops import ply

    name = os.path.basename(scene.rstrip("/"))
    ddir = os.path.join(scene, "depth_processed")
    os.makedirs(ddir, exist_ok=True)
    mesh_file = os.path.join(scene, "gt_mesh.ply")
    data = {"scene": name, "path": scene, "intrinsics": ICL_K.tolist(),
            "gt_mesh": mesh_file, "frames": []}

    assoc = open(os.path.join(scene, "associations.txt")).readlines()
    pose_file = glob.glob(os.path.join(scene, "*.gt.freiburg"))[0]
    poses = {}
    for line in open(pose_file):
        s = line.strip().split(" ")
        poses[s[0]] = np.asarray([float(x) for x in s[1:]])

    for line in assoc:
        s = line.strip().split(" ")
        if s[0] not in poses:
            continue
        pr = poses[s[0]]
        P = np.eye(4)
        P[:3, :3] = quat_to_rotmat(pr[3:])
        P[:3, 3] = pr[:3]
        P = _fix_pose_axis(P)
        if not np.all(np.isfinite(P)):
            continue
        d_src = os.path.join(scene, s[1])
        d_dst = os.path.join(ddir, os.path.basename(d_src))
        if not os.path.exists(d_dst):
            d = cv2.imread(d_src, cv2.IMREAD_ANYDEPTH).astype(np.float64)
            d = d / 5000.0
            d[~np.isfinite(d)] = 0.0
            cv2.imwrite(d_dst, (d * 1000).astype(np.uint16))
        data["frames"].append({"filename_color": os.path.join(scene, s[3]),
                               "filename_depth": d_dst,
                               "pose": P.tolist()})
    json.dump(data, open(os.path.join(scene, "info.json"), "w"))

    if not os.path.exists(mesh_file) or overwrite_mesh:
        verts, faces = generate_gt_mesh(scene)
        ply.write_ply(mesh_file, verts, faces)


def preprocess_tum_rgbd_scene(scene: str, overwrite_mesh: bool = False) -> None:
    import cv2

    from tdvnet.ops import ply

    name = os.path.basename(scene.rstrip("/"))
    ddir = os.path.join(scene, "depth_processed")
    os.makedirs(ddir, exist_ok=True)
    mesh_file = os.path.join(scene, "gt_mesh.ply")
    data = {"scene": name, "path": scene, "intrinsics": TUM_K.tolist(),
            "gt_mesh": mesh_file, "frames": []}

    img_files = sorted(glob.glob(os.path.join(scene, "rgb", "*.png")))
    img_ts = np.loadtxt(os.path.join(scene, "rgb.txt"), usecols=0)
    depth_files = sorted(glob.glob(os.path.join(scene, "depth", "*.png")))
    depth_ts = np.loadtxt(os.path.join(scene, "depth.txt"), usecols=0)
    gt = np.loadtxt(os.path.join(scene, "groundtruth.txt"))
    pose_ts, pose_loc, pose_quat = gt[:, 0], gt[:, 1:4], gt[:, 4:]

    for i, dfile in enumerate(depth_files):
        ts = depth_ts[i]
        ci = int(np.argmin(np.abs(img_ts - ts)))
        pi = int(np.argmin(np.abs(pose_ts - ts)))
        P = np.eye(4)
        P[:3, :3] = quat_to_rotmat(pose_quat[pi])
        P[:3, 3] = pose_loc[pi]
        if not np.all(np.isfinite(P)):
            continue
        d_dst = os.path.join(ddir, os.path.basename(dfile))
        if not os.path.exists(d_dst):
            d = cv2.imread(dfile, cv2.IMREAD_ANYDEPTH).astype(np.float64)
            d = d / 5000.0
            d[~np.isfinite(d)] = 0.0
            cv2.imwrite(d_dst, (d * 1000).astype(np.uint16))
        data["frames"].append({"filename_color": img_files[ci],
                               "filename_depth": d_dst,
                               "pose": P.tolist()})
    json.dump(data, open(os.path.join(scene, "info.json"), "w"))

    if not os.path.exists(mesh_file) or overwrite_mesh:
        verts, faces = generate_gt_mesh(scene)
        ply.write_ply(mesh_file, verts, faces)
