"""Whole-scene evaluation harness.

Counterpart of `mv3d/eval/main.py:15-113`: runs a method callback over every
scene of the selected dataset, caches `preds.npz` per scene (idempotent
re-runs), computes 2D metrics and depth- or volume-3D metrics, and
aggregates.  Any method plugs in through `pred_fn` — the same protocol the
reference's six baselines use (`process_scene(batch, scene, dset, net)`).

pred_fn signature here: pred_fn(views: dict, scene_dir: str, dset: Dataset)
→ either depth maps [R, H, W] (depth=True) or a mesh tuple (verts, faces)
(depth=False).  Optionally return (depth, init_prob, final_prob).
"""
from __future__ import annotations

import concurrent.futures as cf
import os
from typing import Callable, Optional, Sequence

import numpy as np

from tdvnet.config import Config
from tdvnet.data import frameselector, scenelists
from tdvnet.data.dataset import Dataset
from tdvnet.eval import processresults
from tdvnet.ops import ply, raster


def main(save_dirname: str, pred_fn: Callable, cfg: Config,
         depth: bool = True, overwrite: bool = False,
         scenes: Optional[Sequence[str]] = None,
         mask_using_gt_mesh: bool = True, start_idx: int = 0):
    e = cfg.eval
    save_dir = os.path.join(e.save_dir, save_dirname)
    os.makedirs(save_dir, exist_ok=True)

    if scenes is None:
        scenes = scenelists.get_scenes(e.dataset_type, cfg.data)

    selector = frameselector.NextPoseDistSelector(e.pdist, 20)
    dset = Dataset(scenes, selector, None,
                   depth_img_size=e.depth_img_size,
                   img_size=cfg.batch.img_size, augment=False,
                   n_src_on_either_side=e.n_src_on_either_side)

    # scene-level pipelining: the next scene's frames load on a worker
    # thread while the device predicts the current one, and the host-side
    # metric stages (fusion, KD-trees, rasterization) run in the background
    # so the device never idles on host work.  The reference runs these
    # serially (`mv3d/eval/main.py:44-113`).
    load_pool = cf.ThreadPoolExecutor(1)
    metrics_pool = cf.ThreadPoolExecutor(1)
    metric_futs = []

    def _metrics_for(scene, scene_save_dir):
        processresults.process_scene_2d_metrics(scene, scene_save_dir,
                                                overwrite)
        if depth:
            processresults.process_depth_3d_metrics(
                scene, scene_save_dir, e, mask_using_gt_mesh, overwrite)
        else:
            processresults.process_volume_3d_metrics(
                scene, scene_save_dir, e, mask_using_gt_mesh, overwrite)

    views_fut = (None, None)                     # (scene index, future)
    for j, scene in enumerate(scenes[start_idx:]):
        scene_name = os.path.basename(scene)
        print(f"{j + 1 + start_idx} / {len(scenes)}: {scene_name}")
        scene_save_dir = os.path.join(save_dir, "scenes", scene_name)
        os.makedirs(scene_save_dir, exist_ok=True)
        pred_path = os.path.join(scene_save_dir, "preds.npz")

        if not os.path.exists(pred_path) or overwrite:
            idx = j + start_idx
            views = views_fut[1].result() if views_fut[0] == idx \
                else dset.load_views(idx, seed_idx=0)
            if idx + 1 < len(scenes):
                views_fut = (idx + 1,
                             load_pool.submit(dset.load_views, idx + 1,
                                              seed_idx=0))
            k = dset.k
            n_imgs = views["images"].shape[0]
            ref_sel = np.arange(k, n_imgs - k)

            init_prob = final_prob = None
            if depth:
                result = pred_fn(views, scene, dset)
                if isinstance(result, tuple):
                    depth_preds, init_prob, final_prob = result
                else:
                    depth_preds = result
            else:
                verts, faces = pred_fn(views, scene, dset)
                ply.write_ply(os.path.join(scene_save_dir, "mesh.ply"),
                              verts, faces)
                poses = np.repeat(np.eye(4, dtype=np.float32)[None],
                                  n_imgs, 0)
                poses[:, :3, :3] = views["rotmats"]
                poses[:, :3, 3] = views["tvecs"]
                # render at depth_img_size: rescale K from image resolution
                # (the reference silently requires img_size == render size
                # for mesh methods; we scale instead)
                K_r = views["K"][ref_sel].copy()
                K_r[:, 0, :] *= e.depth_img_size[1] / views["images"].shape[2]
                K_r[:, 1, :] *= e.depth_img_size[0] / views["images"].shape[1]
                depth_preds = raster.render_scene_depths(
                    verts, faces, poses[ref_sel], K_r, e.depth_img_size)

            # rescale K to the prediction resolution (ref main.py:74-81)
            old_h, old_w = views["images"].shape[1:3]
            new_h, new_w = depth_preds.shape[-2:]
            K = views["K"][ref_sel].copy()
            K[:, 0, :] *= new_w / old_w
            K[:, 1, :] *= new_h / old_h

            preds = dict(
                scene=scene_name,
                depth_preds=np.asarray(depth_preds, np.float32),
                rotmats=views["rotmats"][ref_sel],
                tvecs=views["tvecs"][ref_sel],
                K=K,
                img_idx=views["img_idx"][ref_sel],
            )
            if init_prob is not None:
                preds["init_prob"] = init_prob
            if final_prob is not None:
                preds["final_prob"] = final_prob
            np.savez(pred_path, **preds)

        metric_futs.append(
            metrics_pool.submit(_metrics_for, scene, scene_save_dir))

    for f in metric_futs:
        f.result()                               # surface worker exceptions
    load_pool.shutdown()
    metrics_pool.shutdown()
    return processresults.calc_avg_metrics(save_dir)


def make_3dvnet_pred_fn(model, variables, cfg: Config, mesh=None,
                        dp: bool = False):
    """The flagship's pred_fn: whole-scene inference.

    Uses the two-dispatch fused driver (`tdvnet.eval.fused_scene`) on a
    single chip; result depths are mm-quantized on fetch (±0.5 mm, far
    below every metric threshold).  Multi-chip options:

    - mesh + dp=True: DP-over-scenes fused eval (`FusedSceneInferenceDP`)
      — mesh-size scenes run as ONE zero-collective SPMD program.  The
      harness asks for one scene at a time, so the pred_fn prefetches the
      next mesh-size scenes through `dset` and serves the group from a
      cache (group boundaries follow harness scene order).
    - mesh + dp=False: spatially-sharded scene volumes (halo-sharded
      U-Net) via the host-chunked `SceneInference` — for scenes whose
      volume exceeds one chip's HBM.
    """
    if mesh is not None and dp:
        from tdvnet.eval.fused_scene import FusedSceneInferenceDP

        inf_dp = FusedSceneInferenceDP(model, variables, cfg, mesh)
        cache: dict = {}

        def pred_fn(views, scene_dir, dset):
            if scene_dir not in cache:
                idx = dset.scene_dirs.index(scene_dir)
                group_dirs = dset.scene_dirs[idx:idx + inf_dp.n_dev]
                group_views = [maybe_drop_u8(views)] + [
                    maybe_drop_u8(dset.load_views(idx + 1 + i, seed_idx=0))
                    for i in range(len(group_dirs) - 1)]
                outs = inf_dp.predict_group(group_views)
                cache.update(zip(group_dirs, outs))
                if inf_dp.last_scene_stats:
                    print(f"  group volume stats ({len(group_dirs)} "
                          f"scenes): {inf_dp.last_scene_stats}")
            return cache.pop(scene_dir)

        return pred_fn

    if mesh is not None:
        from tdvnet.eval.whole_scene import SceneInference

        inf = SceneInference(model, variables, cfg, mesh=mesh)
    else:
        from tdvnet.eval.fused_scene import FusedSceneInference

        inf = FusedSceneInference(model, variables, cfg)

    def pred_fn(views, scene_dir, dset):
        views = maybe_drop_u8(views)
        out = inf.predict_scene(views)
        if inf.last_scene_stats:
            print(f"  scene volume stats: {inf.last_scene_stats}")
        return out

    return pred_fn


def maybe_drop_u8(views):
    """TDVNET_U8_UPLOAD=0: normalize u8 images on host and upload float.

    Escape hatch for the axon tunnel: the u8-ingest prep executable
    reproducibly hangs in device execution on this toolchain (round 5 —
    the float twin of the same graph runs fine; bisected with a
    faulthandler stack at `fused_scene.predict_scene`'s bbox fetch).
    Costs 4x image upload bytes; numerics identical to the on-device
    normalize (same mean/std math, fp32)."""
    if os.environ.get("TDVNET_U8_UPLOAD", "1") != "0" \
            or "images_u8" not in views:
        return views
    views = dict(views)
    u8 = views.pop("images_u8")
    sc = np.float32(views.pop("rgb_scale", 255.0))
    mean = np.asarray(views.pop("rgb_mean"), np.float32)
    std = np.asarray(views.pop("rgb_std"), np.float32)
    views["images"] = ((u8.astype(np.float32) / sc) - mean) / std
    return views
