"""Bisect the round-3 flagship 0.478-abs_rel anomaly (VERDICT r3 #2).

Runs one trained checkpoint over one UNSEEN synthetic scene (the exact
scene + config `tools/run_comparison.py` used) through BOTH whole-scene
drivers at the real auto-sized eval grid:

  - chunked `SceneInference` (host chunk loops)
  - fused  `FusedSceneInference` (two-dispatch scan driver)

and reports (a) fused-vs-chunked depth agreement, (b) abs_rel of each
against analytic GT.  Outcomes:

  drivers agree + both bad  -> training/checkpoint problem (overfit)
  drivers disagree          -> fused-driver regression at eval scale

Usage:
  python tools/bisect_fused_anomaly.py --workdir /tmp/bisect \
      --ckpt-dir weights/3dvnet_synth48.npz
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

IMG = (256, 320)
N_VIEWS = 14


def abs_rel(pred, gt):
    mask = (gt >= 0.5) & (gt < 65.0)
    return float(np.abs(pred[mask] - gt[mask]).__truediv__(gt[mask]).mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--ckpt-dir", default="weights/3dvnet_synth48.npz")
    ap.add_argument("--seed", type=int, default=100)
    args = ap.parse_args()

    import jax

    from tools.make_synthetic_dataset import make_scene_dir
    from tools.run_comparison import eval_cfg
    from tdvnet.data import batch as B, synthetic
    from tdvnet.data.dataset import Dataset
    from tdvnet.data.frameselector import NextPoseDistSelector
    from tdvnet.eval.fused_scene import FusedSceneInference
    from tdvnet.eval.whole_scene import SceneInference
    from tdvnet.train import checkpoints as C
    from tdvnet.train.loop import create_state

    data = os.path.join(args.workdir, "data")
    os.makedirs(data, exist_ok=True)
    name = f"eval_{args.seed - 100:02d}"
    d = os.path.join(data, name)
    if not os.path.exists(os.path.join(d, "info.json")):
        make_scene_dir(data, name, N_VIEWS, IMG, args.seed)

    cfg = eval_cfg(args.workdir)
    e = cfg.eval
    selector = NextPoseDistSelector(e.pdist, 20)
    dset = Dataset([d], selector, None, depth_img_size=e.depth_img_size,
                   img_size=cfg.batch.img_size, augment=False,
                   n_src_on_either_side=e.n_src_on_either_side)
    views = dset.load_views(0, seed_idx=0)
    k = dset.k
    gt = np.asarray(views["depth"][k:-k], np.float32)

    bc = cfg.batch
    fb = B.collate_scenes(
        [synthetic.make_batch_scene(bc.n_views, bc.img_size,
                                    bc.depth_img_size, seed=0)],
        bc.n_views, bc.n_ref, bc.n_src_on_either_side)
    model, state = create_state(cfg, jax.random.PRNGKey(0), fb)
    raw, ep = C.restore_params(args.ckpt_dir)
    print(f"restored epoch {ep}")
    variables = {"params": raw["params"],
                 "batch_stats": raw.get("batch_stats", state.batch_stats)}

    out = {"epoch": int(ep), "scene": name}

    print("== fused driver ==")
    fused = FusedSceneInference(model, variables, cfg)
    d_fused = np.asarray(fused.predict_scene(views), np.float32)
    print("  stats:", fused.last_scene_stats)
    out["fused_stats"] = {sk: int(v) for sk, v
                          in fused.last_scene_stats.items()}
    out["fused_abs_rel"] = abs_rel(d_fused, gt)
    print(f"  fused abs_rel vs GT: {out['fused_abs_rel']:.4f}")

    print("== chunked driver ==")
    chunked = SceneInference(model, variables, cfg)
    d_chunk = np.asarray(chunked.predict_scene(views), np.float32)
    print("  stats:", chunked.last_scene_stats)
    out["chunked_stats"] = {sk: int(v) for sk, v
                            in chunked.last_scene_stats.items()}
    out["chunked_abs_rel"] = abs_rel(d_chunk, gt)
    print(f"  chunked abs_rel vs GT: {out['chunked_abs_rel']:.4f}")

    diff = np.abs(d_fused - d_chunk)
    rel = diff / np.maximum(np.abs(d_chunk), 1e-6)
    out["fused_vs_chunked_max_abs"] = float(diff.max())
    out["fused_vs_chunked_mean_abs"] = float(diff.mean())
    out["fused_vs_chunked_p99_rel"] = float(np.percentile(rel, 99))
    print(f"fused vs chunked: max|d| {diff.max():.4f} m, "
          f"mean|d| {diff.mean():.5f} m, p99 rel {out['fused_vs_chunked_p99_rel']:.4f}")

    # initial (pre-refinement) depth quality: isolates MVSNet stage from
    # scene-refinement stages
    import jax.numpy as jnp
    imgs = (views["images"] if "images_u8" not in views else None)
    st = fused._dispatch_prep(views)
    d_init = np.asarray(st["out"][3])[:gt.shape[0]]
    h, w = d_init.shape[-2:]
    gt_small = gt[:, ::gt.shape[1] // h, ::gt.shape[2] // w][:, :h, :w]
    out["initial_abs_rel_quarter"] = abs_rel(d_init, gt_small)
    print(f"initial-depth abs_rel (quarter res): "
          f"{out['initial_abs_rel_quarter']:.4f}")

    with open(os.path.join(args.workdir, "bisect.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
