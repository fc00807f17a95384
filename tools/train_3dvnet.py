"""Training entry (reference `mv3d/train.py` / `mv3d/finetune.py`).

Data comes from `info.json` scenes; with --synthetic N a synthetic dataset
is generated on the fly so the loop runs without real data.

Usage:
  python tools/train_3dvnet.py --scannet-dir /data/scannet --epochs 120
  python tools/train_3dvnet.py --synthetic 8 --epochs 2     # smoke run
  python tools/train_3dvnet.py --finetune --ckpt ckpts/...  # finetune regime
"""
import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scannet-dir", default=None)
    ap.add_argument("--synthetic", type=int, default=0,
                    help="train on N generated synthetic scenes")
    ap.add_argument("--epochs", type=int, default=120)
    ap.add_argument("--finetune", action="store_true")
    ap.add_argument("--ckpt-dir", default="ckpts/3dvnet")
    ap.add_argument("--log-dir", default="runs/3dvnet")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--init-from", default=None,
                    help="warm-start params from an orbax ckpt dir or a "
                         ".npz weights file when --ckpt-dir has no "
                         "checkpoint yet (continue a shipped checkpoint "
                         "into a fresh run directory)")
    ap.add_argument("--batch-scenes", type=int, default=2)
    ap.add_argument("--steps-per-epoch", type=int, default=None,
                    help="cap batches per epoch")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 compute (fp32 params/optimizer)")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize the forward in the backward pass")
    ap.add_argument("--grad-accum", type=int, default=1,
                    help="accumulate gradients over K microbatches "
                         "(effective batch = batch-scenes * K)")
    ap.add_argument("--export-npz", default=None,
                    help="write a committable .npz weight snapshot here "
                         "every --export-every epochs (atomic; survives "
                         "scratch wipes of the orbax ckpt dir)")
    ap.add_argument("--export-every", type=int, default=4)
    args = ap.parse_args()

    from tdvnet.config import load_config
    from tdvnet.data import batch as B
    from tdvnet.data.dataset import Dataset
    from tdvnet.data.frameselector import (BestPoseDistSelector,
                                           RangePoseDistSelector)
    from tdvnet.data import scenelists
    from tdvnet.train.loop import fit

    cfg = load_config({"train": {"finetune": args.finetune,
                                 "bf16_compute": args.bf16,
                                 "remat": args.remat,
                                 "grad_accum_steps": args.grad_accum},
                       "batch": {"n_scenes": args.batch_scenes}})
    bc = cfg.batch

    if args.synthetic:
        import concurrent.futures as cf

        from tools.make_synthetic_dataset import ensure_scene_dir

        # deterministic cache dir: regenerating 48 scenes of ray-marched
        # 256x320 views takes hours serially — cache + process-parallel
        h, w = bc.img_size
        root = os.path.join(tempfile.gettempdir(),
                            f"tdvnet_synth_{args.synthetic}x16x{h}x{w}")
        os.makedirs(root, exist_ok=True)
        # UNSEEN validation scenes (seeds 1000+, disjoint from the 0..N-1
        # train seeds and the 100+ comparison-eval seeds): overfit is
        # visible live in the val curve instead of surfacing only in the
        # final unseen-scene comparison (VERDICT r3 #8)
        n_val = 4
        jobs = [(root, f"s{i:03d}", 16, bc.img_size, i)
                for i in range(args.synthetic)]
        jobs += [(root, f"val{i:03d}", 16, bc.img_size, 1000 + i)
                 for i in range(n_val)]
        with cf.ProcessPoolExecutor(max_workers=8) as pool:
            scene_dirs = list(pool.map(ensure_scene_dir, jobs))
        train_dirs = scene_dirs[:args.synthetic]
        val_dirs = scene_dirs[args.synthetic:]
    else:
        assert args.scannet_dir, "--scannet-dir or --synthetic required"
        train_dirs = scenelists.get_scenes_scannet(args.scannet_dir, "train")
        val_dirs = scenelists.get_scenes_scannet(args.scannet_dir, "val")

    train_sel = RangePoseDistSelector(0.125, 0.325, cfg.data.img_interval)
    val_sel = BestPoseDistSelector(0.225, cfg.data.img_interval)
    train_dset = Dataset(train_dirs, train_sel, bc.n_ref,
                         depth_img_size=bc.depth_img_size,
                         img_size=bc.img_size, augment=True,
                         n_src_on_either_side=bc.n_src_on_either_side)
    val_dset = Dataset(val_dirs, val_sel, bc.n_ref,
                       depth_img_size=bc.depth_img_size,
                       img_size=bc.img_size, augment=False,
                       n_src_on_either_side=bc.n_src_on_either_side)

    def val_batches(limit=4):
        idx = np.arange(len(val_dset))
        out = []
        for i in range(0, len(idx) - bc.n_scenes + 1, bc.n_scenes):
            out.append(val_dset.get_batch(idx[i:i + bc.n_scenes], bc.n_views,
                                          bc.n_ref))
            if len(out) >= limit:
                break
        return out

    from tdvnet.train.loader import StreamingLoader

    loader = StreamingLoader(train_dset, bc.n_scenes, bc.n_views, bc.n_ref,
                             seed=cfg.train.seed,
                             prefetch=cfg.train.loader_prefetch,
                             workers=cfg.train.loader_workers,
                             steps_per_epoch=args.steps_per_epoch)
    fit(cfg, loader, val_batches, args.epochs,
        log_dir=args.log_dir, ckpt_dir=args.ckpt_dir, resume=args.resume,
        init_from=args.init_from, export_npz=args.export_npz,
        export_every=args.export_every)


if __name__ == "__main__":
    main()
