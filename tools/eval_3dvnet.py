"""Whole-scene evaluation entry (reference `mv3d/eval-3dvnet.py`).

Usage:
  python tools/eval_3dvnet.py --ckpt-dir ckpts/3dvnet --dataset scannet \
      --scannet-dir /data/scannet
  python tools/eval_3dvnet.py --ckpt-dir ckpts/3dvnet \
      --dataset synthetic:/tmp/synth --save-dir eval_results
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--dataset", default="scannet")
    ap.add_argument("--scannet-dir", default=None)
    ap.add_argument("--icl-dir", default=None)
    ap.add_argument("--tum-dir", default=None)
    ap.add_argument("--save-dir", default="eval_results")
    ap.add_argument("--name", default="3dvnet")
    ap.add_argument("--overwrite", action="store_true")
    ap.add_argument("--eval-grid", type=int, nargs=3, default=None,
                    help="scene grid cells (x y z), default from config")
    ap.add_argument("--max-anchors", type=int, default=None)
    ap.add_argument("--bf16", action="store_true",
                    help="bfloat16 compute (params stay fp32)")
    ap.add_argument("--fast-path", action="store_true",
                    help="validated fast path: int8 scene tables + "
                         "adaptive iter-2 offsets (cfg.eval.fast_path)")
    ap.add_argument("--fast-rank", type=int, default=None,
                    help="fast-path rank-r sampling-interface projection "
                         "(0 = off; default: EvalConfig.fast_rank = 96, "
                         "the round-5 gated candidate)")
    ap.add_argument("--fast-patch", type=int, choices=(0, 1), default=None,
                    help="fast-path patch-fan image variance (default: "
                         "EvalConfig.fast_patch = on)")
    ap.add_argument("--dp", action="store_true",
                    help="DP-over-scenes fused eval: run mesh-size scene "
                         "groups as one zero-collective SPMD program over "
                         "all local devices (FusedSceneInferenceDP)")
    ap.add_argument("--space-shard", action="store_true",
                    help="spatially-sharded scene volumes (halo-sharded "
                         "U-Net over all local devices) for scenes too "
                         "big for one chip")
    args = ap.parse_args()

    from tdvnet.config import load_config
    from tdvnet.eval.harness import main as harness_main, make_3dvnet_pred_fn
    from tdvnet.models.threedvnet import ThreeDVNet
    from tdvnet.train import checkpoints as C

    overrides = {"eval": {"dataset_type": args.dataset,
                          "save_dir": args.save_dir,
                          "fast_path": args.fast_path,
                          **({"fast_rank": args.fast_rank}
                             if args.fast_rank is not None else {}),
                          **({"fast_patch": bool(args.fast_patch)}
                             if args.fast_patch is not None else {})}}
    if args.eval_grid:
        overrides["eval"]["eval_grid_size"] = tuple(args.eval_grid)
    if args.max_anchors:
        overrides["eval"]["eval_max_anchors"] = args.max_anchors
    data_over = {}
    if args.scannet_dir:
        data_over["scannet_dir"] = args.scannet_dir
    if args.icl_dir:
        data_over["icl_nuim_dir"] = args.icl_dir
    if args.tum_dir:
        data_over["tum_rgbd_dir"] = args.tum_dir
    if data_over:
        overrides["data"] = data_over
    cfg = load_config(overrides)
    if args.bf16:
        import dataclasses
        import jax.numpy as jnp

        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, dtype=jnp.bfloat16))

    # params-only restore: no state template (and no init compile), and
    # robust to whatever optimizer config the training run used
    model = ThreeDVNet(cfg.model)
    restored = C.restore_params(args.ckpt_dir)
    if restored is None:
        raise FileNotFoundError(f"no checkpoint in {args.ckpt_dir}")
    raw, epoch = restored
    print(f"restored epoch {epoch} from {args.ckpt_dir}")

    variables = {"params": raw["params"],
                 "batch_stats": raw.get("batch_stats", {})}
    mesh = None
    if args.dp or args.space_shard:
        from jax.sharding import Mesh

        devs = np.array(jax.devices())
        axis = "data" if args.dp else "space"
        mesh = Mesh(devs.reshape(-1), (axis,))
        print(f"{'DP' if args.dp else 'space-sharded'} eval over "
              f"{devs.size} devices")
    pred_fn = make_3dvnet_pred_fn(model, variables, cfg, mesh=mesh,
                                  dp=args.dp)
    harness_main(args.name, pred_fn, cfg, depth=True,
                 overwrite=args.overwrite)


if __name__ == "__main__":
    main()
