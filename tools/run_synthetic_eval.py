"""One-command synthetic end-to-end eval drive.

Generates a synthetic info.json scene set, runs a method through the full
eval harness (GT-depth passthrough by default, or the flagship with
--ckpt-dir), and prints the aggregated metrics — the quickest way to see
the whole data→prediction→fusion→metrics pipeline work without real data.

Usage:
  python tools/run_synthetic_eval.py --workdir /tmp/se
  python tools/run_synthetic_eval.py --workdir /tmp/se --ckpt-dir ckpts/...
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--scenes", type=int, default=1)
    ap.add_argument("--views", type=int, default=12)
    ap.add_argument("--hw", type=int, nargs=2, default=(240, 320))
    ap.add_argument("--ckpt-dir", default=None,
                    help="evaluate the flagship from this checkpoint "
                         "instead of GT passthrough")
    ap.add_argument("--eval-grid", type=int, nargs=3, default=(64, 64, 48))
    ap.add_argument("--seed-base", type=int, default=0,
                    help="scene seed offset (training caches use seeds "
                         "0..N-1; pick >=100 for unseen eval scenes)")
    ap.add_argument("--fast-path", action="store_true",
                    help="validated fast path: int8 scene tables + "
                         "adaptive iter-2 offsets")
    ap.add_argument("--fast-rank", type=int, default=None,
                    help="fast-path rank-r sampling-interface projection "
                         "(0 = off; default: EvalConfig.fast_rank = 96, "
                         "the round-5 gated candidate)")
    ap.add_argument("--fast-patch", type=int, choices=(0, 1), default=None,
                    help="fast-path patch-fan image variance (default: "
                         "EvalConfig.fast_patch = on)")
    ap.add_argument("--name", default=None,
                    help="results dirname (default: 3dvnet / "
                         "3dvnet_fast / gt_passthrough)")
    args = ap.parse_args()

    from tools.make_synthetic_dataset import make_scene_dir
    from tdvnet.config import load_config
    from tdvnet.eval import harness

    data_dir = os.path.join(args.workdir, "data")
    os.makedirs(data_dir, exist_ok=True)
    scenes = []
    for s in range(args.scenes):
        seed = args.seed_base + s
        d = os.path.join(data_dir, f"synth_{seed:04d}")
        if not os.path.exists(os.path.join(d, "info.json")):
            make_scene_dir(data_dir, f"synth_{seed:04d}", args.views,
                           tuple(args.hw), seed)
        scenes.append(d)

    cfg = load_config({
        "batch": {"img_size": (256, 320) if args.ckpt_dir else tuple(args.hw)},
        "eval": {"save_dir": os.path.join(args.workdir, "results"),
                 "depth_img_size": tuple(args.hw),
                 "pdist": 0.05, "n_src_on_either_side": 2,
                 "eval_grid_size": tuple(args.eval_grid),
                 "eval_max_anchors": 65536,
                 "fast_path": args.fast_path,
                 **({"fast_rank": args.fast_rank}
                    if args.fast_rank is not None else {}),
                 **({"fast_patch": bool(args.fast_patch)}
                    if args.fast_patch is not None else {})},
    })

    if args.ckpt_dir:
        import jax

        from tdvnet.data import batch as B, synthetic
        from tdvnet.eval.harness import make_3dvnet_pred_fn
        from tdvnet.train import checkpoints as C
        from tdvnet.train.loop import create_state

        bc = cfg.batch
        fb = B.collate_scenes(
            [synthetic.make_batch_scene(bc.n_views, bc.img_size,
                                        bc.depth_img_size, seed=0)],
            bc.n_views, bc.n_ref, bc.n_src_on_either_side)
        model, state = create_state(cfg, jax.random.PRNGKey(0), fb)
        # params-only restore: robust to optimizer-config differences and
        # accepts the committable .npz weights form
        raw, ep = C.restore_params(args.ckpt_dir)
        print(f"restored epoch {ep} (params-only)")
        pred_fn = make_3dvnet_pred_fn(
            model, {"params": raw["params"],
                    "batch_stats": raw.get("batch_stats",
                                           state.batch_stats)}, cfg)
        name = "3dvnet_fast" if args.fast_path else "3dvnet"
    else:
        def pred_fn(views, scene_dir, dset):
            k = dset.k
            return views["depth"][k:-k]

        name = "gt_passthrough"

    avg = harness.main(args.name or name, pred_fn, cfg, depth=True, scenes=scenes)
    print(json.dumps(avg, indent=2))


if __name__ == "__main__":
    main()
