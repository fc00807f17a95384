"""Probe HBM footprint of the train step before committing to a long run.

Compiles the n_iters=1 and n_iters=2 train steps (the two graphs `fit`
uses across a 120-epoch schedule — `loop.n_iters_for_epoch`) at the given
batch shape and prints XLA's memory analysis.  A 120-epoch run that OOMs
at the epoch-20 n_iters switch wastes hours; this answers in minutes.

Usage: python tools/probe_train_memory.py --batch-scenes 1 --bf16 --remat
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-scenes", type=int, default=1)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--grad-accum", type=int, default=1)
    args = ap.parse_args()

    from tdvnet.config import load_config
    from tdvnet.data import batch as B, synthetic
    from tdvnet.train.loop import create_state, make_train_step

    cfg = load_config({"train": {"bf16_compute": args.bf16,
                                 "remat": args.remat,
                                 "grad_accum_steps": args.grad_accum},
                       "batch": {"n_scenes": args.batch_scenes}})
    bc = cfg.batch
    scenes = [synthetic.make_batch_scene(bc.n_views, bc.img_size,
                                         bc.depth_img_size, seed=s,
                                         n_src_on_either_side=bc.n_src_on_either_side)
              for s in range(bc.n_scenes)]
    batch = B.collate_scenes(scenes, bc.n_views, bc.n_ref,
                             bc.n_src_on_either_side)
    model, state = create_state(cfg, jax.random.PRNGKey(0), batch)
    lam = jax.numpy.float32(1.0)

    for n_it in (1, 2):
        step = make_train_step(model, cfg, n_it, donate=False)
        lowered = step.lower(state, batch, lam)
        compiled = lowered.compile()
        mem = compiled.memory_analysis()
        gb = 1024 ** 3
        print(f"n_iters={n_it}: "
              f"args={mem.argument_size_in_bytes/gb:.2f}G "
              f"out={mem.output_size_in_bytes/gb:.2f}G "
              f"temp={mem.temp_size_in_bytes/gb:.2f}G "
              f"total={(mem.argument_size_in_bytes+mem.output_size_in_bytes+mem.temp_size_in_bytes)/gb:.2f}G")


if __name__ == "__main__":
    main()
