"""Wall-clock of FusedSceneInference vs chunked SceneInference on the
48-keyframe bench scene (single chip, bf16).

Run:  python tools/bench_fused.py [--skip-chunked] [--scenes N]
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tdvnet.config import load_config
from tdvnet.data import batch as B, synthetic
from tdvnet.models.threedvnet import ThreeDVNet


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-chunked", action="store_true")
    ap.add_argument("--scenes", type=int, default=3)
    ap.add_argument("--views", type=int, default=52)
    args = ap.parse_args()

    cfg = load_config({"batch": {"n_scenes": 1, "n_ref": 7}})
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, dtype=jnp.bfloat16))
    bc = cfg.batch
    model = ThreeDVNet(cfg.model)
    scenes = [synthetic.make_batch_scene(bc.n_views, bc.img_size,
                                         bc.depth_img_size, seed=0)]
    fb = B.collate_scenes(scenes, bc.n_views, bc.n_ref,
                          bc.n_src_on_either_side)
    init_fn = jax.jit(lambda rng, batch: model.init(
        rng, batch, offsets=[0.05], n_iters=1, lam=0.0, train=False))
    variables = init_fn(jax.random.PRNGKey(0), fb)
    jax.block_until_ready(variables)
    print("params ready", flush=True)

    views = [synthetic.make_scene(n_views=args.views, img_size=bc.img_size,
                                  seed=7 + i) for i in range(args.scenes)]
    R = args.views - 2 * cfg.eval.n_src_on_either_side

    from tdvnet.eval.fused_scene import FusedSceneInference

    fused = FusedSceneInference(model, variables, cfg)
    t0 = time.perf_counter()
    d = fused.predict_scene(views[0])
    print(f"fused compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    assert np.isfinite(d).all() and 0.0 < d.mean() < 65.0

    for i, v in enumerate(views):
        tm = {}
        t0 = time.perf_counter()
        d = fused.predict_scene(v, timings=tm)
        t = time.perf_counter() - t0
        print(f"fused scene {i}: {t:.3f}s  ({R/t:.1f} f/s)  "
              + "  ".join(f"{k}={x:.3f}" for k, x in tm.items()), flush=True)

    # pipelined: transfers hidden under compute (steady state)
    t0 = time.perf_counter()
    n_out = 0
    for i, d in enumerate(fused.predict_scenes(views)):
        t = time.perf_counter() - t0
        print(f"piped scene {i}: cum {t:.3f}s", flush=True)
        n_out += 1
    t = time.perf_counter() - t0
    print(f"pipelined: {t/n_out:.3f}s/scene  ({n_out*R/t:.1f} f/s)",
          flush=True)

    if not args.skip_chunked:
        from tdvnet.eval.whole_scene import SceneInference

        inf = SceneInference(model, variables, cfg)
        t0 = time.perf_counter()
        inf.predict_scene(views[0])
        print(f"chunked compile+first: {time.perf_counter()-t0:.1f}s",
              flush=True)
        for i, v in enumerate(views[:2]):
            t0 = time.perf_counter()
            inf.predict_scene(v)
            t = time.perf_counter() - t0
            print(f"chunked scene {i}: {t:.3f}s  ({R/t:.1f} f/s)", flush=True)


if __name__ == "__main__":
    main()
