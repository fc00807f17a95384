"""Per-stage TPU timing of the flagship pipeline (chain-marginal method).

The remote-TPU tunnel's `block_until_ready` does not wait for execution, so
each stage is timed by scanning K data-dependent iterations inside one jit
and fetching a scalar; stage time = (t_fetch - t_roundtrip) / K, where the
roundtrip is measured with a trivial executable.

Run:  python tools/profile_stages.py [--eval-shapes]
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

from tdvnet.config import GridConfig, load_config
from tdvnet.data import batch as B, synthetic
from tdvnet.models.threedvnet import ThreeDVNet

K_CHAIN = 8
REPS = 3


def measure_roundtrip():
    f = jax.jit(lambda x: x * 2.0).lower(jnp.float32(1.0)).compile()
    float(f(jnp.float32(1.0)))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(jnp.float32(1.0)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def time_chained(name, step_fn, t_rt, k=K_CHAIN):
    """step_fn: eps(scalar f32) -> scalar f32 (data-dependent chain)."""
    @jax.jit
    def chain(eps):
        def body(e, _):
            return step_fn(e) * 1e-20, None
        e, _ = jax.lax.scan(body, eps, None, length=k)
        return e

    t0 = time.perf_counter()
    c = chain.lower(jnp.float32(0.0)).compile()
    t_compile = time.perf_counter() - t0
    float(c(jnp.float32(0.0)))          # warm
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(c(jnp.float32(0.0)))
        ts.append(time.perf_counter() - t0)
    t = (float(np.median(ts)) - t_rt) / k
    print(f"{name:<28s} {t*1e3:9.2f} ms   (compile {t_compile:.0f}s)")
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--eval-shapes", action="store_true",
                    help="use whole-scene eval chunk shapes + 160x160x64 grid")
    args = ap.parse_args()

    cfg = load_config({"batch": {"n_scenes": 1, "n_ref": 7}})
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, dtype=jnp.bfloat16))
    bc = cfg.batch
    model = ThreeDVNet(cfg.model)

    scenes = [synthetic.make_batch_scene(bc.n_views, bc.img_size,
                                         bc.depth_img_size, seed=s)
              for s in range(bc.n_scenes)]
    fb = B.collate_scenes(scenes, bc.n_views, bc.n_ref,
                          bc.n_src_on_either_side)

    grid_cfg = cfg.model.grid
    if args.eval_shapes:
        e = cfg.eval
        grid_cfg = GridConfig(edge_len=cfg.model.grid.edge_len,
                              grid_size=e.eval_grid_size,
                              max_anchors=e.eval_max_anchors)

    init_fn = jax.jit(lambda rng, batch: model.init(
        rng, batch, offsets=[0.05], n_iters=1, lam=0.0, train=False))
    variables = init_fn(jax.random.PRNGKey(0), fb)
    jax.block_until_ready(variables)

    t_rt = measure_roundtrip()
    print(f"tunnel roundtrip: {t_rt*1e3:.1f} ms")

    dc = cfg.model.depth_test
    feats = jax.jit(lambda v, im: model.apply(v, im, False,
                                              method="extract_features"))(
        variables, fb.images)
    feats_half, feats_quarter, _ = jax.tree_util.tree_map(
        jnp.asarray, feats)
    depth0 = jax.jit(lambda v, b, q: model.apply(
        v, b, dc, q, False, method="initial_depth")[0])(
        variables, fb, feats_quarter)
    scales, origins, _ = jax.jit(lambda v, d, q, b: model.apply(
        v, d, q, b, grid_cfg, False, method="model_scene"))(
        variables, depth0, feats_quarter, fb)
    jax.block_until_ready((feats_half, feats_quarter, depth0, scales))

    def images_eps(e):
        return fb.images + e

    time_chained("extract_features", lambda e: model.apply(
        variables, images_eps(e), False,
        method="extract_features")[1].mean().astype(jnp.float32), t_rt)

    def init_depth_step(e):
        d, _ = model.apply(variables, fb, dc, feats_quarter + e,
                           method="initial_depth", train=False)
        return d.mean().astype(jnp.float32)
    time_chained("initial_depth(7r,96d)", init_depth_step, t_rt)

    def scene_step(e):
        s, _, _ = model.apply(variables, depth0 + e, feats_quarter, fb,
                              grid_cfg, False, method="model_scene")
        return s[0]["grid"].mean().astype(jnp.float32)
    time_chained(f"model_scene{grid_cfg.grid_size}", scene_step, t_rt, k=4)

    def pointflow_step(e):
        delta = model.apply(variables, scales, origins, depth0 + e,
                            feats_quarter, fb, 0.05, 3, grid_cfg, False,
                            method="run_pointflow")
        return delta.mean().astype(jnp.float32)
    time_chained("run_pointflow(1 offset)", pointflow_step, t_rt)

    def upsample_step(e):
        d = model.apply(variables, depth0 + e, feats_half, feats_quarter,
                        fb.images, fb.ref_idx, False, method="upsample")
        return d.mean().astype(jnp.float32)
    time_chained("upsample(3 stages)", upsample_step, t_rt)


if __name__ == "__main__":
    main()
