"""Training-step roofline: per-stage fwd+bwd attribution (VERDICT r4 #7).

Round-4 attributed the EVAL graph sub-op by sub-op; the train step
(fwd+bwd+update, 171.8 ms / 5.4% MFU in BENCH_r04) never got the same
treatment.  This tool times the gradient of CUMULATIVE stage losses at the
bench training shapes (1 scene x (7 ref + 2x2 src) @ 256x320, 64^3 grid,
bf16 + full-forward remat, same as `bench.py` graph 2):

  G1 features            grad of mean(backbone+FPN feats)
  G2 + initial depth     grad of mean(initial depth)
  G3 + model_scene       grad of mean(U-Net scale grids)
  G4 + pointflow x3 x2   grad of mean(refined depth), 2 iters
  G5 full step           the real train step (losses at every stage,
                         upsampling, Adam update) — `make_train_step`

Marginal stage cost = t(Gk) - t(Gk-1); all timings chain-marginal (the
tunnel's block_until_ready lies — see bench.py docstring).

Run (TPU idle):  python tools/profile_train_step.py [--no-remat]
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

K_CHAIN = 4
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


def time_chained(name, grad_scalar_fn, t_rt, arrays, k=K_CHAIN):
    """grad_scalar_fn(eps, *arrays) -> scalar (already includes the grad
    reduction); chained k times inside one jit."""
    @jax.jit
    def chain(eps, *arrays):
        def body(e, _):
            return grad_scalar_fn(e, *arrays) * 1e-20, None
        e, _ = jax.lax.scan(body, eps, None, length=k)
        return e

    t0 = time.perf_counter()
    c = chain.lower(jnp.float32(0.0), *arrays).compile()
    t_compile = time.perf_counter() - t0
    ca = c.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    fl = float(ca.get("flops", 0.0) or 0.0) / k
    float(c(jnp.float32(0.0), *arrays))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(c(jnp.float32(0.0), *arrays))
        ts.append(time.perf_counter() - t0)
    t = (float(np.median(ts)) - t_rt) / k
    tf = fl / max(t, 1e-9) / 1e12
    print(f"{name:<44s} {t*1e3:9.2f} ms  {fl/1e9:8.1f} GFLOP  "
          f"{tf:6.1f} TF/s  (compile {t_compile:.0f}s)", flush=True)
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--stages", default="g1,g2,g3,g4,g5")
    args = ap.parse_args()
    stages = set(args.stages.split(","))

    from tdvnet.config import load_config
    from tdvnet.data import batch as B, synthetic
    from tdvnet.models.threedvnet import ThreeDVNet

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

    init_fn = jax.jit(lambda rng, batch: model.init(
        rng, batch, offsets=[0.05], n_iters=1, lam=0.0, train=False))
    variables = init_fn(jax.random.PRNGKey(0), fb)
    jax.block_until_ready(variables)
    params, bstats = variables["params"], variables.get("batch_stats", {})
    dc = cfg.model.depth_train
    offsets = [0.05, 0.05, 0.025]

    t_rt = measure_roundtrip()
    print(f"tunnel roundtrip: {t_rt*1e3:.1f} ms", flush=True)

    remat = (lambda f: f) if args.no_remat else jax.checkpoint

    def run_stage(name, upto: str):
        def fwd(params, batch):
            vs = {"params": params, "batch_stats": bstats}
            fh, fq, _ = model.apply(vs, batch.images, False,
                                    method="extract_features")
            if upto == "feats":
                return fq.astype(jnp.float32).mean()
            d, _ = model.apply(vs, batch, dc, fq, False,
                               method="initial_depth")
            if upto == "depth":
                return d.astype(jnp.float32).mean()
            scales, origins, _ = model.apply(vs, d, fq, batch, None, True,
                                             method="model_scene")
            if upto == "scene":
                return sum(s["grid"].astype(jnp.float32).mean()
                           for s in scales)
            for _ in range(2):
                scales, origins, _ = model.apply(vs, d, fq, batch, None,
                                                 True, method="model_scene")
                for off in offsets:
                    d = d + model.apply(vs, scales, origins, d, fq, batch,
                                        float(off), 3, None, True,
                                        method="run_pointflow")
            return d.astype(jnp.float32).mean()

        fwd = remat(fwd)

        def gstep(eps, params, batch):
            b = dataclasses.replace(batch, images=batch.images + eps)
            g = jax.grad(fwd)(params, b)
            return jax.tree_util.tree_reduce(
                lambda a, x: a + jnp.sum(jnp.abs(x).astype(jnp.float32))
                * 1e-12, g, jnp.float32(0.0))

        time_chained(name, gstep, t_rt, arrays=(params, fb))

    if "g1" in stages:
        run_stage("G1 grad(features)", "feats")
    if "g2" in stages:
        run_stage("G2 grad(+initial depth)", "depth")
    if "g3" in stages:
        run_stage("G3 grad(+model_scene)", "scene")
    if "g4" in stages:
        run_stage("G4 grad(+pointflow 2x3)", "pointflow")

    if "g5" in stages:
        # the real train step (deep supervision + upsample + Adam)
        from tdvnet.train.loop import create_state, make_train_step

        model2, state = create_state(cfg, jax.random.PRNGKey(0), fb)
        step = make_train_step(model2, cfg, n_iters=2, donate=False)
        lam = jnp.float32(1.0)
        state, m = step(state, fb, lam)       # compile + warm
        jax.block_until_ready(m)
        ts = []
        for _ in range(REPS + 1):
            t0 = time.perf_counter()
            state, m = step(state, fb, lam)
            float(m["loss"])                  # host fetch forces execution
            ts.append(time.perf_counter() - t0)
        t = float(np.median(ts[1:])) - t_rt
        print(f"{'G5 full train step (fwd+bwd+adam)':<44s} {t*1e3:9.2f} ms"
              f"  (sequential, roundtrip-corrected)", flush=True)


if __name__ == "__main__":
    main()
