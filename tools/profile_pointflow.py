"""Bisect run_pointflow's per-offset cost on the real chip.

The eval-stage profile shows pointflow_multi(16r x3off) at ~228 ms while
its known sub-stages (hyp variance ~27, scale sampling ~27-34, decoder ~1)
sum to ~190 ms; this tool times the REAL `run_pointflow` method with parts
knocked out to localize the remainder.

Run:  python tools/profile_pointflow.py
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tdvnet.config import load_config
from tdvnet.data import synthetic
from tdvnet.eval.whole_scene import _chunk_batch
from tdvnet.models.threedvnet import ThreeDVNet
from tdvnet.models.hypothesis import combine_scales, pack_scales, \
    _COMBINE_BUDGET_BYTES

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


def time_chained(name, step_fn, t_rt, *args, k=K_CHAIN):
    @jax.jit
    def chain(eps, *a):
        def body(e, _):
            return step_fn(e, *a) * 1e-20, None
        e, _ = jax.lax.scan(body, eps, None, length=k)
        return e

    args = tuple(jax.device_put(x) for x in args)
    t0 = time.perf_counter()
    c = chain.lower(jnp.float32(0.0), *args).compile()
    t_compile = time.perf_counter() - t0
    float(c(jnp.float32(0.0), *args))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(c(jnp.float32(0.0), *args))
        ts.append(time.perf_counter() - t0)
    t = (float(np.median(ts)) - t_rt) / k
    print(f"{name:<44s} {t*1e3:9.2f} ms   (compile {t_compile:.0f}s)",
          flush=True)
    return t


def main():
    cfg = load_config({"batch": {"n_scenes": 1, "n_ref": 7}})
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, dtype=jnp.bfloat16))
    mc = cfg.model
    e = cfg.eval
    k = e.n_src_on_either_side
    dc = mc.depth_test
    h, w = dc.size
    C = mc.feat_dim
    rng = jax.random.PRNGKey(0)

    views = synthetic.make_scene(n_views=52, img_size=mc.img_size, seed=7)
    t_rt = measure_roundtrip()
    print(f"tunnel roundtrip: {t_rt*1e3:.1f} ms", flush=True)

    model = ThreeDVNet(mc)
    OC = e.offset_batch
    cb, _ = _chunk_batch(views, 0, OC, k, OC)
    n_imgs = OC + 2 * k
    Hq, Wq = mc.img_size[0] // 4, mc.img_size[1] // 4
    fq = jax.random.normal(rng, (n_imgs, Hq, Wq, C), jnp.bfloat16)
    depth = jnp.full((OC, h, w), 2.0, jnp.float32)

    # variables: init on a small batch (params only needed for pointnet/
    # decoder; the pointflow method uses decoder params)
    from tdvnet.data import batch as B
    bc = cfg.batch
    fb = B.collate_scenes([synthetic.make_batch_scene(
        bc.n_views, bc.img_size, bc.depth_img_size, seed=0)],
        bc.n_views, bc.n_ref, bc.n_src_on_either_side)
    variables = jax.jit(lambda r, b: model.init(
        r, b, offsets=[0.05], n_iters=1, lam=0.0, train=False))(
            jax.random.PRNGKey(0), fb)
    jax.block_until_ready(variables)
    print("params ready", flush=True)

    # scene scales at the profiled auto-grid
    gx, gy, gz = 112, 112, 48
    dims = list(mc.unet_dims)
    scales = []
    for si, ch in enumerate(dims[::-1]):
        s = 2 ** (len(dims) - 1 - si)
        g = jax.random.normal(jax.random.fold_in(rng, si),
                              (1, gx // s, gy // s, gz // s, ch),
                              jnp.bfloat16)
        scales.append({"grid": g, "stride": s})
    origins = jnp.zeros((1, 3), jnp.float32)

    comb = jax.jit(lambda gs: combine_scales(
        [{"grid": g, "stride": st} for g, st in zip(gs, (4, 2, 1))]))(
            [sc["grid"] for sc in scales])
    octs_c = jax.jit(
        lambda g: pack_scales([g], budget=_COMBINE_BUDGET_BYTES)[0])(
            comb[0]["grid"])
    jax.block_until_ready(octs_c)
    packed = [dict(comb[0], octs=octs_c,
                   dims=tuple(comb[0]["grid"].shape[1:4]))]

    def pf(eps, d, fq, oc):
        pk = [dict(packed[0], octs=oc)]
        out = model.apply(variables, pk, origins, d + eps, fq, cb,
                          [0.05], 3, None, False,
                          method="run_pointflow_multi")
        return out.mean().astype(jnp.float32)
    time_chained("run_pointflow_multi 1 offset", pf, t_rt, depth, fq, octs_c)

    def pf3(eps, d, fq, oc):
        pk = [dict(packed[0], octs=oc)]
        out = model.apply(variables, pk, origins, d + eps, fq, cb,
                          [0.05, 0.05, 0.025], 3, None, False,
                          method="run_pointflow_multi")
        return out.mean().astype(jnp.float32)
    time_chained("run_pointflow_multi 3 offsets", pf3, t_rt, depth, fq,
                 octs_c)


if __name__ == "__main__":
    main()
