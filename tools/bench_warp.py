"""TPU benchmark: gather-based plane-sweep cost volume vs the two-pass
matmul warp (`tdvnet.ops.warp`) at the real eval chunk shape.

Chain-marginal timing (see bench.py).  Run with the TPU idle.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tdvnet.ops import costvolume, warp

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


def time_chained(name, step_fn, t_rt, k=4):
    @jax.jit
    def chain(eps):
        def body(e, _):
            return step_fn(e) * 1e-20, None
        e, _ = jax.lax.scan(body, eps, None, length=k)
        return e

    t0 = time.perf_counter()
    c = chain.lower(jnp.float32(0.0)).compile()
    t_compile = time.perf_counter() - t0
    float(c(jnp.float32(0.0)))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(c(jnp.float32(0.0)))
        ts.append(time.perf_counter() - t0)
    t = (float(np.median(ts)) - t_rt) / k
    print(f"{name:<46s} {t*1e3:9.2f} ms   (compile {t_compile:.0f}s)",
          flush=True)
    return t


def main():
    rng = np.random.RandomState(0)
    N, R, S, k = 22, 18, 5, 2
    H, W = 256, 320
    Hf, Wf, C = 64, 80, 32
    rotms = []
    for i in range(N):
        a = 0.1 * i
        c_, s_ = np.cos(a), np.sin(a)
        rotms.append(np.array([[c_, -s_, 0], [s_, c_, 0], [0, 0, 1]],
                              np.float32))
    rotm = jnp.asarray(np.stack(rotms))
    tv = jnp.asarray((np.arange(N)[:, None]
                      * np.array([0.08, 0.01, 0.0])).astype(np.float32))
    K = jnp.asarray(np.tile(np.array(
        [[260.0, 0, 160], [0, 260, 128], [0, 0, 1]], np.float32),
        (N, 1, 1)))
    ref_idx = jnp.arange(k, k + R, dtype=jnp.int32)
    src_idx = jnp.asarray(np.arange(R)[:, None]
                          + np.arange(0, 2 * k + 1)[None]).astype(jnp.int32)
    src_mask = jnp.ones((R, S), bool)
    feats = jnp.asarray(rng.rand(N, Hf, Wf, C).astype(np.float32))

    t_rt = measure_roundtrip()
    print(f"tunnel roundtrip: {t_rt*1e3:.1f} ms", flush=True)

    args = (rotm, tv, K, ref_idx, src_idx, src_mask,
            0.5, 0.05, 96, (H, W), (56, 56))

    def gather_step(eps):
        v = costvolume.plane_sweep_cost_volume(feats + eps, *args)
        return v.mean().astype(jnp.float32)
    t_g = time_chained("gather cost volume 18rx96x56x56", gather_step, t_rt)

    for wd, label in ((jnp.bfloat16, "bf16"), (jnp.float32, "fp32")):
        for pb in (16, 32):
            def mm_step(eps, wd=wd, pb=pb):
                v = warp.plane_sweep_variance_matmul(
                    feats + eps, *args, weights_dtype=wd, plane_block=pb)
                return v.mean().astype(jnp.float32)
            t_m = time_chained(
                f"matmul warp {label} pb={pb}", mm_step, t_rt)
            print(f"  -> speedup vs gather: {t_g / t_m:.2f}x", flush=True)


if __name__ == "__main__":
    main()
