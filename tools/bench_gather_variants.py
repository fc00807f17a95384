"""Microbench: variants of the two hot eval gathers on the real chip.

sample_scales (oct-packed trilinear) and hypothesis_point_variance
(quad-packed bilinear) dominate eval wall time (tools/profile_substages.py:
33.8 ms and 27 ms per pointflow step x 18 steps/scene).  Per round-2
measurements the GATHER itself costs ~9 ns/row; the suspect is the
epilogue (f32 cast + 8-term weighted sum materializing [P, 8C] f32).
This bench isolates: gather-only, current epilogue, bf16 epilogue,
dot-product epilogue.

Run:  python tools/bench_gather_variants.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

K = 8
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


def time_chained(name, step_fn, t_rt, *args, k=K):
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
    print(f"{name:<52s} {t*1e3:8.2f} ms   (compile {t_compile:.0f}s)",
          flush=True)
    return t


def main():
    rng = jax.random.PRNGKey(0)
    t_rt = measure_roundtrip()
    print(f"tunnel roundtrip: {t_rt*1e3:.1f} ms", flush=True)

    # ---- sample_scales shape: finest scale of the 112x112x48 eval grid ----
    X, Y, Z, C = 112, 112, 48, 64
    P = 351232                      # 16 refs x 7 hyp x 3136 px
    n_rows = (X + 1) * (Y + 1) * (Z + 1)
    octs_bf16 = jax.random.normal(rng, (n_rows, 8 * C), jnp.bfloat16)
    octs_f32 = octs_bf16.astype(jnp.float32)
    idx = jax.random.randint(jax.random.fold_in(rng, 1), (P,), 0, n_rows)
    w = jax.random.uniform(jax.random.fold_in(rng, 2), (P, 8), jnp.float32)

    def dep(eps, idx):
        # runtime-zero index perturbation keeps the gather inside the scan
        # (XLA hoists eps-independent compute out of the chain otherwise)
        return idx + (eps * 1e-30).astype(jnp.int32)

    def gather_only(eps, octs, idx):
        rows = jnp.take(octs, dep(eps, idx), axis=0)
        return rows.astype(jnp.float32).mean()

    def epi_f32(eps, octs, idx, w):
        rows = jnp.take(octs, dep(eps, idx), axis=0).astype(jnp.float32)
        out = jnp.zeros((P, C), jnp.float32)
        for i in range(8):
            out = out + rows[:, i * C:(i + 1) * C] * w[:, i:i + 1]
        return out.mean()

    def epi_bf16(eps, octs, idx, w):
        rows = jnp.take(octs, dep(eps, idx), axis=0)
        wb = w.astype(jnp.bfloat16)
        out = jnp.zeros((P, C), jnp.bfloat16)
        for i in range(8):
            out = out + rows[:, i * C:(i + 1) * C] * wb[:, i:i + 1]
        return out.astype(jnp.float32).mean()

    def epi_dot(eps, octs, idx, w):
        rows = jnp.take(octs, dep(eps, idx), axis=0).reshape(P, 8, C)
        out = jnp.einsum("pic,pi->pc", rows.astype(jnp.bfloat16),
                         w.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        return out.mean()

    print(f"-- trilinear oct rows: P={P}, table {n_rows}x{8*C}", flush=True)
    time_chained("oct gather only (bf16 table)", gather_only, t_rt,
                 octs_bf16, idx)
    time_chained("oct gather only (f32 table)", gather_only, t_rt,
                 octs_f32, idx)
    time_chained("oct gather + f32 epilogue (current)", epi_f32, t_rt,
                 octs_bf16, idx, w)
    time_chained("oct gather + bf16 epilogue", epi_bf16, t_rt,
                 octs_bf16, idx, w)
    time_chained("oct gather + bf16 einsum epilogue", epi_dot, t_rt,
                 octs_bf16, idx, w)

    # 8 narrow gathers for reference
    vol = jax.random.normal(rng, (X * Y * Z, C), jnp.bfloat16)
    idx8 = jax.random.randint(jax.random.fold_in(rng, 3), (8, P), 0, X * Y * Z)

    def narrow8(eps, vol, idx8, w):
        out = jnp.zeros((P, C), jnp.float32)
        idx8d = dep(eps, idx8)
        for i in range(8):
            out = out + jnp.take(vol, idx8d[i], axis=0).astype(jnp.float32) \
                * w[:, i:i + 1]
        return out.mean()
    time_chained("8 narrow C-gathers + f32 epilogue", narrow8, t_rt,
                 vol, idx8, w)

    # ---- bilinear quad shape: hyp_variance inner sampler ----
    H, W, C2 = 64, 80, 32
    P2 = 351232 * 5                  # x5 src views
    n_rows2 = (H + 1) * (W + 1)
    quads_f32 = jax.random.normal(rng, (n_rows2, 4 * C2), jnp.float32)
    quads_bf16 = quads_f32.astype(jnp.bfloat16)
    idx2 = jax.random.randint(jax.random.fold_in(rng, 4), (P2,), 0, n_rows2)
    w2 = jax.random.uniform(jax.random.fold_in(rng, 5), (P2, 4), jnp.float32)

    def quad_f32(eps, quads, idx2, w2):
        rows = jnp.take(quads, idx2 + (eps * 1e-30).astype(jnp.int32),
                        axis=0).astype(jnp.float32)
        out = jnp.zeros((P2, C2), jnp.float32)
        for i in range(4):
            out = out + rows[:, i * C2:(i + 1) * C2] * w2[:, i:i + 1]
        return out.mean()

    def quad_bf16(eps, quads, idx2, w2):
        rows = jnp.take(quads, idx2 + (eps * 1e-30).astype(jnp.int32),
                        axis=0)
        wb = w2.astype(jnp.bfloat16)
        out = jnp.zeros((P2, C2), jnp.bfloat16)
        for i in range(4):
            out = out + rows[:, i * C2:(i + 1) * C2] * wb[:, i:i + 1]
        return out.astype(jnp.float32).mean()

    print(f"-- bilinear quad rows: P={P2}, table {n_rows2}x{4*C2}",
          flush=True)
    time_chained("quad gather + f32 (current)", quad_f32, t_rt,
                 quads_f32, idx2, w2)
    time_chained("quad gather + f32 table bf16 epi", quad_bf16, t_rt,
                 quads_f32, idx2, w2)
    time_chained("quad gather bf16 table + bf16 epi", quad_bf16, t_rt,
                 quads_bf16, idx2, w2)


if __name__ == "__main__":
    main()
