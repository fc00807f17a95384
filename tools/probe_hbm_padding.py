"""Probe: are TPU HBM buffers physically padded to (8,128) tiles?

If a [A, 56, 32] fp32 buffer streams at the same time as [A, 56, 128],
minor-dim padding is physical and every narrow-channel intermediate pays
4x HBM traffic — the round-5 B1 diagnosis hinges on this.

Times y = x * 2 + 1 (pure stream, fused) chained K times.
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


def t_roundtrip():
    f = jax.jit(lambda x: x * 2.0).lower(jnp.float32(1.0)).compile()
    float(f(jnp.float32(1.0)))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(jnp.float32(1.0)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def stream_time(shape, dtype, t_rt):
    x = jnp.ones(shape, dtype)

    @jax.jit
    def chain(eps, x):
        def body(e, _):
            y = x * (1.0 + e).astype(dtype) + e.astype(dtype)
            return y.astype(jnp.float32).mean() * 1e-20, None
        e, _ = jax.lax.scan(body, eps, None, length=K)
        return e
    c = chain.lower(jnp.float32(0.0), x).compile()
    float(c(jnp.float32(0.0), x))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(c(jnp.float32(0.0), x))
        ts.append(time.perf_counter() - t0)
    t = (float(np.median(ts)) - t_rt) / K
    nbytes = np.prod(shape) * np.dtype(dtype).itemsize
    eff = nbytes / t / 1e9
    print(f"{str(shape):<28s} {str(np.dtype(dtype)):<9s} {t*1e3:8.2f} ms  "
          f"{nbytes/2**30:6.2f} GiB logical  {eff:7.1f} GB/s eff",
          flush=True)
    return t


def main():
    t_rt = t_roundtrip()
    print(f"roundtrip {t_rt*1e3:.1f} ms", flush=True)
    A = 18 * 96 * 56                    # the B1 intermediate batch extent
    # same logical bytes, different minor dims
    stream_time((A, 56, 32), jnp.float32, t_rt)
    stream_time((A, 14, 128), jnp.float32, t_rt)
    stream_time((A, 56 * 32), jnp.float32, t_rt)
    stream_time((A, 80, 32), jnp.bfloat16, t_rt)
    stream_time((A, 20, 128), jnp.bfloat16, t_rt)
    stream_time((A, 80 * 32), jnp.bfloat16, t_rt)


if __name__ == "__main__":
    main()
