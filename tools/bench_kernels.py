"""Benchmark Pallas kernels vs their XLA fallbacks on the real TPU.

Usage: python tools/bench_kernels.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    from tdvnet.kernels import depthops_pallas as KP
    from tdvnet.models.upsampling import unfold3x3

    rng = np.random.default_rng(0)
    # reference-scale shapes: 18-ref eval chunk, 96x56x56 volume
    R, D, h, w = 18, 96, 56, 56
    cost = jnp.asarray(rng.normal(size=(R, D, h, w)).astype(np.float32))
    dvals = jnp.linspace(0.5, 5.25, D)

    xla_soft = jax.jit(lambda c: jnp.sum(
        jax.nn.softmax(-c, axis=1) * dvals[None, :, None, None], axis=1))
    pal_soft = jax.jit(lambda c: KP.softargmax_depth(c, dvals))
    np.testing.assert_allclose(np.asarray(pal_soft(cost)),
                               np.asarray(xla_soft(cost)), atol=1e-4)
    t_x = timeit(xla_soft, cost)
    t_p = timeit(pal_soft, cost)
    print(f"softargmax_depth  [R={R},D={D},{h}x{w}]  "
          f"xla {t_x:.3f} ms   pallas {t_p:.3f} ms   x{t_x / t_p:.2f}")

    # full-res propagation blend: 100-image upsample chunk at 256x320
    N, H, W = 20, 256, 320
    logits = jnp.asarray(rng.normal(size=(N, H, W, 9)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(1, 4, size=(N, H, W)).astype(np.float32))

    xla_prop = jax.jit(lambda l, d: jnp.sum(
        jax.nn.softmax(l, axis=-1) * unfold3x3(d), axis=-1))
    pal_prop = jax.jit(lambda l, d: KP.propagation_blend(l, d))
    np.testing.assert_allclose(np.asarray(pal_prop(logits, depth)),
                               np.asarray(xla_prop(logits, depth)), atol=1e-4)
    t_x = timeit(xla_prop, logits, depth, iters=20)
    t_p = timeit(pal_prop, logits, depth, iters=20)
    print(f"propagation_blend [N={N},{H}x{W}]      "
          f"xla {t_x:.3f} ms   pallas {t_p:.3f} ms   x{t_x / t_p:.2f}")


if __name__ == "__main__":
    main()
