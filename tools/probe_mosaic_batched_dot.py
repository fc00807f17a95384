"""Probe: does Mosaic (Pallas TPU) lower batched dot_general, and at what
rate?  The fused warp kernel needs per-cell batched small dots:

  pass-1:  batch x=80 of [56,64]@[64,32]
  pass-2:  batch q=56 of [56,80]@[80,32]

Tries a kernel computing exactly that shape from VMEM inputs, timed
against the same contraction in plain XLA.
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 3
K_CHAIN = 8


def t_roundtrip():
    f = jax.jit(lambda x: x * 2.0).lower(jnp.float32(1.0)).compile()
    float(f(jnp.float32(1.0)))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(jnp.float32(1.0)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def time_fn(name, fn, args, t_rt, flops=None):
    @jax.jit
    def chain(eps, *args):
        def body(e, _):
            out = fn(args[0] + e.astype(args[0].dtype), *args[1:])
            return out.astype(jnp.float32).mean() * 1e-20, None
        e, _ = jax.lax.scan(body, eps, None, length=K_CHAIN)
        return e
    try:
        c = chain.lower(jnp.float32(0.0), *args).compile()
    except Exception as ex:
        print(f"{name:<44s} COMPILE FAIL: {str(ex)[:200]}", flush=True)
        return None
    try:
        float(c(jnp.float32(0.0), *args))
    except Exception as ex:
        print(f"{name:<44s} RUN FAIL: {str(ex)[:200]}", flush=True)
        return None
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(c(jnp.float32(0.0), *args))
        ts.append(time.perf_counter() - t0)
    t = (float(np.median(ts)) - t_rt) / K_CHAIN
    msg = f"{name:<44s} {t*1e3:9.3f} ms"
    if flops:
        msg += f"  {flops/t/1e12:6.1f} TF/s"
    print(msg, flush=True)
    return t


def main():
    t_rt = t_roundtrip()
    print(f"roundtrip {t_rt*1e3:.1f} ms", flush=True)
    rng = np.random.RandomState(0)
    # stand-in shapes: NB "cells" each with pass-1-like batched dot
    NB = 432            # (r=18) x (nd=24) cells
    X, Q, Y, C = 80, 56, 64, 32
    W = jnp.asarray(rng.randn(NB, X, Q, Y), jnp.bfloat16)
    F = jnp.asarray(rng.randn(NB, X, Y, C), jnp.bfloat16)
    flops = 2.0 * NB * X * Q * Y * C

    def xla_batched(W, F):
        return jax.lax.dot_general(
            W, F, (((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.bfloat16)

    time_fn("XLA batched dot (NB*80 x [56,64]@[64,32])", xla_batched,
            (W, F), t_rt, flops)

    def kernel_batched(w_ref, f_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            w_ref[:], f_ref[:], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.bfloat16)

    @jax.jit
    def pallas_batched(W, F):
        return pl.pallas_call(
            kernel_batched,
            out_shape=jax.ShapeDtypeStruct((NB, X, Q, C), jnp.bfloat16),
            grid=(NB,),
            in_specs=[
                pl.BlockSpec((1, X, Q, Y), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, X, Y, C), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, X, Q, C), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(W.reshape(NB, X, Q, Y), F.reshape(NB, X, Y, C)) \
            .reshape(NB, X, Q, C)

    # NOTE: block has leading 1-dim; kernel sees [1, X, Q, Y] — index [0]
    def kernel_batched2(w_ref, f_ref, o_ref):
        o_ref[0] = jax.lax.dot_general(
            w_ref[0], f_ref[0], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    @jax.jit
    def pallas_batched2(W, F):
        return pl.pallas_call(
            kernel_batched2,
            out_shape=jax.ShapeDtypeStruct((NB, X, Q, C), jnp.bfloat16),
            grid=(NB,),
            in_specs=[
                pl.BlockSpec((1, X, Q, Y), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, X, Y, C), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, X, Q, C), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(W, F)

    time_fn("pallas batched dot_general (in-cell batch)", pallas_batched2,
            (W, F), t_rt, flops)

    # loop-of-dots fallback: fori over x inside the cell
    def kernel_loop(w_ref, f_ref, o_ref):
        def body(x, _):
            o_ref[0, x] = jnp.dot(w_ref[0, x], f_ref[0, x],
                                  preferred_element_type=jnp.float32) \
                .astype(jnp.bfloat16)
            return 0
        jax.lax.fori_loop(0, X, body, 0)

    @jax.jit
    def pallas_loop(W, F):
        return pl.pallas_call(
            kernel_loop,
            out_shape=jax.ShapeDtypeStruct((NB, X, Q, C), jnp.bfloat16),
            grid=(NB,),
            in_specs=[
                pl.BlockSpec((1, X, Q, Y), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, X, Y, C), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, X, Q, C), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(W, F)

    time_fn("pallas fori-loop of dots", pallas_loop, (W, F), t_rt, flops)


if __name__ == "__main__":
    main()
