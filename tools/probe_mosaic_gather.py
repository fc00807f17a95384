"""Probe which gather/shuffle forms this image's Mosaic toolchain compiles.

Run on the real TPU (compiles go through the remote-compile service):
    python tools/probe_mosaic_gather.py

Findings on v5e / 2026-08-17 (each case = one pallas_call compile+run):

| form                                          | result  |
|-----------------------------------------------|---------|
| take_along_axis axis=1, (8,128)               | OK      |
| take_along_axis axis=1, (32,128)              | OK      |
| take_along_axis axis=1, (14336,128)           | HTTP500 |
| take_along_axis axis=1, (8,384)  multi-tile   | HTTP500 |
| take_along_axis axis=0, (8,128)               | OK      |
| take_along_axis axis=0, (80,128) multi-tile   | HTTP500 |
| take_along_axis axis=0, values 5120 rows      | HTTP500 |
| pltpu.roll with traced shift, (8,128)         | OK      |
| reshape (Q,BD,8)->(Q*BD,8) leading collapse   | OK      |
| non-128-aligned lane-offset scratch write     | OK      |
| middle-dim static slice of 3D ref             | OK      |
| int //,% on broadcasted_iota                  | OK      |

Conclusion: dynamic shuffles are INTRA-TILE only (one 8x128 value tile per
op; multiple sublane tiles of the *index/result* are fine for axis=1 up to
at least 32 rows, but values crossing a 128-lane or 8-sublane tile
boundary kill the compile).  Any bilinear warp needs taps that cross
tiles, so an in-kernel gather formulation is not expressible — which is
why the production plane-sweep path is the two-pass MATMUL warp
(`tdvnet/ops/warp.py`, 4.3x the packed-gather path) instead of a Pallas
kernel: its weight matrices are the only thing a kernel could keep out of
HBM, and every layout that feeds both passes from VMEM requires either a
cross-tile shuffle or a lane<->sublane relayout that costs more than the
saved traffic (measured estimates in tdvnet/kernels/__init__.py).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_kernel(name, kern, out_shape, in_arrays, scratch=()):
    try:
        kwargs = dict(out_shape=out_shape)
        if scratch:
            kwargs["scratch_shapes"] = list(scratch)
        f = pl.pallas_call(kern, **kwargs)
        r = np.asarray(jax.jit(f)(*in_arrays))
        print(f"{name:<44s} OK   ({float(r.ravel()[1]):.4f})")
    except Exception as e:
        msg = str(e)[:70].replace("\n", " ")
        print(f"{name:<44s} FAIL {msg}")


def taa1(g_ref, i_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(g_ref[...], i_ref[...], axis=1)


def taa0(g_ref, i_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(g_ref[...], i_ref[...], axis=0)


def main():
    rng = np.random.RandomState(0)

    def arrs(rows, cols, irows=None, icols=None, hi=None):
        irows = rows if irows is None else irows
        icols = cols if icols is None else icols
        hi = cols if hi is None else hi
        return (jnp.asarray(rng.rand(rows, cols).astype(np.float32)),
                jnp.asarray((rng.rand(irows, icols) * hi).astype(np.int32)))

    g, i = arrs(8, 128)
    try_kernel("axis=1 (8,128)", taa1,
               jax.ShapeDtypeStruct((8, 128), jnp.float32), (g, i))
    g, i = arrs(32, 128)
    try_kernel("axis=1 (32,128)", taa1,
               jax.ShapeDtypeStruct((32, 128), jnp.float32), (g, i))
    g, i = arrs(8, 384)
    try_kernel("axis=1 (8,384) multi-lane-tile", taa1,
               jax.ShapeDtypeStruct((8, 384), jnp.float32), (g, i))
    g, i = arrs(14336, 128)
    try_kernel("axis=1 (14336,128)", taa1,
               jax.ShapeDtypeStruct((14336, 128), jnp.float32), (g, i))
    g, i = arrs(8, 128, hi=8)
    try_kernel("axis=0 (8,128)", taa0,
               jax.ShapeDtypeStruct((8, 128), jnp.float32), (g, i))
    g, i = arrs(80, 128, hi=80)
    try_kernel("axis=0 (80,128) multi-sublane-tile", taa0,
               jax.ShapeDtypeStruct((80, 128), jnp.float32), (g, i))
    g, i = arrs(5120, 128, irows=80, hi=5120)
    try_kernel("axis=0 values 5120 rows, idx 80", taa0,
               jax.ShapeDtypeStruct((80, 128), jnp.float32), (g, i))


if __name__ == "__main__":
    main()
