"""Pallas TPU kernels for the depth-map hot paths.

1. `softargmax_depth`: fused softmax(-cost) + expectation over the plane
   axis — one VMEM pass over the [D, h, w] volume per ref view instead of
   XLA's separate softmax + weighted-reduce (each a full HBM round trip of
   the [R, D, h, w] volume; reference op at `mv3d/subnetworks/mvsnet.py:
   219-227`).
2. `propagation_blend`: fused 3x3 replicate-pad unfold + softmax over the 9
   neighbor logits + weighted sum (reference `PropagationNet` tail,
   `mv3d/subnetworks/upsampling.py:23-36`) — the unfold never materializes
   the [N, H, W, 9] neighborhood tensor in HBM.

Both are elementwise/reduction (VPU) kernels tiled per image over the grid;
blocks fit comfortably in VMEM at reference shapes (96x56x56 fp32 = 1.2 MB;
(258)x(322) fp32 = 0.3 MB).
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _default_interpret() -> bool:
    """Run in interpreter mode off-TPU (CPU tests / virtual meshes)."""
    return jax.default_backend() != "tpu"


def _softargmax_kernel(cost_ref, dvals_ref, out_ref):
    """cost_ref: [1, D, h, w]; dvals_ref: [D, 1] plane depths (VMEM);
    out_ref: [1, h, w]."""
    cost = cost_ref[0].astype(jnp.float32)            # [D, h, w]
    neg = -cost
    m = jnp.max(neg, axis=0, keepdims=True)
    e = jnp.exp(neg - m)
    denom = jnp.sum(e, axis=0)
    dv = dvals_ref[:, 0][:, None, None]               # [D, 1, 1]
    num = jnp.sum(e * dv, axis=0)
    out_ref[0] = num / denom


def softargmax_depth(cost: jnp.ndarray, depth_vals: jnp.ndarray,
                     interpret: bool | None = None) -> jnp.ndarray:
    """cost: [R, D, h, w] (regularized cost, pre-negation);
    depth_vals: [D].  Returns depth [R, h, w] = E_softmax(-cost)[d]."""
    R, D, h, w = cost.shape
    if interpret is None:
        interpret = _default_interpret()
    return pl.pallas_call(
        _softargmax_kernel,
        grid=(R,),
        in_specs=[
            pl.BlockSpec((1, D, h, w), lambda r: (r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 1), lambda r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda r: (r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, h, w), jnp.float32),
        interpret=interpret,
    )(cost, depth_vals.reshape(D, 1).astype(jnp.float32))


def _propagation_kernel(logits_ref, dpad_ref, out_ref):
    """logits_ref: [1, H, W, 9]; dpad_ref: [1, H+2, W+2] replicate-padded
    depth; out_ref: [1, H, W]."""
    lg = logits_ref[0].astype(jnp.float32)            # [H, W, 9]
    m = jnp.max(lg, axis=-1, keepdims=True)
    e = jnp.exp(lg - m)
    denom = jnp.sum(e, axis=-1)
    H, W = out_ref.shape[1], out_ref.shape[2]
    dpad = dpad_ref[0]
    acc = jnp.zeros((H, W), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            acc = acc + e[:, :, 3 * dy + dx] * dpad[dy:dy + H, dx:dx + W]
    out_ref[0] = acc / denom


def propagation_blend(logits: jnp.ndarray, depth: jnp.ndarray,
                      interpret: bool | None = None) -> jnp.ndarray:
    """logits: [N, H, W, 9]; depth: [N, H, W].  Returns the learned 3x3
    neighbor blend (softmax weights x replicate-padded neighborhood)."""
    N, H, W = depth.shape
    if interpret is None:
        interpret = _default_interpret()
    dpad = jnp.pad(depth, ((0, 0), (1, 1), (1, 1)), mode="edge")
    return pl.pallas_call(
        _propagation_kernel,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, H, W, 9), lambda n: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H + 2, W + 2), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H, W), jnp.float32),
        interpret=interpret,
    )(logits, dpad)
