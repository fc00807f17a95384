"""Measure B1 warp layout variants on the real chip.

Round-5 experiment: the round-4 sub-op split showed the two-pass matmul
warp (`tdvnet/ops/warp.py`) runs at 44.3 ms/exec (full src unroll) vs a
~6 ms traffic floor.  Candidate causes: (a) the pass-1 intermediate G
[R,D,q,x,C] carries C=32 on 128-wide lanes (4x pad), (b) the hat weight
tensors Wy [R,D,q,x,y] / Wx [R,D,q,p,x] are dot operands XLA must
materialize (~1 GB each per source step), (c) fp32 variance accumulators
also 4x lane-padded.

Variants measured here (all bit-compatible up to dot reassociation):
  base     — warp_variance_matmul as shipped
  cmajor   — channel-major intermediates: G emitted "rdqcx", pass-2
             emits "rdqcp", accumulators [R,D,q,C,p], one final
             transpose back to [R,D,h,w,C]
  pass1    — pass-1 einsum only (G.mean()) to isolate its share
  pass1cm  — channel-major pass-1 only
  weights  — hat-weight construction only (Wy+Wx sums) to see whether
             weight materialization dominates

Run:  python tools/exp_warp_variants.py [--variants base,cmajor,...]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tdvnet.ops import warp

K_CHAIN = 6
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


def time_chained(name, step_fn, t_rt, arrays=(), k=K_CHAIN):
    @jax.jit
    def chain(eps, *arrays):
        def body(e, _):
            return step_fn(e, *arrays) * 1e-20, None
        e, _ = jax.lax.scan(body, eps, None, length=k)
        return e

    t0 = time.perf_counter()
    c = chain.lower(jnp.float32(0.0), *arrays).compile()
    t_compile = time.perf_counter() - t0
    float(c(jnp.float32(0.0), *arrays))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(c(jnp.float32(0.0), *arrays))
        ts.append(time.perf_counter() - t0)
    t = (float(np.median(ts)) - t_rt) / k
    print(f"{name:<44s} {t*1e3:9.2f} ms  (compile {t_compile:.0f}s)",
          flush=True)
    return t


def make_inputs(R=18, k=2, D=96, h=56, w=56, Hf=64, Wf=80, C=32):
    rng = np.random.RandomState(0)
    N = R + 2 * k
    ths = np.linspace(0, 0.8, N)
    rot, tv = [], []
    for th in ths:
        c_, s_ = np.cos(th), np.sin(th)
        rot.append(np.array([[c_, 0, s_], [0, 1, 0], [-s_, 0, c_]],
                            np.float32))
        tv.append(np.array([0.1 * th, 0, 2.0], np.float32))
    rot = jnp.asarray(np.stack(rot))
    tv = jnp.asarray(np.stack(tv))
    Km = np.array([[80., 0, 40], [0, 80., 28], [0, 0, 1]], np.float32)
    Ks = jnp.asarray(np.tile(Km, (N, 1, 1)))
    ref_idx = jnp.arange(R, dtype=jnp.int32) + k
    src_idx = jnp.clip(ref_idx[:, None]
                       + jnp.arange(-k, k + 1, dtype=jnp.int32)[None],
                       0, N - 1)
    src_mask = jnp.ones((R, 2 * k + 1), bool)
    feats = jnp.asarray(rng.randn(N, Hf, Wf, C), jnp.bfloat16)
    Hm = warp.plane_sweep_homographies(rot, tv, Ks, ref_idx, src_idx,
                                       0.5, 0.05, D, (224, 320), (h, w),
                                       (Hf, Wf))
    return feats[src_idx], Hm, src_mask, (h, w)


def variant_cmajor(feats, Hmat, src_mask, plane_size,
                   weights_dtype=jnp.bfloat16):
    """Channel-major two-pass warp: intermediates keep a spatial axis on
    the 128-lane dim (x then p) instead of C=32 (4x pad)."""
    h, w = plane_size
    Rr, S, D = Hmat.shape[:3]
    Hf, Wf, C = feats.shape[2:]
    cnt = jnp.maximum(jnp.sum(src_mask.astype(jnp.float32), axis=1), 1.0)
    mask_f = src_mask.astype(jnp.float32)
    fx = feats.astype(weights_dtype)
    p_idx = jnp.arange(w, dtype=jnp.float32)

    @jax.checkpoint
    def src_step(acc, s):
        acc_v, acc_sq = acc
        a, b, alpha, beta = warp._row_coeffs(Hmat[:, s], h)
        x_idx = jnp.arange(Wf, dtype=jnp.float32)
        v_col = alpha[..., None] * x_idx + beta[..., None]
        Wy = warp._hat(v_col, Hf, weights_dtype)           # [R,D,h,Wf,Hf]
        G = jnp.einsum("rdqxy,ryxc->rdqcx", Wy, fx[:, s],
                       preferred_element_type=weights_dtype)
        num = a[..., None, 0:1] * p_idx + b[..., 0:1]
        den = a[..., None, 2:3] * p_idx + b[..., 2:3]
        u = num / den
        Wx = warp._hat(u, Wf, weights_dtype)               # [R,D,h,w,Wf]
        out = jnp.einsum("rdqpx,rdqcx->rdqcp", Wx, G,
                         preferred_element_type=jnp.float32)
        m = mask_f[:, s][:, None, None, None, None]
        return (acc_v + out * m, acc_sq + out * out * m), None

    z = jnp.zeros((Rr, D, h, C, w), jnp.float32)
    (acc_v, acc_sq), _ = jax.lax.scan(src_step, (z, z), jnp.arange(S),
                                      unroll=S)
    denom = cnt[:, None, None, None, None]
    mean = acc_v / denom
    var = acc_sq / denom - mean * mean                     # [R,D,h,C,w]
    return jnp.moveaxis(var, 3, 4)                         # [R,D,h,w,C]


def variant_pass1(feats, Hmat, src_mask, plane_size, cmajor=False,
                  weights_dtype=jnp.bfloat16):
    h, w = plane_size
    Rr, S, D = Hmat.shape[:3]
    Hf, Wf, C = feats.shape[2:]
    fx = feats.astype(weights_dtype)

    def src_step(acc, s):
        a, b, alpha, beta = warp._row_coeffs(Hmat[:, s], h)
        x_idx = jnp.arange(Wf, dtype=jnp.float32)
        v_col = alpha[..., None] * x_idx + beta[..., None]
        Wy = warp._hat(v_col, Hf, weights_dtype)
        eq = "rdqxy,ryxc->rdqcx" if cmajor else "rdqxy,ryxc->rdqxc"
        G = jnp.einsum(eq, Wy, fx[:, s],
                       preferred_element_type=weights_dtype)
        return acc + G.astype(jnp.float32).mean(), None
    acc, _ = jax.lax.scan(src_step, jnp.float32(0.0), jnp.arange(S),
                          unroll=S)
    return acc


def variant_blockdiag(feats, Hmat, src_mask, plane_size, B=4,
                      weights_dtype=jnp.bfloat16):
    """Pass-2 q-blocked block-diagonal dots.

    The stock pass-2 einsum "rdqpx,rdqxc->rdqpc" is a batched dot with
    96768 batches of [56,80]@[80,32] — measured ~2.5 TF/s effective.
    Group B consecutive q rows into one [B*56, B*80]@[B*80, 32] dot via a
    block-diagonal lhs (identity-masked hat): B x FLOP waste for ~B x
    fewer, bigger dots.  rhs grouping is a FREE reshape (q-major rows)."""
    h, w = plane_size
    Rr, S, D = Hmat.shape[:3]
    Hf, Wf, C = feats.shape[2:]
    assert h % B == 0, (h, B)
    gq = h // B
    cnt = jnp.maximum(jnp.sum(src_mask.astype(jnp.float32), axis=1), 1.0)
    mask_f = src_mask.astype(jnp.float32)
    fx = feats.astype(weights_dtype)
    p_idx = jnp.arange(w, dtype=jnp.float32)
    eye = jnp.eye(B, dtype=weights_dtype)

    @jax.checkpoint
    def src_step(acc, s):
        acc_v, acc_sq = acc
        a, b, alpha, beta = warp._row_coeffs(Hmat[:, s], h)
        x_idx = jnp.arange(Wf, dtype=jnp.float32)
        v_col = alpha[..., None] * x_idx + beta[..., None]
        Wy = warp._hat(v_col, Hf, weights_dtype)
        G = jnp.einsum("rdqxy,ryxc->rdqxc", Wy, fx[:, s],
                       preferred_element_type=weights_dtype)
        num = a[..., None, 0:1] * p_idx + b[..., 0:1]
        den = a[..., None, 2:3] * p_idx + b[..., 2:3]
        u = num / den                                     # [R,D,h,w]
        Wx = warp._hat(u, Wf, weights_dtype)              # [R,D,h,w,Wf]
        # block-diagonal lhs [R,D,gq,(i p),(j x)]
        Wxg = Wx.reshape(Rr, D, gq, B, w, Wf)
        Wblk = jnp.einsum("rdgipx,ij->rdgipjx", Wxg, eye)
        Wblk = Wblk.reshape(Rr, D, gq, B * w, B * Wf)
        Gg = G.reshape(Rr, D, gq, B * Wf, C)
        out = jnp.einsum("rdgpx,rdgxc->rdgpc", Wblk, Gg,
                         preferred_element_type=jnp.float32)
        out = out.reshape(Rr, D, h, w, C)
        m = mask_f[:, s][:, None, None, None, None]
        return (acc_v + out * m, acc_sq + out * out * m), None

    z = jnp.zeros((Rr, D, h, w, C), jnp.float32)
    (acc_v, acc_sq), _ = jax.lax.scan(src_step, (z, z), jnp.arange(S),
                                      unroll=S)
    denom = cnt[:, None, None, None, None]
    mean = acc_v / denom
    return acc_sq / denom - mean * mean


def variant_outall(feats, Hmat, src_mask, plane_size,
                   weights_dtype=jnp.bfloat16, out_dtype=jnp.bfloat16):
    """Dots-first, reduce-last: every source's pass-1/pass-2 dots run with
    NO accumulator carries between them, then ONE fusion reduces the S
    outputs into the variance.  The stock scan (even fully unrolled)
    chains acc = acc + f(dot_s) across sources, so XLA re-reads/re-writes
    two fp32 [R,D,h,w,C] accumulators around every dot — that chain, not
    the dots (pass1 3.8 ms, pass2 4.5 ms standalone), is the 44-63 ms
    wall."""
    h, w = plane_size
    Rr, S, D = Hmat.shape[:3]
    Hf, Wf, C = feats.shape[2:]
    cnt = jnp.maximum(jnp.sum(src_mask.astype(jnp.float32), axis=1), 1.0)
    mask_f = src_mask.astype(jnp.float32)
    fx = feats.astype(weights_dtype)
    p_idx = jnp.arange(w, dtype=jnp.float32)
    x_idx = jnp.arange(Wf, dtype=jnp.float32)

    def one_source(s):
        a, b, alpha, beta = warp._row_coeffs(Hmat[:, s], h)
        v_col = alpha[..., None] * x_idx + beta[..., None]
        Wy = warp._hat(v_col, Hf, weights_dtype)
        G = jnp.einsum("rdqxy,ryxc->rdqxc", Wy, fx[:, s],
                       preferred_element_type=weights_dtype)
        num = a[..., None, 0:1] * p_idx + b[..., 0:1]
        den = a[..., None, 2:3] * p_idx + b[..., 2:3]
        u = num / den
        Wx = warp._hat(u, Wf, weights_dtype)
        return jnp.einsum("rdqpx,rdqxc->rdqpc", Wx, G,
                          preferred_element_type=out_dtype)

    outs = [one_source(s) for s in range(S)]
    denom = cnt[:, None, None, None, None]
    acc_v = sum(o.astype(jnp.float32) * mask_f[:, s][:, None, None, None,
                                                     None]
                for s, o in enumerate(outs))
    acc_sq = sum(jnp.square(o.astype(jnp.float32))
                 * mask_f[:, s][:, None, None, None, None]
                 for s, o in enumerate(outs))
    mean = acc_v / denom
    return acc_sq / denom - mean * mean


def variant_outall_w8(feats, Hmat, src_mask, plane_size,
                      weights_dtype=jnp.bfloat16):
    """outall + int8 hat weights: hat in [0,1] quantized to 1/127 steps,
    dequantized by a convert that XLA should fuse into the dot operand
    load — halving the dominant weight-matrix HBM traffic.  Weight
    rounding error <= 1/254 of a pixel-interp weight (vs bf16's ~2^-8
    relative) — a measurable op-mix change, gate-checked."""
    h, w = plane_size
    Rr, S, D = Hmat.shape[:3]
    Hf, Wf, C = feats.shape[2:]
    cnt = jnp.maximum(jnp.sum(src_mask.astype(jnp.float32), axis=1), 1.0)
    mask_f = src_mask.astype(jnp.float32)
    fx = feats.astype(weights_dtype)
    p_idx = jnp.arange(w, dtype=jnp.float32)
    x_idx = jnp.arange(Wf, dtype=jnp.float32)

    def q8(wgt):
        return jnp.round(wgt.astype(jnp.float32) * 127.0).astype(jnp.int8)

    def one_source(s):
        a, b, alpha, beta = warp._row_coeffs(Hmat[:, s], h)
        v_col = alpha[..., None] * x_idx + beta[..., None]
        Wy = q8(warp._hat(v_col, Hf, jnp.float32))
        G = jnp.einsum("rdqxy,ryxc->rdqxc", Wy.astype(weights_dtype),
                       fx[:, s], preferred_element_type=weights_dtype)
        num = a[..., None, 0:1] * p_idx + b[..., 0:1]
        den = a[..., None, 2:3] * p_idx + b[..., 2:3]
        u = num / den
        Wx = q8(warp._hat(u, Wf, jnp.float32))
        out = jnp.einsum("rdqpx,rdqxc->rdqpc", Wx.astype(weights_dtype), G,
                         preferred_element_type=jnp.bfloat16)
        return out

    outs = [one_source(s) for s in range(S)]
    scale = 1.0 / (127.0 * 127.0)
    denom = cnt[:, None, None, None, None]
    acc_v = sum(o.astype(jnp.float32)
                * mask_f[:, s][:, None, None, None, None]
                for s, o in enumerate(outs)) * scale
    acc_sq = sum(jnp.square(o.astype(jnp.float32))
                 * mask_f[:, s][:, None, None, None, None]
                 for s, o in enumerate(outs)) * (scale * scale)
    mean = acc_v / denom
    return acc_sq / denom - mean * mean


def variant_pass2_only(feats, Hmat, src_mask, plane_size, B=0,
                       weights_dtype=jnp.bfloat16):
    """Pass-2 cost in isolation: feed a fixed fake G, sum the pass-2
    output (B=0: stock batched einsum; B>0: blockdiag grouping)."""
    h, w = plane_size
    Rr, S, D = Hmat.shape[:3]
    Hf, Wf, C = feats.shape[2:]
    p_idx = jnp.arange(w, dtype=jnp.float32)
    G0 = jnp.ones((Rr, D, h, Wf, C), weights_dtype)
    eye = jnp.eye(B, dtype=weights_dtype) if B else None

    def src_step(acc, s):
        a, b, _, _ = warp._row_coeffs(Hmat[:, s], h)
        num = a[..., None, 0:1] * p_idx + b[..., 0:1]
        den = a[..., None, 2:3] * p_idx + b[..., 2:3]
        u = num / den
        Wx = warp._hat(u, Wf, weights_dtype)
        G = G0 + acc.astype(weights_dtype)
        if B:
            gq = h // B
            Wxg = Wx.reshape(Rr, D, gq, B, w, Wf)
            Wblk = jnp.einsum("rdgipx,ij->rdgipjx", Wxg, eye)
            Wblk = Wblk.reshape(Rr, D, gq, B * w, B * Wf)
            Gg = G.reshape(Rr, D, gq, B * Wf, C)
            out = jnp.einsum("rdgpx,rdgxc->rdgpc", Wblk, Gg,
                             preferred_element_type=jnp.float32)
        else:
            out = jnp.einsum("rdqpx,rdqxc->rdqpc", Wx, G,
                             preferred_element_type=jnp.float32)
        return acc + out.mean(), None
    acc, _ = jax.lax.scan(src_step, jnp.float32(0.0), jnp.arange(S),
                          unroll=S)
    return acc


def variant_weights(feats, Hmat, src_mask, plane_size,
                    weights_dtype=jnp.bfloat16):
    """Hat construction only — measures the non-dot VPU+HBM cost of the
    weight tensors when they ARE materialized (sum forces it)."""
    h, w = plane_size
    Rr, S, D = Hmat.shape[:3]
    Hf, Wf, C = feats.shape[2:]
    p_idx = jnp.arange(w, dtype=jnp.float32)

    def src_step(acc, s):
        a, b, alpha, beta = warp._row_coeffs(Hmat[:, s], h)
        x_idx = jnp.arange(Wf, dtype=jnp.float32)
        v_col = alpha[..., None] * x_idx + beta[..., None]
        Wy = warp._hat(v_col, Hf, weights_dtype)
        num = a[..., None, 0:1] * p_idx + b[..., 0:1]
        den = a[..., None, 2:3] * p_idx + b[..., 2:3]
        u = num / den
        Wx = warp._hat(u, Wf, weights_dtype)
        return acc + Wy.astype(jnp.float32).mean() \
            + Wx.astype(jnp.float32).mean(), None
    acc, _ = jax.lax.scan(src_step, jnp.float32(0.0), jnp.arange(S),
                          unroll=S)
    return acc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="base,cmajor,pass1,pass1cm,weights")
    args = ap.parse_args()
    variants = args.variants.split(",")

    t_rt = measure_roundtrip()
    print(f"tunnel roundtrip: {t_rt*1e3:.1f} ms", flush=True)
    feats_g, Hm, src_mask, plane_size = make_inputs()

    def run(name, fn):
        def step(eps, feats_g):
            out = fn(feats_g + eps.astype(feats_g.dtype), Hm, src_mask,
                     plane_size)
            if out.ndim:
                out = out.astype(jnp.float32).mean()
            return out
        time_chained(name, step, t_rt, arrays=(feats_g,))

    if "base" in variants:
        run("base warp_variance_matmul",
            lambda f, H, m, ps: warp.warp_variance_matmul(f, H, m, ps))
    if "cmajor" in variants:
        run("cmajor (G rdqcx, out rdqcp)", variant_cmajor)
    if "pass1" in variants:
        run("pass1 only (G rdqxc)",
            lambda f, H, m, ps: variant_pass1(f, H, m, ps, cmajor=False))
    if "pass1cm" in variants:
        run("pass1 only channel-major (G rdqcx)",
            lambda f, H, m, ps: variant_pass1(f, H, m, ps, cmajor=True))
    if "weights" in variants:
        run("hat weights only (Wy+Wx materialized)", variant_weights)
    if "outall" in variants:
        run("outall (dots-first, one reduce) bf16",
            lambda f, H, m, ps: variant_outall(f, H, m, ps))
    if "outall8" in variants:
        run("outall + int8 hat weights",
            lambda f, H, m, ps: variant_outall_w8(f, H, m, ps))
    if "outall32" in variants:
        run("outall fp32 dot outputs",
            lambda f, H, m, ps: variant_outall(f, H, m, ps,
                                               out_dtype=jnp.float32))
    for v in variants:
        if v.startswith("p2b"):
            B = int(v[3:])
            run(f"pass2 only B={B}",
                lambda f, H, m, ps, B=B: variant_pass2_only(
                    f, H, m, ps, B=B))
        elif v.startswith("bd"):
            B = int(v[2:])
            run(f"full blockdiag B={B}",
                lambda f, H, m, ps, B=B: variant_blockdiag(
                    f, H, m, ps, B=B))


if __name__ == "__main__":
    main()
