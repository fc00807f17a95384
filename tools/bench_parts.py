"""Microbench the sub-parts of the two hot eval stages (B init_depth,
D pointflow) at real eval chunk shapes, plus tunnel transfer bandwidth.

Chain-marginal timing (see bench.py): K data-dependent iterations inside
one jit, stage time = (t(K) - t(1)) / (K - 1), cancels tunnel roundtrip.

Run: python tools/bench_parts.py [--skip d|b]
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
    print(f"{name:<44s} {t*1e3:9.2f} ms   (compile {t_compile:.0f}s)",
          flush=True)
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", default="")
    args = ap.parse_args()
    skip = set(args.skip.split(","))

    from tdvnet.models.mvsnet import CostRegNet
    from tdvnet.models.hypothesis import HypothesisDecoder, sample_scales
    from tdvnet.ops import camera, costvolume

    rng = np.random.RandomState(0)
    t_rt = measure_roundtrip()
    print(f"tunnel roundtrip: {t_rt*1e3:.1f} ms", flush=True)

    # ---- transfer bandwidth ----
    if "x" not in skip:
        up = np.asarray(rng.rand(52, 256, 320, 3), np.float32)   # 51 MB
        t0 = time.perf_counter()
        d = jax.device_put(up); jax.block_until_ready(d)
        t_up1 = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            d = jax.device_put(up); jax.block_until_ready(d)
            ts.append(time.perf_counter() - t0)
        t_up = float(np.median(ts))
        print(f"upload 51MB: first {t_up1:.2f}s, warm {t_up:.2f}s "
              f"({up.nbytes/1e6/t_up:.0f} MB/s)", flush=True)
        big = jnp.ones((48, 256, 320), jnp.float32)               # 15 MB
        jax.block_until_ready(big)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(big)
            ts.append(time.perf_counter() - t0)
        t_dn = float(np.median(ts))
        print(f"download 15MB: {t_dn:.2f}s ({big.nbytes/1e6/t_dn:.0f} MB/s)",
              flush=True)

    # ---- shared geometry: 22 cameras in a row, 18 refs, S=5 ----
    N, R, S, k = 22, 18, 5, 2
    H, W = 256, 320
    Hf, Wf, C = 64, 80, 32
    rotm = np.tile(np.eye(3, dtype=np.float32), (N, 1, 1))
    tv = np.zeros((N, 3), np.float32)
    tv[:, 0] = np.arange(N) * 0.08
    K = np.tile(np.array([[260.0, 0, 160], [0, 260, 128], [0, 0, 1]],
                         np.float32), (N, 1, 1))
    ref_idx = jnp.arange(k, k + R, dtype=jnp.int32)
    src_idx = jnp.asarray(np.arange(R)[:, None]
                          + np.arange(0, 2 * k + 1)[None, :]).astype(jnp.int32)
    src_mask = jnp.ones((R, S), bool)
    feats = jnp.asarray(rng.rand(N, Hf, Wf, C).astype(np.float32))
    rotm_j, tv_j, K_j = jnp.asarray(rotm), jnp.asarray(tv), jnp.asarray(K)

    if "b" not in skip:
        # B1: plane-sweep cost volume (gathers + variance)
        def b1(eps):
            v = costvolume.plane_sweep_cost_volume(
                feats + eps, rotm_j, tv_j, K_j, ref_idx, src_idx, src_mask,
                0.5, 0.05, 96, (H, W), (56, 56))
            return v.mean().astype(jnp.float32)
        time_chained("B1 plane_sweep_cost_volume 18rx96x56x56", b1, t_rt)

        # B2: CostRegNet on the volume
        reg = CostRegNet(8, dtype=jnp.bfloat16)
        var0 = jnp.asarray(rng.rand(R, 96, 56, 56, C).astype(np.float32))
        regv = reg.init(jax.random.PRNGKey(0), var0.astype(jnp.bfloat16))

        def b2(eps):
            c = reg.apply(regv, (var0 + eps).astype(jnp.bfloat16))
            return c.mean().astype(jnp.float32)
        time_chained("B2 CostRegNet 18rx96x56x56 bf16", b2, t_rt)

        # B3: softmax-expectation
        cost0 = jnp.asarray(rng.rand(R, 96, 56, 56).astype(np.float32))
        dv = jnp.linspace(0.5, 0.5 + 0.05 * 95, 96)

        def b3(eps):
            p = jax.nn.softmax(-(cost0 + eps), axis=1)
            d = jnp.sum(p * dv[None, :, None, None], axis=1)
            return d.mean().astype(jnp.float32)
        time_chained("B3 softmax-expectation", b3, t_rt)

    if "d" not in skip:
        # D parts at eval grid (112,112,48), Rc=16 refs, Hh=7, P=3136
        Rc, Hh, P = 16, 7, 56 * 56
        ref16 = jnp.arange(k, k + Rc, dtype=jnp.int32)
        src16 = jnp.asarray(np.arange(Rc)[:, None]
                            + np.arange(0, 2 * k + 1)[None]).astype(jnp.int32)
        sm16 = jnp.ones((Rc, S), bool)
        pts = jnp.asarray(
            (rng.rand(Rc, Hh * P, 3) * np.array([3.0, 2.0, 2.0]) +
             np.array([0.0, -1.0, 1.0])).astype(np.float32))

        def d1(eps):
            v = costvolume.hypothesis_point_variance(
                pts + eps, feats, src16, sm16, rotm_j, tv_j, K_j, (H, W))
            return v.mean().astype(jnp.float32)
        time_chained("D1 hypothesis_point_variance 16x7x3136", d1, t_rt)

        gx, gy, gz = 112, 112, 48
        scales = [
            {"grid": jnp.asarray(rng.rand(1, gx // 4, gy // 4, gz // 4, 128)
                                 .astype(np.float32)).astype(jnp.bfloat16),
             "mask": None, "stride": 4},
            {"grid": jnp.asarray(rng.rand(1, gx // 2, gy // 2, gz // 2, 128)
                                 .astype(np.float32)).astype(jnp.bfloat16),
             "mask": None, "stride": 2},
            {"grid": jnp.asarray(rng.rand(1, gx, gy, gz, 64)
                                 .astype(np.float32)).astype(jnp.bfloat16),
             "mask": None, "stride": 1},
        ]
        origins = jnp.zeros((1, 3), jnp.float32)
        q = pts.reshape(1, Rc * Hh * P, 3)

        def d2(eps):
            f = sample_scales(scales, q + eps, origins, 0.04)
            return f.mean().astype(jnp.float32)
        time_chained("D2 sample_scales 351k pts x3 scales", d2, t_rt)

        dec = HypothesisDecoder(128, 3, dtype=jnp.bfloat16)
        fin = jnp.asarray(rng.rand(Rc * P, Hh, 352).astype(np.float32))
        decv = dec.init(jax.random.PRNGKey(0), fin)

        def d3(eps):
            p = dec.apply(decv, fin + eps)
            return p.mean().astype(jnp.float32)
        time_chained("D3 decoder 50k x 7 x 352", d3, t_rt)


if __name__ == "__main__":
    main()
