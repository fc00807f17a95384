"""Sub-stage TPU timing inside the two hottest eval stages (B init_depth,
D pointflow) — chain-marginal method (see bench.py).

B = plane-sweep warp+variance (matmul mode)  +  CostRegNet  +  softargmax
D = hypothesis variance gathers  +  scene-scale sampling  +  decoder conv1d

Run:  python tools/profile_substages.py
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
from tdvnet.models.mvsnet import CostRegNet
from tdvnet.models.hypothesis import HypothesisDecoder, pack_scales, sample_scales
from tdvnet.ops import camera, costvolume, warp

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


def time_chained(name, step_fn, t_rt, k=K_CHAIN, *args):
    """step_fn(eps, *args) -> f32 scalar.  Big tensors must be passed via
    *args (device arrays), NOT closed over — closure constants get baked
    into the HLO literal and blow the remote-compile request size."""
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
    print(f"{name:<40s} {t*1e3:9.2f} ms   (compile {t_compile:.0f}s)",
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
    D = dc.n_intervals
    C = mc.feat_dim
    rng = jax.random.PRNGKey(0)

    views = synthetic.make_scene(n_views=52, img_size=mc.img_size, seed=7)
    t_rt = measure_roundtrip()
    print(f"tunnel roundtrip: {t_rt*1e3:.1f} ms", flush=True)

    # ---------------- stage B sub-parts (chunk of 18 refs) ----------------
    IC = e.init_depth_batch
    cb, _ = _chunk_batch(views, 0, IC, k, IC)
    Hq, Wq = mc.img_size[0] // 4, mc.img_size[1] // 4
    n_imgs = IC + 2 * k
    fq = jax.random.normal(rng, (n_imgs, Hq, Wq, C), jnp.bfloat16)

    def warp_step(eps, fq):
        var = costvolume.plane_sweep_cost_volume(
            fq + eps.astype(jnp.bfloat16), cb.rotmats, cb.tvecs, cb.K,
            cb.ref_idx, cb.src_idx, cb.src_mask, dc.depth_start,
            dc.depth_interval, D, mc.img_size, (h, w), mode="matmul",
            weights_dtype=jnp.bfloat16)
        return var.mean().astype(jnp.float32)
    time_chained(f"B.warp matmul ({IC}r,{D}d,{h}x{w})", warp_step, t_rt, 4, fq)

    def warp_gather_step(eps, fq):
        var = costvolume.plane_sweep_cost_volume(
            fq + eps.astype(jnp.bfloat16), cb.rotmats, cb.tvecs, cb.K,
            cb.ref_idx, cb.src_idx, cb.src_mask, dc.depth_start,
            dc.depth_interval, D, mc.img_size, (h, w), mode="gather")
        return var.mean().astype(jnp.float32)
    time_chained(f"B.warp gather ({IC}r,{D}d,{h}x{w})", warp_gather_step,
                 t_rt, 4, fq)

    costreg = CostRegNet(mc.cost_base_channels, dtype=jnp.bfloat16)
    var0 = jax.random.normal(rng, (IC, D, h, w, C), jnp.float32)
    cr_vars = costreg.init(rng, var0)

    def costreg_step(eps, v0):
        c = costreg.apply(cr_vars, v0 + eps)
        return c.mean().astype(jnp.float32)
    time_chained(f"B.costreg ({IC}r,{D}x{h}x{w})", costreg_step, t_rt, 4,
                 var0)

    # ---------------- stage D sub-parts (chunk of 16 refs) ----------------
    OC = e.offset_batch
    cb16, _ = _chunk_batch(views, 0, OC, k, OC)
    n_imgs16 = OC + 2 * k
    fq16 = jax.random.normal(rng, (n_imgs16, Hq, Wq, C), jnp.bfloat16)
    n = 3
    H = 2 * n + 1
    P = h * w
    depth = jnp.full((OC, h, w), 2.0, jnp.float32)

    # hypothesis points (built once outside; the build itself is timed too)
    def build_hyp(d):
        grid = camera.build_img_grid(mc.img_size, (h, w))
        K_inv = jnp.linalg.inv(cb16.K[cb16.ref_idx])
        ray_cam = jnp.einsum("nij,pj->npi", K_inv, grid)
        Rr = cb16.rotmats[cb16.ref_idx]
        ray_world = jnp.einsum("nji,npj->npi", Rr, ray_cam)
        center = camera.camera_center(Rr, cb16.tvecs[cb16.ref_idx])
        ivals = jnp.arange(-n, n + 1, dtype=jnp.float32)
        dh = d.reshape(OC, 1, P) + ivals[None, :, None] * 0.05
        return center[:, None, None, :] + ray_world[:, None, :, :] \
            * dh[..., None]

    def hyp_build_step(eps, d):
        return build_hyp(d + eps).mean().astype(jnp.float32)
    time_chained(f"D.hyp_build ({OC}r,{H}h)", hyp_build_step, t_rt, K_CHAIN,
                 depth)

    pts_hyp = jax.jit(build_hyp)(depth)
    jax.block_until_ready(pts_hyp)

    def var_step(eps, ph, fq16):
        v = costvolume.hypothesis_point_variance(
            ph.reshape(OC, H * P, 3) + eps, fq16, cb16.src_idx,
            cb16.src_mask, cb16.rotmats, cb16.tvecs, cb16.K, mc.img_size)
        return v.mean().astype(jnp.float32)
    time_chained(f"D.hyp_variance ({OC}r,{H}h,{P}p)", var_step, t_rt, 4,
                 pts_hyp, fq16)

    # scene scales at the profiled auto-grid (112,112,48)
    gx, gy, gz = 112, 112, 48
    dims = list(mc.unet_dims)
    scales = []
    for si, ch in enumerate(dims[::-1]):          # coarsest-first
        s = 2 ** (len(dims) - 1 - si)
        g = jax.random.normal(
            jax.random.fold_in(rng, si),
            (1, gx // s, gy // s, gz // s, ch), jnp.bfloat16)
        scales.append({"grid": g, "stride": s})
    origins = jnp.zeros((1, 3), jnp.float32)

    def pack_step(eps, *gs):
        octs = pack_scales([g + eps.astype(jnp.bfloat16) for g in gs])
        return sum(o.mean() for o in octs if o is not None) \
            .astype(jnp.float32)
    time_chained(f"D.pack_scales ({gx},{gy},{gz})", pack_step, t_rt, 4,
                 *[sc["grid"] for sc in scales])

    octs = jax.jit(lambda gs: pack_scales(gs))([sc["grid"] for sc in scales])
    jax.block_until_ready(octs)
    packed = [dict(sc, octs=o, dims=tuple(sc["grid"].shape[1:4]))
              for sc, o in zip(scales, octs)]
    q = pts_hyp.reshape(1, OC * H * P, 3)

    def sample_step(eps, q, *octs_in):
        pk = [dict(sc, octs=o) for sc, o in zip(packed, octs_in)]
        f = sample_scales(pk, q + eps, origins, mc.grid.edge_len)
        return f.mean().astype(jnp.float32)
    time_chained(f"D.sample_scales ({OC*H*P}q x3sc)", sample_step, t_rt, 4,
                 q, *octs)

    dec = HypothesisDecoder(mc.decoder_hidden, mc.hyp_ksize,
                            dtype=jnp.bfloat16)
    CF = sum(d for d in dims) + C   # scene feats + variance
    feats_dec = jax.random.normal(rng, (OC * P, H, CF), jnp.float32)
    dec_vars = dec.init(rng, feats_dec)

    def dec_step(eps, fd):
        p = dec.apply(dec_vars, fd + eps)
        return p.mean().astype(jnp.float32)
    time_chained(f"D.decoder ({OC*P}m,{H}h,{CF}c)", dec_step, t_rt, 4,
                 feats_dec)


if __name__ == "__main__":
    main()
