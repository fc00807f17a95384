"""Sub-stage TPU profiling of eval stage B (initial depth) and stage C
(scene U-Net) — the two stages docs/ROOFLINE.md concedes are far off
their floors (B: 98 ms vs ~15 ms; C: 70 ms vs ~15 ms).

Splits stage B into its three sub-ops at the real eval chunk shapes
(18 refs / 22 imgs, 96 planes, 56x56, 32-ch bf16 features):

  B1 plane_sweep_cost_volume   (two-pass matmul warp + variance)
  B2 CostRegNet                (3-level 3D U-Net regularizer)
  B3 softmax + expectation     (depth regression epilogue)
  B  full predict_depth        (B1+B2+B3 fused in one jit)

and stage C into:

  C1 SceneUNet                 (masked dense U-Net, 112x112x48)
  C  full model_scene

Chain-marginal timing (see bench.py): K iterations inside one jit,
marginal time = (t(K)-t(1))/(K-1), cancels the tunnel roundtrip.

Run (TPU idle):  python tools/profile_initial_depth.py
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


def time_chained(name, step_fn, t_rt, k=K_CHAIN, arrays=()):
    # arrays are passed as jit ARGUMENTS: closed-over device arrays get
    # embedded as HLO constants, which both blows up the compile request
    # (tunnel HTTP 413 at 330 MB cost volumes) and defeats buffer reuse
    @jax.jit
    def chain(eps, *arrays):
        def body(e, _):
            return step_fn(e, *arrays) * 1e-20, None
        e, _ = jax.lax.scan(body, eps, None, length=k)
        return e

    t0 = time.perf_counter()
    c = chain.lower(jnp.float32(0.0), *arrays).compile()
    t_compile = time.perf_counter() - t0
    ca = c.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    fl = float(ca.get("flops", 0.0) or 0.0) / k
    float(c(jnp.float32(0.0), *arrays))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(c(jnp.float32(0.0), *arrays))
        ts.append(time.perf_counter() - t0)
    t = (float(np.median(ts)) - t_rt) / k
    tf = fl / max(t, 1e-9) / 1e12
    print(f"{name:<40s} {t*1e3:9.2f} ms  {fl/1e9:8.1f} GFLOP  "
          f"{tf:6.1f} TF/s  (compile {t_compile:.0f}s)", flush=True)
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--refs", type=int, default=18)
    ap.add_argument("--planes", type=int, default=96)
    ap.add_argument("--grid", type=int, nargs=3, default=(112, 112, 48))
    ap.add_argument("--skip-c", action="store_true")
    ap.add_argument("--skip-b", action="store_true")
    ap.add_argument("--impl", default="xla", choices=["xla", "im2col"],
                    help="3D-conv lowering for CostRegNet/SceneUNet")
    ap.add_argument("--warp-mode", default="auto",
                    choices=["auto", "matmul", "gather"])
    ap.add_argument("--src-unroll", type=int, default=None)
    ap.add_argument("--skip-b23", action="store_true")
    ap.add_argument("--c0", action="store_true",
                    help="also split the stage-C scatter path "
                         "(backproject/variance, voxelize, PointNet, "
                         "dense scatter) at the 48-ref bench shapes")
    args = ap.parse_args()

    from tdvnet.config import load_config
    from tdvnet.models.mvsnet import CostRegNet
    from tdvnet.models.scene_unet import SceneUNet
    from tdvnet.ops import costvolume

    cfg = load_config({})
    mc = cfg.model
    R = args.refs
    k = 2
    N = R + 2 * k
    D = args.planes
    h, w = mc.depth_test.size          # 56x56
    C = mc.feat_dim                    # 32
    dt = jnp.bfloat16

    t_rt = measure_roundtrip()
    print(f"tunnel roundtrip: {t_rt*1e3:.1f} ms", flush=True)

    # synthetic-but-plausible cameras: ring of N views looking at origin
    rng = np.random.RandomState(0)
    ths = np.linspace(0, 0.8, N)
    rot, tv = [], []
    for th in ths:
        c_, s_ = np.cos(th), np.sin(th)
        Rm = np.array([[c_, 0, s_], [0, 1, 0], [-s_, 0, c_]], np.float32)
        rot.append(Rm)
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
    feats = jnp.asarray(rng.randn(N, 64, 80, C), dt)

    wdt = dt

    def b1(eps, feats):
        var = costvolume.plane_sweep_cost_volume(
            feats + eps.astype(dt), rot, tv, Ks, ref_idx, src_idx, src_mask,
            0.5, 0.05, D, mc.img_size, (h, w), mode=args.warp_mode,
            alpha_max=0.25, weights_dtype=wdt, src_unroll=args.src_unroll)
        return var.astype(jnp.float32).mean()
    if not args.skip_b:
        time_chained(f"B1 cost_volume({R}r,{D}d,{h}x{w}) "
                     f"[{args.warp_mode},u{args.src_unroll}]", b1, t_rt,
                     arrays=(feats,))

    reg = CostRegNet(mc.cost_base_channels, dtype=dt, impl=args.impl)
    var0 = jnp.asarray(rng.randn(R, D, h, w, C), dt)
    vreg = reg.init(jax.random.PRNGKey(0), var0, False)

    def b2(eps, vreg, var0):
        return reg.apply(vreg, var0 + eps.astype(dt),
                         False)[..., 0].astype(jnp.float32).mean()
    if not args.skip_b and not args.skip_b23:
        time_chained(f"B2 CostRegNet({R}x{D}x{h}x{w}x{C}) [{args.impl}]",
                     b2, t_rt, arrays=(vreg, var0))

    cost0 = jnp.asarray(rng.randn(R, D, h, w), jnp.float32)
    dvals = jnp.linspace(0.5, 0.5 + 0.05 * (D - 1), D, dtype=jnp.float32)

    def b3(eps, cost0):
        prob = jax.nn.softmax(-(cost0 + eps), axis=1)
        return jnp.sum(prob * dvals[None, :, None, None], axis=1).mean()
    if not args.skip_b and not args.skip_b23:
        time_chained("B3 softmax+expectation", b3, t_rt, arrays=(cost0,))

    if not args.skip_c:
        X, Y, Z = args.grid
        unet = SceneUNet(mc.unet_dims, mc.unet_groups, mc.unet_res, dtype=dt,
                         impl=args.impl)
        vox = jnp.asarray(rng.randn(1, X, Y, Z, mc.unet_dims[0]), dt)
        mask = jnp.asarray(rng.rand(1, X, Y, Z, 1) < 0.12)
        vu = unet.init(jax.random.PRNGKey(0), vox, mask)

        def c1(eps, vu, vox, mask):
            scales = unet.apply(vu, vox + eps.astype(dt), mask)
            return sum(s["grid"].astype(jnp.float32).mean()
                       for s in scales)
        time_chained(f"C1 SceneUNet({X}x{Y}x{Z}) [{args.impl}]", c1, t_rt,
                     arrays=(vu, vox, mask))

    if args.c0:
        # stage-C scatter path sub-ops at the 48-keyframe bench shapes
        # (VERDICT r4 #2: ~45 ms of the 70 ms model_scene wall is NOT the
        # U-Net — split point-cloud / voxelize / PointNet / dense-scatter)
        from tdvnet.models.pointnet import PointNet
        from tdvnet.ops import camera, costvolume
        from tdvnet.ops import voxelize as vox_ops

        Rb = 48
        X, Y, Z = args.grid
        NA = 65536                       # eval_max_anchors
        edge = mc.grid.edge_len
        Nall = Rb + 2 * k
        # reuse the ring cameras, extended to Rb refs
        ths2 = np.linspace(0, 0.8, Nall)
        rot2, tv2 = [], []
        for th in ths2:
            c_, s_ = np.cos(th), np.sin(th)
            rot2.append(np.array([[c_, 0, s_], [0, 1, 0], [-s_, 0, c_]],
                                 np.float32))
            tv2.append(np.array([0.1 * th, 0, 2.0], np.float32))
        rot2 = jnp.asarray(np.stack(rot2))
        tv2 = jnp.asarray(np.stack(tv2))
        Ks2 = jnp.asarray(np.tile(Km, (Nall, 1, 1)))
        ref2 = jnp.arange(Rb, dtype=jnp.int32) + k
        src2 = jnp.clip(ref2[:, None]
                        + jnp.arange(-k, k + 1, dtype=jnp.int32)[None],
                        0, Nall - 1)
        smask2 = jnp.ones((Rb, 2 * k + 1), bool)
        feats2 = jnp.asarray(rng.randn(Nall, 64, 80, C), dt)
        depth2 = jnp.asarray(1.0 + rng.rand(Rb, h, w).astype(np.float32))
        P = h * w

        def pts_of(depth2):
            return camera.backproject_grid(depth2, Ks2[ref2], rot2[ref2],
                                           tv2[ref2], mc.img_size)

        def ca(eps, depth2, feats2):
            pts = pts_of(depth2 + eps)
            var = costvolume.hypothesis_point_variance(
                pts, feats2, src2, smask2, rot2, tv2, Ks2, mc.img_size)
            return var.mean()
        time_chained(f"C0a backproject+variance ({Rb}x{P})", ca, t_rt,
                     arrays=(depth2, feats2))

        pts0 = pts_of(depth2)
        pts_flat0 = pts0.reshape(-1, 3)
        scene0 = jnp.zeros((Rb * P,), jnp.int32)
        valid0 = jnp.ones((Rb * P,), bool)

        def cb(eps, pts_flat0):
            vg = vox_ops.voxelize(pts_flat0 + eps, scene0, valid0, edge,
                                  (X, Y, Z), NA, 1)
            return vg.anchor_center.mean() + vg.point2anchor.sum() * 1e-9

        time_chained(f"C0b voxelize ({Rb*P} pts, {NA} anchors)", cb, t_rt,
                     arrays=(pts_flat0,))

        vg0 = vox_ops.voxelize(pts_flat0, scene0, valid0, edge, (X, Y, Z),
                               NA, 1)
        pnet = PointNet(4 * C, 2 * C, dtype=dt)
        xin0 = jnp.asarray(rng.randn(Rb * P, 3 + C), jnp.float32)
        vp = pnet.init(jax.random.PRNGKey(0), xin0, vg0.point2anchor,
                       vg0.point_valid, NA)

        def cc(eps, vp, xin0, p2a, pvalid):
            out = pnet.apply(vp, xin0 + eps, p2a, pvalid, NA)
            return out.astype(jnp.float32).mean()
        time_chained(f"C0c PointNet ({Rb*P} pts -> {NA} anchors)", cc, t_rt,
                     arrays=(vp, xin0, vg0.point2anchor, vg0.point_valid))

        af0 = jnp.asarray(rng.randn(NA, 2 * C), dt)

        def cd(eps, af0):
            dense, occ = vox_ops.scatter_anchors_to_dense(
                af0 + eps.astype(dt), vg0, (X, Y, Z), 1)
            return dense.astype(jnp.float32).mean() \
                + occ.astype(jnp.float32).mean()
        time_chained(f"C0d scatter_to_dense ({NA} -> {X}x{Y}x{Z})", cd,
                     t_rt, arrays=(af0,))


if __name__ == "__main__":
    main()
