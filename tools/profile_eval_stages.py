"""Per-stage TPU timing of the WHOLE-SCENE EVAL path at its real chunk
shapes (chain-marginal method — see bench.py for why wall-clock via
block_until_ready is invalid under the axon tunnel).

Stages mirror `SceneInference.predict_scene` exactly:
  A extract_features   chunk of 32 images @ 256x320
  B initial_depth      chunk of 18 refs (k=2 -> 22 images), 96x56x56
  C model_scene        bucketed 64-ref scene batch, auto-sized grid
  D pointflow_multi    chunk of 16 refs x 3 offset passes
  E upsample           chunk of 48 refs, 3-stage to 256x320

Run (TPU must be otherwise idle):  python tools/profile_eval_stages.py
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tdvnet.config import load_config
from tdvnet.data import batch as B, synthetic
from tdvnet.eval.whole_scene import SceneInference, _bucket, _chunk_batch
from tdvnet.models.threedvnet import ThreeDVNet

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


def time_chained(name, step_fn, t_rt, k=K_CHAIN):
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
    print(f"{name:<34s} {t*1e3:9.2f} ms   (compile {t_compile:.0f}s)",
          flush=True)
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=52)
    ap.add_argument("--skip-scene", action="store_true",
                    help="skip the slow-compiling model_scene stage")
    args = ap.parse_args()

    cfg = load_config({"batch": {"n_scenes": 1, "n_ref": 7}})
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, dtype=jnp.bfloat16))
    bc = cfg.batch
    e = cfg.eval
    model = ThreeDVNet(cfg.model)

    # init params on a small training batch (shapes don't matter to params)
    scenes = [synthetic.make_batch_scene(bc.n_views, bc.img_size,
                                         bc.depth_img_size, seed=0)]
    fb = B.collate_scenes(scenes, bc.n_views, bc.n_ref,
                          bc.n_src_on_either_side)
    init_fn = jax.jit(lambda rng, batch: model.init(
        rng, batch, offsets=[0.05], n_iters=1, lam=0.0, train=False))
    variables = init_fn(jax.random.PRNGKey(0), fb)
    jax.block_until_ready(variables)
    print("params ready", flush=True)

    views = synthetic.make_scene(n_views=args.views, img_size=bc.img_size,
                                 seed=7)
    inf = SceneInference(model, variables, cfg)
    k = e.n_src_on_either_side
    R = args.views - 2 * k
    h, w = cfg.model.depth_test.size

    t_rt = measure_roundtrip()
    print(f"tunnel roundtrip: {t_rt*1e3:.1f} ms", flush=True)

    # one real predict_scene for reference wall-clock + the real grid
    t0 = time.perf_counter()
    depth_np = inf.predict_scene(views)
    print(f"predict_scene compile+run: {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    inf.predict_scene(views)
    t_wall = time.perf_counter() - t0
    print(f"predict_scene warm wall: {t_wall:.2f}s "
          f"({R / t_wall:.2f} ref-frames/s)", flush=True)
    gc = inf._choose_grid(views, depth_np[:, ::4, ::4], R)
    print(f"auto grid: {gc.grid_size}", flush=True)
    # coarse (depth_test.size) depth for the scene/pointflow stages —
    # predict_scene returns full-res upsampled maps
    yi = np.linspace(0, depth_np.shape[1] - 1, h).astype(int)
    xi = np.linspace(0, depth_np.shape[2] - 1, w).astype(int)
    depth_np = depth_np[:, yi[:, None], xi[None, :]]

    imgs32 = jnp.asarray(views["images"][:32])

    def feat_step(eps):
        return model.apply(variables, imgs32 + eps, False,
                           method="extract_features")[1].mean() \
            .astype(jnp.float32)
    t_feat = time_chained("A extract_features(32 imgs)", feat_step, t_rt,
                          k=4)

    # features for the whole scene (host-side staging for later stages)
    fh, fq, _ = jax.jit(lambda v, im: model.apply(
        v, im, False, method="extract_features"))(
        variables, jnp.asarray(views["images"]))
    jax.block_until_ready((fh, fq))

    IC = e.init_depth_batch
    cb18, _ = _chunk_batch(views, 0, min(IC, R), k, IC)
    q18 = fq[:IC + 2 * k]
    dc = cfg.model.depth_test

    def init_step(eps):
        d, _ = model.apply(variables, cb18, dc, q18 + eps, False,
                           method="initial_depth")
        return d.mean().astype(jnp.float32)
    t_init = time_chained(f"B initial_depth({IC}r,96d,56x56)", init_step,
                          t_rt, k=4)

    Rb = _bucket(R)
    scene_cb, _ = _chunk_batch(views, 0, R, k, Rb)
    q_all = fq
    if q_all.shape[0] < Rb + 2 * k:
        q_all = jnp.concatenate(
            [q_all, jnp.repeat(q_all[-1:], Rb + 2 * k - q_all.shape[0], 0)],
            0)
    d_pad = jnp.concatenate(
        [jnp.asarray(depth_np), jnp.zeros((Rb - R, h, w), jnp.float32)], 0)

    t_scene = 0.0
    if not args.skip_scene:
        def scene_step(eps):
            s, _, _ = model.apply(variables, d_pad + eps, q_all, scene_cb,
                                  gc, False, method="model_scene")
            return s[0]["grid"].mean().astype(jnp.float32)
        t_scene = time_chained(f"C model_scene(Rb={Rb},{gc.grid_size})",
                               scene_step, t_rt, k=3)

    scales, origins, _ = jax.jit(
        lambda v, d, q, b: model.apply(v, d, q, b, gc, False,
                                       method="model_scene"))(
        variables, d_pad, q_all, scene_cb)
    jax.block_until_ready(scales)

    OC = e.offset_batch
    cb16, _ = _chunk_batch(views, 0, min(OC, R), k, OC)
    q16 = fq[:OC + 2 * k]
    d16 = d_pad[:OC]
    offs = tuple(float(o) for o in (0.05, 0.05, 0.025))

    def pf_step(eps):
        d = model.apply(variables, scales, origins, d16 + eps, q16, cb16,
                        offs, 3, gc, False, method="run_pointflow_multi")
        return d.mean().astype(jnp.float32)
    t_pf = time_chained(f"D pointflow_multi({OC}r x3off)", pf_step, t_rt,
                        k=4)

    UC = min(e.upsample_batch, R)
    img_sel = np.clip(np.arange(UC) + k, 0, args.views - 1)
    imgs_u = jnp.asarray(views["images"][img_sel])
    half_u = fh[img_sel]
    quarter_u = fq[img_sel]
    ridx = jnp.arange(UC, dtype=jnp.int32)
    d_u = d_pad[:UC]

    def up_step(eps):
        d = model.apply(variables, d_u + eps, half_u, quarter_u, imgs_u,
                        ridx, False, method="upsample")
        return d.mean().astype(jnp.float32)
    t_up = time_chained(f"E upsample({UC}r,3 stages)", up_step, t_rt, k=4)

    n_feat = -(-args.views // 32)
    n_init = -(-R // IC)
    n_pf_chunks = -(-R // OC)
    total = (n_feat * t_feat + n_init * t_init + 2 * t_scene
             + 2 * n_pf_chunks * t_pf + t_up)
    print("\n--- modeled scene total (2 iterations) ---")
    print(f"A features   x{n_feat}:  {n_feat*t_feat*1e3:8.1f} ms")
    print(f"B init_depth x{n_init}:  {n_init*t_init*1e3:8.1f} ms")
    print(f"C scene      x2:  {2*t_scene*1e3:8.1f} ms")
    print(f"D pointflow  x{2*n_pf_chunks}:  {2*n_pf_chunks*t_pf*1e3:8.1f} ms")
    print(f"E upsample   x1:  {t_up*1e3:8.1f} ms")
    print(f"modeled compute total: {total:.2f}s   "
          f"(vs measured wall {t_wall:.2f}s; gap = dispatch/host)")


if __name__ == "__main__":
    main()
