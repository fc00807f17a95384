"""Training-step roofline: per-stage fwd and fwd+bwd walls (VERDICT r4 #7).

The eval path got the round-4 sub-op treatment (docs/ROOFLINE.md §3/§5);
this applies the same discipline to the TRAINING step at the bench shape
(1 scene x (7 ref + 2 src) @ 256x320, grid_train default, n_iters=2,
offsets [0.05, 0.05, 0.025] — the reference's late-epoch regime,
`mv3d/lightningmodel.py:273-274`).

Method: prefix-differencing.  Build jitted losses that run successive
PREFIXES of the real forward —

  AB    features + initial depth + supervision      (stages A+B)
  ABC   + model_scene of iteration 1 (surrogate loss on the scales)
  I1    + 3 pointflow offsets = full n_iters=1 refinement
  I2    + second (model_scene + 3 offsets) iteration
  FULL  + 3-stage upsampling = the real training loss

— and time each both forward-only and under `jax.value_and_grad` wrt
params (chain-marginal: K data-dependent iterations inside one jit,
(t(K)-t(1))/(K-1) cancels the ~30 ms tunnel roundtrip; see bench.py).
Successive differences attribute each stage's fwd and fwd+bwd cost as
compiled IN CONTEXT (XLA fusion across stage boundaries included);
the surrogate scale loss in ABC makes the scene U-Net's backward run
without pointflow (its true consumer), so C's bwd split is approximate
to within the fusion slack between C and D.

The full optax train step (value_and_grad + adam + BN-stat updates,
`tdvnet/train/loop.py:make_train_step`) is measured separately as the
ground-truth total; remat on/off is a flag.

Run (TPU idle):  python tools/profile_train_step.py
"""
from __future__ import annotations

import argparse
import dataclasses
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

K_CHAIN = 4
REPS = 3
OFFSETS = [0.05, 0.05, 0.025]


def measure_roundtrip():
    f = jax.jit(lambda x: x * 2.0).lower(jnp.float32(1.0)).compile()
    float(f(jnp.float32(1.0)))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(jnp.float32(1.0)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def flops_of(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", 0.0) or 0.0)


def time_chained(name, scalar_fn, variables, fb, t_rt, k=K_CHAIN,
                 lower_only=False):
    """scalar_fn(variables, batch, eps) -> f32 scalar; eps keeps the chain
    data-dependent (eps' = out * 1e-20 perturbs batch.images next iter)."""

    @functools.partial(jax.jit, static_argnames=("length",))
    def chain(variables, batch, length):
        def body(eps, _):
            b = dataclasses.replace(batch, images=batch.images + eps)
            out = scalar_fn(variables, b)
            return (out * 1e-20).astype(jnp.float32), out
        eps, outs = jax.lax.scan(body, jnp.float32(0.0), None, length=length)
        return eps, outs

    if lower_only:
        t0 = time.perf_counter()
        chain.lower(variables, fb, length=1)
        print(f"{name:<26s} lowered ok ({time.perf_counter()-t0:.1f}s)",
              flush=True)
        return 0.0, 0.0

    t0 = time.perf_counter()
    c = chain.lower(variables, fb, length=k).compile()
    t_compile = time.perf_counter() - t0
    fl = flops_of(c) / k  # scan body counted once by cost_analysis

    def fetch():
        t0 = time.perf_counter()
        _, outs = c(variables, fb)
        o = np.asarray(outs)
        assert np.isfinite(o).all(), f"{name}: non-finite {o}"
        return time.perf_counter() - t0

    fetch()
    ts = [fetch() for _ in range(REPS)]
    t = max((float(np.median(ts)) - t_rt) / k, 1e-9)
    tf = fl / t / 1e12
    print(f"{name:<26s} {t*1e3:9.1f} ms  {fl/1e9:8.1f} GFLOP  "
          f"{tf:6.2f} TF/s  (compile {t_compile:.0f}s)", flush=True)
    return t, fl


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--remat", action="store_true",
                    help="jax.checkpoint the forward in the grad losses")
    ap.add_argument("--skip-fwd", action="store_true")
    ap.add_argument("--skip-grad", action="store_true")
    ap.add_argument("--full-step", action="store_true",
                    help="also measure the real optax train step "
                         "(fwd+bwd+adam+BN updates)")
    ap.add_argument("--lower-only", action="store_true",
                    help="trace + lower every graph (no device execution) "
                         "— CPU smoke check of the prefix plumbing")
    ap.add_argument("--stages", default="AB,ABC,I1,I2,FULL",
                    help="comma subset of AB,ABC,I1,I2,FULL (tunnel "
                         "compiles are slow; AB,I1,FULL alone give the "
                         "headline split)")
    args = ap.parse_args()

    from tdvnet.config import load_config
    from tdvnet.data import batch as B, synthetic
    from tdvnet.models.threedvnet import ThreeDVNet
    from tdvnet.eval.metrics2d import mae_loss
    from tdvnet.ops.sampling import resize_nearest

    cfg = load_config({"batch": {"n_scenes": 1, "n_ref": 7}})
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, dtype=jnp.bfloat16))
    bc = cfg.batch
    model = ThreeDVNet(cfg.model)
    scenes = [synthetic.make_batch_scene(bc.n_views, bc.img_size,
                                         bc.depth_img_size, seed=s)
              for s in range(bc.n_scenes)]
    fb = B.collate_scenes(scenes, bc.n_views, bc.n_ref,
                          bc.n_src_on_either_side)

    if args.lower_only:
        t_rt = 0.0
        variables = jax.eval_shape(
            lambda rng, batch: model.init(
                rng, batch, offsets=[0.05], n_iters=1, lam=0.0, train=False),
            jax.random.PRNGKey(0), fb)
        variables = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), variables)
    else:
        t_rt = measure_roundtrip()
        print(f"tunnel roundtrip: {t_rt*1e3:.1f} ms", flush=True)
        init_fn = jax.jit(lambda rng, batch: model.init(
            rng, batch, offsets=[0.05], n_iters=1, lam=0.0, train=False))
        variables = init_fn(jax.random.PRNGKey(0), fb)
        jax.block_until_ready(jax.tree_util.tree_leaves(variables)[0])

    dc = cfg.model.depth_train
    w_ref_of = lambda b: b.ref_mask.astype(jnp.float32)

    # ---- forward prefixes, mirroring ThreeDVNet.__call__ exactly ----
    def prefix(mdl, batch, stage: str):
        w_ref = w_ref_of(batch)
        fh, fq, _ = mdl.extract_features(batch.images, False)
        depth, _ = mdl.initial_depth(batch, dc, fq, False)
        gt = batch.depth_gt

        def sup(pred):
            gt_s = resize_nearest(gt, pred.shape[-2:])
            return mae_loss(pred, gt_s, dc.depth_interval, w_ref)

        total = sup(depth)
        if stage == "AB":
            return total
        n_iters = {"ABC": 1, "I1": 1, "I2": 2, "FULL": 2}[stage]
        for it in range(n_iters):
            scales, origins, _ = mdl.model_scene(depth, fq, batch, None, False)
            if stage == "ABC" and it == 0:
                # surrogate: U-Net bwd runs without pointflow downstream
                return total + sum(jnp.mean(sc["grid"]).astype(jnp.float32)
                                   for sc in scales) * 1e-12
            for off in OFFSETS:
                depth = depth + mdl.run_pointflow(
                    scales, origins, depth, fq, batch, off, 3, None, False)
                total = total + sup(depth)
        if stage in ("I1", "I2"):
            return total
        ref_i = batch.ref_idx
        depth = resize_nearest(depth, fq.shape[1:3])
        depth = mdl.refine_quarter(fq[ref_i], depth, False)
        total = total + sup(depth)
        depth = resize_nearest(depth, fh.shape[1:3])
        depth = mdl.refine_half(fh[ref_i], depth, False)
        total = total + sup(depth)
        depth = resize_nearest(depth, batch.images.shape[1:3])
        depth = mdl.refine_full(batch.images[ref_i], depth, False)
        return total + sup(depth)

    stages = [t for t in args.stages.split(",")
              if t in ("AB", "ABC", "I1", "I2", "FULL")]
    fwd_t, grad_t = {}, {}

    if not args.skip_fwd:
        print("\n-- forward only --")
        for s in stages:
            def f(v, b, s=s):
                return model.apply(v, b, s, method=prefix).astype(jnp.float32)
            fwd_t[s], _ = time_chained(f"fwd {s}", f, variables, fb, t_rt,
                                       lower_only=args.lower_only)

    if not args.skip_grad:
        print("\n-- forward + backward (grad wrt params) --")
        for s in stages:
            def loss_fn(params, b, s=s):
                v = {"params": params,
                     "batch_stats": variables.get("batch_stats", {})}
                fn = functools.partial(model.apply, v)
                if args.remat:
                    fn = jax.checkpoint(fn)
                return fn(b, s, method=prefix).astype(jnp.float32)

            def g(v, b, s=s):
                loss, grads = jax.value_and_grad(
                    functools.partial(loss_fn, s=s))(v["params"], b)
                # touch every grad leaf so XLA cannot DCE the backward
                gsum = sum(jnp.sum(jnp.abs(x).astype(jnp.float32)) * 1e-20
                           for x in jax.tree_util.tree_leaves(grads))
                return loss + gsum
            grad_t[s], _ = time_chained(f"grad {s}", g, variables, fb, t_rt,
                                        lower_only=args.lower_only)

    if fwd_t and grad_t and not args.lower_only:
        print("\n-- stage attribution (differences, ms) --")
        print(f"{'stage':<28s} {'fwd':>8s} {'fwd+bwd':>8s} {'bwd':>8s}")

        def row(name, a, b=None):
            if a not in fwd_t or (b is not None and b not in fwd_t):
                return
            fw = (fwd_t[a] - (fwd_t[b] if b else 0.0)) * 1e3
            gb = (grad_t[a] - (grad_t[b] if b else 0.0)) * 1e3
            print(f"{name:<28s} {fw:8.1f} {gb:8.1f} {gb-fw:8.1f}")

        row("A+B feats+init depth", "AB")
        row("C scene model (iter1)", "ABC", "AB")
        row("D pointflow x3 (iter1)", "I1", "ABC")
        row("C+D refinement (iter1)", "I1", "AB")
        row("C+D iteration 2", "I2", "I1")
        row("E upsample x3", "FULL", "I2")
        row("E ups (vs I1, if no I2)", "FULL", "I1")
        row("TOTAL full fwd/step", "FULL")

    if args.full_step:
        print("\n-- real optax train step (loop.make_train_step) --")
        from tdvnet.train.loop import create_state, make_train_step
        if args.remat:
            cfg2 = dataclasses.replace(
                cfg, train=dataclasses.replace(cfg.train, remat=True))
        else:
            cfg2 = cfg
        _, state = create_state(cfg2, jax.random.PRNGKey(0), fb)
        step = make_train_step(model, cfg2, n_iters=2, donate=False)
        lam = jnp.float32(1.0)
        t0 = time.perf_counter()
        state2, m = step(state, fb, lam)
        jax.block_until_ready(m["loss"])
        print(f"compile+first step: {time.perf_counter()-t0:.1f}s")
        ts = []
        for _ in range(REPS + 1):
            t0 = time.perf_counter()
            _, m = step(state, fb, lam)
            v = float(m["loss"])
            assert np.isfinite(v)
            ts.append(time.perf_counter() - t0)
        t = float(np.median(ts[1:])) - t_rt
        print(f"train step wall: {t*1e3:.1f} ms "
              f"(fwd+bwd+adam+BN, remat={args.remat})")


if __name__ == "__main__":
    main()
