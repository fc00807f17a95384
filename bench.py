"""Grounded throughput benchmark: FLOPs, step time, MFU on the real chip.

Two graphs are measured (VERDICT r1 "Next round" #1):

1. **Whole-scene streaming eval** — the reference's operating point
   (`mv3d/eval-3dvnet.py`): 48 keyframes at 256x320, 96-plane 56x56 cost
   volumes, one global 160x160x64 scene volume per refinement iteration,
   chunked stages 18/16/100.  Headline metric: ref-frames/s end-to-end
   (wall clock of `SceneInference.predict_scene`, which fetches results to
   host so the timing is forced-real).  FLOPs are accumulated per executed
   XLA executable via `CountingJit` cost analyses.

2. **Training-shape forward** (1 scene x (7 ref + 2 src) @ 256x320, 64^3
   grid) — timed with the *marginal chained-scan* method: the remote-TPU
   tunnel's `block_until_ready` does NOT wait for device execution (a
   9-TFLOP matmul "finishes" in 0.1 ms), so the only honest timing is to
   chain K data-dependent iterations inside one jit, fetch a scalar (host
   fetch forces completion), and difference two chain lengths:
   t_step = (t(K2) - t(K1)) / (K2 - K1).  This also cancels the ~30 ms
   tunnel roundtrip.  Validated against bf16 8192^3 matmul chains: 175-181
   TFLOP/s marginal = 89-92% of v5e peak.

MFU = measured_flops / time / chip_peak, with the chip identified from
`jax.devices()[0].device_kind` (never asserted in prose).

vs_baseline derivation (the reference never measures throughput — SURVEY
§6 gap row): the reference runs torch fp32 on one RTX 3090 (peak 35.6
TFLOP/s, `mv3d/config.py:3-4`).  Gather-heavy eager-mode MVS pipelines
typically sustain 10-20% of peak; we assume 15% => est. reference
throughput = 0.15 * 35.6e12 / flops_per_frame.  The north star is >=2x the
reference per chip, so vs_baseline = ours / (2 * ref_est) and >= 1.0 means
the target is met.
"""
from __future__ import annotations

import os
import dataclasses
import functools
import json
import sys
import time

# chip peaks: dense peak (TFLOP/s) for the precision the model computes in
# (bf16), HBM bandwidth (GB/s).  Sources: public TPU spec sheets.
CHIP_PEAKS = {
    "TPU v5 lite": {"bf16_tflops": 197.0, "hbm_gbps": 819.0},   # v5e
    "TPU v5e": {"bf16_tflops": 197.0, "hbm_gbps": 819.0},
    "TPU v5": {"bf16_tflops": 459.0, "hbm_gbps": 2765.0},       # v5p
    "TPU v5p": {"bf16_tflops": 459.0, "hbm_gbps": 2765.0},
    "TPU v4": {"bf16_tflops": 275.0, "hbm_gbps": 1228.0},
    "TPU v6 lite": {"bf16_tflops": 918.0, "hbm_gbps": 1640.0},  # v6e
    "TPU v6e": {"bf16_tflops": 918.0, "hbm_gbps": 1640.0},
}

REF_GPU_FP32_PEAK = 35.6e12   # RTX 3090 (mv3d/config.py:3-4)
REF_ASSUMED_UTIL = 0.15       # see module docstring
TARGET_MULT = 2.0             # north star: >=2x reference per chip

EVAL_N_VIEWS = 52             # 48 refs + 2*2 src margin at eval k=2
EVAL_N_SCENES = 5             # pipelined stream length (steady state)
CHAIN_K = 5                   # chained iterations; K=1 point is the plain fwd


def _flops_of(compiled) -> float:
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", 0.0) or 0.0)


def main():
    import argparse

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tdvnet.config import load_config
    from tdvnet.data import batch as B, synthetic
    from tdvnet.models.threedvnet import ThreeDVNet

    ap = argparse.ArgumentParser()
    path_group = ap.add_mutually_exclusive_group()
    path_group.add_argument("--fast-path", action="store_true",
                            help="bench ONLY the validated fast path "
                                 "(int8 scene tables + adaptive iter-2 "
                                 "offsets)")
    path_group.add_argument("--parity", action="store_true",
                            help="bench ONLY the strict-parity op mix "
                                 "(old default). Default with neither "
                                 "flag: headline = fast path, parity "
                                 "path also measured and reported as "
                                 "parity_fps in the same line")
    ap.add_argument("--skip-train-fwd", action="store_true",
                    help="skip the training-shape forward measurement "
                         "(eval-only quick run)")
    ap.add_argument("--fast-rank", type=int, default=None,
                    help="fast-path sampling-interface rank (default: "
                         "EvalConfig.fast_rank)")
    ap.add_argument("--fast-patch", action="store_true",
                    help="fast-path patch-fan image variance "
                         "(EvalConfig.fast_patch)")
    args, _ = ap.parse_known_args()

    dev = jax.devices()[0]
    chip = dev.device_kind
    peak = CHIP_PEAKS.get(chip)
    peak_fl = peak["bf16_tflops"] * 1e12 if peak else None

    cfg = load_config({"batch": {"n_scenes": 1, "n_ref": 7},
                       **({"eval": {
                           **({"fast_rank": args.fast_rank}
                              if args.fast_rank is not None else {}),
                           **({"fast_patch": True}
                              if args.fast_patch else {})}}
                          if (args.fast_rank is not None
                              or args.fast_patch) else {})})
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, dtype=jnp.bfloat16))
    bc = cfg.batch

    model = ThreeDVNet(cfg.model)
    scenes = [synthetic.make_batch_scene(bc.n_views, bc.img_size,
                                         bc.depth_img_size, seed=s)
              for s in range(bc.n_scenes)]
    fb = B.collate_scenes(scenes, bc.n_views, bc.n_ref,
                          bc.n_src_on_either_side)

    t0 = time.perf_counter()
    init_fn = jax.jit(lambda rng, batch: model.init(
        rng, batch, offsets=[0.05], n_iters=1, lam=0.0, train=False))
    variables = init_fn(jax.random.PRNGKey(0), fb)
    jax.block_until_ready(variables)
    print(f"init: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    # ---- graph 2: training-shape forward, marginal chained timing ----
    if args.skip_train_fwd:
        t_step = fl_step = fwd_fps = fwd_mfu = None
        return _eval_bench(args, jax, jnp, np, cfg, model, variables, bc,
                           chip, peak, peak_fl, t_step, fl_step, fwd_fps,
                           fwd_mfu)

    @functools.partial(jax.jit, static_argnames=("length",))
    def chain(variables, batch, length):
        def body(eps, _):
            b = dataclasses.replace(batch, images=batch.images + eps)
            out = model.apply(variables, b, offsets=[0.05, 0.05, 0.025],
                              n_iters=2, lam=1.0, train=False,
                              with_metrics=False)
            d = out["depth_pred"]
            # scalar carry keeps iterations data-dependent (no CSE/elision)
            return (d.mean() * 1e-12).astype(jnp.float32), d.mean()
        eps, means = jax.lax.scan(body, jnp.float32(0.0), None, length=length)
        return eps, means

    t0 = time.perf_counter()
    chain_c = chain.lower(variables, fb, length=CHAIN_K).compile()
    print(f"compile chain K={CHAIN_K}: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

    # XLA cost analysis reports scan-body FLOPs once regardless of trip
    # count, so FLOPs/step come from a plain (non-scanned) forward — which
    # doubles as the K=1 timing point for the marginal method.
    fwd_plain = jax.jit(lambda v, b: model.apply(
        v, b, offsets=[0.05, 0.05, 0.025], n_iters=2, lam=1.0, train=False,
        with_metrics=False)["depth_pred"].mean())
    t0 = time.perf_counter()
    plain_c = fwd_plain.lower(variables, fb).compile()
    print(f"compile plain fwd: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)
    fl_step = _flops_of(plain_c)

    def fetch_chain():
        t0 = time.perf_counter()
        _, means = chain_c(variables, fb)
        m = np.asarray(means)                  # host fetch forces execution
        assert np.isfinite(m).all() and 0.0 < float(m[-1]) < 65.0, \
            f"implausible depth means {m}"
        return time.perf_counter() - t0

    def fetch_plain():
        t0 = time.perf_counter()
        m = float(plain_c(variables, fb))
        assert np.isfinite(m) and 0.0 < m < 65.0, f"implausible mean {m}"
        return time.perf_counter() - t0

    fetch_plain(); fetch_chain()               # warm both executables
    t1 = float(np.median([fetch_plain() for _ in range(3)]))
    t2 = float(np.median([fetch_chain() for _ in range(3)]))
    t_step = max((t2 - t1) / (CHAIN_K - 1), 1e-9)
    fwd_fps = fb.n_refs / t_step
    fwd_mfu = fl_step / t_step / peak_fl if peak_fl else None
    print(f"train-forward: {t_step*1e3:.1f} ms/step, "
          f"{fl_step/1e9:.1f} GFLOP/step, fps={fwd_fps:.1f}, "
          f"mfu={fwd_mfu if fwd_mfu is None else round(fwd_mfu, 3)}",
          file=sys.stderr)

    _eval_bench(args, jax, jnp, np, cfg, model, variables, bc, chip, peak,
                peak_fl, t_step, fl_step, fwd_fps, fwd_mfu)


def _eval_bench(args, jax, jnp, np, cfg, model, variables, bc, chip, peak,
                peak_fl, t_step, fl_step, fwd_fps, fwd_mfu):
    # ---- graph 1: whole-scene streaming eval (headline) ----
    # pipelined fused driver: the reference's operating point is a stream
    # of scenes (mv3d/eval/main.py:43); scene i+1's upload/prep overlaps
    # scene i's refine, so steady state measures device compute
    from tdvnet.data import synthetic
    from tdvnet.eval.fused_scene import FusedSceneInference

    views_list = [synthetic.make_scene(n_views=EVAL_N_VIEWS,
                                       img_size=bc.img_size, seed=7 + i)
                  for i in range(EVAL_N_SCENES)]

    def measure(fast: bool):
        inf = FusedSceneInference(model, variables, cfg, count_flops=True,
                                  fast_path=fast)
        t0 = time.perf_counter()
        depth = inf.predict_scene(views_list[0])   # compiles + first run
        print(f"eval-path (fast={fast}) compile+first run: "
              f"{time.perf_counter()-t0:.1f}s", file=sys.stderr)
        assert np.isfinite(depth).all() and 0.0 < float(depth.mean()) < 65.0
        R = depth.shape[0]
        inf.reset_flops()
        t0 = time.perf_counter()
        n_scenes = 0
        for depth in inf.predict_scenes(views_list):
            assert np.isfinite(depth).all() \
                and 0.0 < float(depth.mean()) < 65.0
            n_scenes += 1
        t_eval = (time.perf_counter() - t0) / n_scenes
        eval_flops = inf.flops_executed() / n_scenes
        if getattr(inf, "timeline", None):
            # TDVNET_EVAL_TIMELINE=1: per-scene host-phase medians — the
            # steady-state device wall lives in bbox_refine_dispatch; the
            # other two phases are the non-compute bubble (VERDICT r4 #8)
            tl = inf.timeline[1:] or inf.timeline
            med = {k: float(np.median([t[k] for t in tl])) for k in tl[0]}
            print(f"eval timeline medians (fast={fast}): "
                  + ", ".join(f"{k}={v*1e3:.0f}ms" for k, v in med.items()),
                  file=sys.stderr)
        return R / t_eval, t_eval, eval_flops / R, eval_flops, R

    # default (neither flag): headline = the quality-gated fast path,
    # strict-parity path also measured into parity_* fields (one number
    # story: BASELINE.md quotes this line)
    parity_fps = parity_secs = None
    if not args.fast_path and not args.parity:
        parity_fps, parity_secs, _, _, _ = measure(fast=False)
        headline_fast = True
    else:
        headline_fast = bool(args.fast_path)
    eval_fps, t_eval, fl_frame, eval_flops, R = measure(fast=headline_fast)
    eval_mfu = eval_flops / t_eval / peak_fl if peak_fl else None

    # vs_baseline denominator: the REFERENCE graph's per-frame FLOPs
    # (docs/REF_FLOPS.json, tools/measure_ref_flops.py) — NOT ours, which
    # change with our own optimizations (VERDICT r2 #5).  Falls back to our
    # measured FLOPs if the measurement file is absent.
    ref_flops_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  "docs", "REF_FLOPS.json")
    if os.path.exists(ref_flops_path):
        with open(ref_flops_path) as f:
            ref_flops = json.load(f)["ref_flops_per_frame_gflop"] * 1e9
        ref_src = "measured reference graph (docs/REF_FLOPS.json)"
    else:
        ref_flops = fl_frame
        ref_src = "fallback: our measured FLOPs/frame"

    ref_est_fps = REF_GPU_FP32_PEAK * REF_ASSUMED_UTIL / ref_flops
    # sensitivity: eager-torch GPU utilization is the one unmeasurable
    # constant; report the vs_baseline band over util in [0.08, 0.30]
    vs_band = [round(eval_fps / (TARGET_MULT * REF_GPU_FP32_PEAK * u
                                 / ref_flops), 3)
               for u in (0.30, 0.08)]
    pf = ("int8-table 3+1-pass pointflow (fast path)" if headline_fast
          else "2x3 pointflow")
    print(json.dumps({
        "metric": "eval_depth_fps_per_chip",
        "value": round(eval_fps, 2),
        "unit": "ref-frames/s, pipelined whole-scene streaming eval "
                "(5-scene steady state, 48 keyframes @256x320, auto-sized "
                f"scene grid, {pf}, 3-stage upsample)",
        "fast_path": headline_fast,
        "parity_fps": None if parity_fps is None else round(parity_fps, 2),
        "parity_scene_seconds": None if parity_secs is None
        else round(parity_secs, 3),
        "vs_baseline": round(eval_fps / (TARGET_MULT * ref_est_fps), 3),
        "chip": chip,
        "peak_bf16_tflops": peak["bf16_tflops"] if peak else None,
        "eval_flops_per_frame": round(fl_frame / 1e9, 2),
        "eval_flops_unit": "GFLOP/ref-frame (XLA cost analysis, executed "
                           "executables)",
        "eval_scene_seconds": round(t_eval, 3),
        "eval_mfu": None if eval_mfu is None else round(eval_mfu, 4),
        "train_forward_ms": None if t_step is None else round(t_step * 1e3, 2),
        "train_forward_fps": None if fwd_fps is None else round(fwd_fps, 1),
        "train_forward_gflop": None if fl_step is None
        else round(fl_step / 1e9, 1),
        "train_forward_mfu": None if fwd_mfu is None else round(fwd_mfu, 4),
        "ref_est_fps_3090": round(ref_est_fps, 1),
        "ref_flops_per_frame_gflop": round(ref_flops / 1e9, 2),
        "ref_flops_source": ref_src,
        "ref_est_derivation": "0.15 util x 35.6 TFLOP/s fp32 (RTX 3090) "
                              "/ REFERENCE-graph FLOPs per frame "
                              "(tools/measure_ref_flops.py)",
        "vs_baseline_util_band_0.30_0.08": vs_band,
    }))


if __name__ == "__main__":
    main()
