"""Standing fast-path quality gate: parity vs fast op-mix on N unseen scenes.

VERDICT r4 #3: the round-4 gate rested on 2 unseen scenes, which cannot
catch a real abs_rel regression.  This tool is the acceptance harness for
EVERY op-mix change (int8 tables, adaptive pointflow, splatting, ...):

  python tools/fastpath_gate.py --workdir /tmp/gate --scenes 12

runs the shipped flagship checkpoint through the full whole-scene eval
harness twice (strict parity and the candidate fast path) on unseen
synthetic scenes (seed-base 100), then reports per-metric mean +/- spread
(std, min, max over scenes) and the per-scene-paired delta for every
metric.  Pass criteria (printed, and exit code 1 on failure):

  - paired mean |d(abs_rel)| <= tol_abs_rel  (default 0.002)
  - paired mean d(fscore)    >= -tol_fscore  (default 0.01)

Paired per-scene deltas (fast_i - parity_i) have far lower variance than
the difference of means — the scenes are identical, so scene difficulty
cancels.  Results land in <workdir>/gate_report.json and a markdown table
on stdout (BASELINE.md quotes it).
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

METRICS_2D = ["abs_rel", "sq_rel", "rmse", "abs_diff", "abs_inv",
              "d_125", "d_125_2", "d_125_3"]
METRICS_3D = ["acc", "comp", "prec", "recal", "fscore"]


def per_scene_metrics(results_dir: str, name: str):
    """[{metric: value}] per scene, 2D + 3D merged, sorted by scene."""
    scenes_dir = os.path.join(results_dir, name, "scenes")
    rows = {}
    for s in sorted(os.listdir(scenes_dir)):
        row = {}
        d2 = os.path.join(scenes_dir, s, "metrics_2d.json")
        if os.path.exists(d2):
            m = json.load(open(d2))
            row.update({k: m[k] for k in METRICS_2D if k in m})
        import glob
        for p in glob.glob(os.path.join(scenes_dir, s, "metrics_3d_*.json")):
            m = json.load(open(p))
            row.update({k: m[k] for k in METRICS_3D if k in m})
        rows[s] = row
    return rows


def run_path(workdir: str, ckpt: str, n_scenes: int, fast: bool,
             seed_base: int, views: int, extra: list, fast_rank: int = 0,
             fast_patch: bool = False):
    name = ("gate_fast" + (f"_r{fast_rank}" if fast_rank else "")
            + ("_p" if fast_patch else "")) \
        if fast else "gate_parity"
    cmd = [sys.executable, os.path.join(REPO, "tools", "run_synthetic_eval.py"),
           "--workdir", workdir, "--scenes", str(n_scenes),
           "--views", str(views), "--ckpt-dir", ckpt,
           "--seed-base", str(seed_base), "--name", name] + extra
    if fast:
        # explicit knobs: EvalConfig now defaults to the gated candidate
        # (rank 96 + patch), so "plain fast" must pin them off
        cmd += ["--fast-path", "--fast-rank", str(fast_rank),
                "--fast-patch", "1" if fast_patch else "0"]
    print("+ " + " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True)
    return per_scene_metrics(os.path.join(workdir, "results"), name)


def summarize(rows: dict):
    keys = sorted({k for r in rows.values() for k in r})
    return {k: {"mean": float(np.mean([r[k] for r in rows.values()])),
                "std": float(np.std([r[k] for r in rows.values()])),
                "min": float(np.min([r[k] for r in rows.values()])),
                "max": float(np.max([r[k] for r in rows.values()]))}
            for k in keys}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--scenes", type=int, default=12)
    ap.add_argument("--views", type=int, default=12)
    ap.add_argument("--seed-base", type=int, default=100,
                    help="first unseen-scene seed (training used 0..47, "
                         "val 1000..1003)")
    ap.add_argument("--ckpt", default=os.path.join(REPO, "weights",
                                                   "3dvnet_synth48.npz"))
    ap.add_argument("--tol-abs-rel", type=float, default=0.002)
    ap.add_argument("--tol-fscore", type=float, default=0.01)
    ap.add_argument("--fast-rank", type=int, default=0,
                    help="rank-r sampling-interface projection for the "
                         "fast path under test (0 = plain fast path)")
    ap.add_argument("--fast-patch", action="store_true",
                    help="patch-fan image variance for the fast path "
                         "under test")
    ap.add_argument("--skip-run", action="store_true",
                    help="only re-aggregate existing results")
    args = ap.parse_args()

    extra = []
    fast_name = ("gate_fast" + (f"_r{args.fast_rank}" if args.fast_rank
                                else "")
                 + ("_p" if args.fast_patch else ""))
    if args.skip_run:
        parity = per_scene_metrics(os.path.join(args.workdir, "results"),
                                   "gate_parity")
        fast = per_scene_metrics(os.path.join(args.workdir, "results"),
                                 fast_name)
    else:
        parity = run_path(args.workdir, args.ckpt, args.scenes, False,
                          args.seed_base, args.views, extra)
        fast = run_path(args.workdir, args.ckpt, args.scenes, True,
                        args.seed_base, args.views, extra,
                        fast_rank=args.fast_rank,
                        fast_patch=args.fast_patch)

    common = sorted(set(parity) & set(fast))
    assert len(common) >= 2, f"need >=2 common scenes, got {common}"
    keys = sorted({k for s in common for k in parity[s]})
    deltas = {k: [fast[s][k] - parity[s][k] for s in common
                  if k in fast[s] and k in parity[s]] for k in keys}

    report = {
        "n_scenes": len(common),
        "scenes": common,
        "parity": summarize({s: parity[s] for s in common}),
        "fast": summarize({s: fast[s] for s in common}),
        "paired_delta": {k: {"mean": float(np.mean(v)),
                             "std": float(np.std(v)),
                             "min": float(np.min(v)),
                             "max": float(np.max(v))}
                         for k, v in deltas.items() if v},
    }

    d_abs = report["paired_delta"].get("abs_rel", {"mean": 0.0})
    d_f = report["paired_delta"].get("fscore", {"mean": 0.0})
    passed = (abs(d_abs["mean"]) <= args.tol_abs_rel
              and d_f["mean"] >= -args.tol_fscore)
    report["pass"] = bool(passed)
    report["criteria"] = {"tol_abs_rel": args.tol_abs_rel,
                          "tol_fscore": args.tol_fscore}

    report["fast_rank"] = args.fast_rank
    report["fast_patch"] = bool(args.fast_patch)
    tag = ((f"_r{args.fast_rank}" if args.fast_rank else "")
           + ("_p" if args.fast_patch else ""))
    out_path = os.path.join(args.workdir, f"gate_report{tag}.json")
    json.dump(report, open(out_path, "w"), indent=1)

    print(f"\n## Fast-path quality gate — {len(common)} unseen scenes "
          f"(seeds {args.seed_base}+)\n")
    print("| metric | parity mean±std | fast mean±std | paired Δ mean±std "
          "[min, max] |")
    print("|---|---|---|---|")
    for k in keys:
        p, f, d = (report["parity"][k], report["fast"][k],
                   report["paired_delta"][k])
        print(f"| {k} | {p['mean']:.4f}±{p['std']:.4f} "
              f"| {f['mean']:.4f}±{f['std']:.4f} "
              f"| {d['mean']:+.5f}±{d['std']:.5f} "
              f"[{d['min']:+.4f}, {d['max']:+.4f}] |")
    print(f"\ngate: {'PASS' if passed else 'FAIL'} "
          f"(|Δabs_rel| {abs(d_abs['mean']):.5f} <= {args.tol_abs_rel}, "
          f"Δfscore {d_f['mean']:+.5f} >= -{args.tol_fscore})")
    print(f"report: {out_path}")
    sys.exit(0 if passed else 1)


if __name__ == "__main__":
    main()
