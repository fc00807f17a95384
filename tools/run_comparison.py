"""Seven-method comparison table on common synthetic scenes (RESULTS.md).

The reference's eval suite exists to compare 3DVNet against its six
baselines on identical scenes (`mv3d/eval/main.py` + per-method
`eval-*.py`); this drives the same protocol end-to-end here: every method
is briefly trained on synthetic scenes (the flagship from its training
checkpoint), then run through the SAME `tdvnet.eval.harness` on the same
unseen scenes, and the aggregated metrics land in RESULTS.md.

Synthetic-scene caveat recorded in the output: numbers rank methods on
this renderer's scenes only; real-data training is unavailable in this
environment (no ScanNet).

Usage:
  python tools/run_comparison.py --workdir /tmp/cmp \
      --ckpt-dir ckpts/r2_synth48 [--methods 3dvnet,gpmvs,...]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

IMG = (256, 320)
N_TRAIN_SCENES = 4
N_EVAL_SCENES = 2
N_VIEWS = 14
TRAIN_STEPS = 60

# per-method params/steps so the table reads as a protocol record, not a
# capability ranking (briefly-trained baselines vs the trained flagship)
ROW_META = {}


def _note_meta(name, variables, steps):
    import jax

    params = variables.get("params", variables)
    n = sum(int(np.prod(x.shape))
            for x in jax.tree_util.tree_leaves(params))
    ROW_META[name] = {"params_m": n / 1e6, "steps": steps}


def _local_window(n_imgs, r0, r1, k, cap):
    ref_idx = np.arange(cap, dtype=np.int32) + k
    src = ref_idx[:, None] + np.arange(-k, k + 1, dtype=np.int32)[None]
    ref_mask = np.arange(cap) < (r1 - r0)
    sm = ref_mask[:, None] & np.ones_like(src, bool)
    return ref_idx, np.clip(src, 0, cap + 2 * k - 1), sm


def train_scene_batches(scene_dirs, n_views, k=1):
    """Per-scene window batches (images/cams/depth) for brief training."""
    from tdvnet.data.dataset import Dataset
    from tdvnet.data.frameselector import EveryNthSelector

    dset = Dataset(scene_dirs, EveryNthSelector(1), n_views - 2 * k,
                   depth_img_size=IMG, img_size=IMG, augment=False,
                   n_src_on_either_side=k)
    out = []
    for i in range(len(dset)):
        v = dset.load_views(i, seed_idx=0)
        out.append(v)
    return out


def eval_cfg(workdir, extra=None):
    from tdvnet.config import load_config

    o = {
        "batch": {"img_size": IMG},
        "eval": {"save_dir": os.path.join(workdir, "results"),
                 "depth_img_size": IMG, "pdist": 0.05,
                 "n_src_on_either_side": 2,
                 "eval_max_anchors": 131072},
    }
    if extra:
        for k, v in extra.items():
            o["eval"][k] = v
    return load_config(o)


def method_3dvnet(args, train_views, cfg):
    import jax

    from tdvnet.data import batch as B, synthetic
    from tdvnet.eval.harness import make_3dvnet_pred_fn
    from tdvnet.train import checkpoints as C
    from tdvnet.train.loop import create_state

    bc = cfg.batch
    fb = B.collate_scenes(
        [synthetic.make_batch_scene(bc.n_views, bc.img_size,
                                    bc.depth_img_size, seed=0)],
        bc.n_views, bc.n_ref, bc.n_src_on_either_side)
    model, state = create_state(cfg, jax.random.PRNGKey(0), fb)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    restored = C.restore_params(args.ckpt_dir)
    if restored is None:
        assert args.quick, f"no checkpoint in {args.ckpt_dir}"
        print("[3dvnet] QUICK: no checkpoint, using random init")
    else:
        raw, ep = restored
        variables = {"params": raw["params"],
                     "batch_stats": raw.get("batch_stats",
                                            state.batch_stats)}
        print(f"[3dvnet] restored epoch {ep} (params-only)")
        _note_meta("3dvnet", variables, f"full training run (ep {ep})")
    return make_3dvnet_pred_fn(model, variables, cfg), True


def _brief_train(state, step, batches, label):
    import numpy as _np

    losses = []
    for it in range(TRAIN_STEPS):
        state, loss = step(state, batches[it % len(batches)])
        if it % 10 == 0:
            losses.append(float(loss))
    print(f"[{label}] loss {losses[0]:.3f} -> {losses[-1]:.3f}")
    assert _np.isfinite(losses).all()
    return state


def method_fastmvsnet(args, train_views, cfg):
    import jax
    import jax.numpy as jnp

    from tdvnet.baselines import fastmvsnet as FM, finetune as FT

    model, variables = FM.init_fastmvsnet(jax.random.PRNGKey(0), IMG, 3,
                                          (0.5, 0.1, 48))
    batches = []
    for v in train_views:
        for r in range(1, v["images"].shape[0] - 1, 4):
            batches.append((
                jnp.asarray(v["images"][r - 1:r + 2]),
                jnp.asarray(v["rotmats"][r - 1:r + 2]),
                jnp.asarray(v["tvecs"][r - 1:r + 2]),
                jnp.asarray(v["K"][r - 1:r + 2]),
                jnp.asarray([1]), jnp.asarray([[0, 2]]),
                jnp.ones((1, 2), bool),
                jnp.asarray(v["depth"][r:r + 1])))
    state = FT.create_finetune_state(variables, lr=1e-3,
                                     apply_fn=model.apply)
    step = FT.make_finetune_step(FT.fastmvsnet_apply_loss(model))
    state = _brief_train(state, step, batches, "fastmvsnet")
    vs = {"params": state.params, "batch_stats": state.batch_stats}
    _note_meta("fastmvsnet", vs, TRAIN_STEPS)
    return FM.make_pred_fn(model, vs), True


def method_pointmvsnet(args, train_views, cfg):
    import jax
    import jax.numpy as jnp

    from tdvnet.baselines import finetune as FT, pointmvsnet as PM

    model, variables = PM.init_pointmvsnet(jax.random.PRNGKey(0), IMG, 3,
                                           (0.5, 0.1, 48))
    batches = []
    for v in train_views:
        for r in range(1, v["images"].shape[0] - 1, 4):
            batches.append((
                jnp.asarray(v["images"][r - 1:r + 2]),
                jnp.asarray(v["rotmats"][r - 1:r + 2]),
                jnp.asarray(v["tvecs"][r - 1:r + 2]),
                jnp.asarray(v["K"][r - 1:r + 2]),
                jnp.asarray([1]), jnp.asarray([[0, 2]]),
                jnp.ones((1, 2), bool),
                jnp.asarray(v["depth"][r:r + 1])))
    state = FT.create_finetune_state(variables, lr=1e-3,
                                     apply_fn=model.apply)
    step = FT.make_finetune_step(FT.pointmvsnet_apply_loss(model))
    state = _brief_train(state, step, batches, "pointmvsnet")
    vs = {"params": state.params, "batch_stats": state.batch_stats}
    _note_meta("pointmvsnet", vs, TRAIN_STEPS)
    return PM.make_pred_fn(model, vs), True


def method_gpmvs(args, train_views, cfg):
    import jax
    import jax.numpy as jnp

    from tdvnet.baselines import finetune as FT, gpmvs as G

    seq = 4
    model, variables = G.init_gpmvs(jax.random.PRNGKey(0), IMG, seq_len=seq)
    batches = []
    for v in train_views:
        n = v["images"].shape[0]
        for s0 in range(1, n - seq - 1, seq):
            idx = np.arange(s0, s0 + seq)
            costs = []
            for i in idx:
                costs.append(G.photometric_cost_volume(
                    jnp.asarray(v["images"][i]),
                    jnp.asarray(v["images"][[i - 1, i + 1]]),
                    jnp.ones((2,), bool),
                    jnp.asarray(v["rotmats"][i]), jnp.asarray(v["tvecs"][i]),
                    jnp.asarray(v["K"][i]),
                    jnp.asarray(v["rotmats"][[i - 1, i + 1]]),
                    jnp.asarray(v["tvecs"][[i - 1, i + 1]]),
                    jnp.asarray(v["K"][[i - 1, i + 1]]), IMG))
            poses = np.tile(np.eye(4, dtype=np.float32), (seq, 1, 1))
            poses[:, :3, :3] = v["rotmats"][idx]
            poses[:, :3, 3] = v["tvecs"][idx]
            D = G.pose_distance_matrix(poses)
            batches.append((jnp.asarray(v["images"][idx]),
                            jnp.stack(costs), jnp.asarray(D),
                            jnp.asarray(v["depth"][idx])))
    state = FT.create_finetune_state(variables, lr=1e-3,
                                     apply_fn=model.apply)
    step = FT.make_finetune_step(FT.gpmvs_apply_loss(model))
    state = _brief_train(state, step, batches, "gpmvs")
    vs = {"params": state.params, "batch_stats": state.batch_stats}
    _note_meta("gpmvs", vs, TRAIN_STEPS)
    return G.make_pred_fn(model, vs, IMG), True


def method_dvmvs(args, train_views, cfg):
    import jax
    import jax.numpy as jnp

    from tdvnet.baselines import dvmvs as DV, finetune as FT

    model, variables = DV.init_pairnet(jax.random.PRNGKey(0), IMG,
                                       chunk=4, k=1)
    batches = []
    for v in train_views:
        n = v["images"].shape[0]
        for r0 in range(1, n - 5, 4):
            ri, si, sm, _ = DV._local_tables(n, r0 - 1, r0 + 3, 1, 4)
            sl = slice(r0 - 1, r0 + 5)
            batches.append((
                jnp.asarray(v["images"][sl]), jnp.asarray(v["rotmats"][sl]),
                jnp.asarray(v["tvecs"][sl]), jnp.asarray(v["K"][sl]),
                ri, si, sm, jnp.asarray(v["depth"][r0:r0 + 4])))
    state = FT.create_finetune_state(variables, lr=1e-3,
                                     apply_fn=model.apply)
    step = FT.make_finetune_step(FT.pairnet_apply_loss(model))
    state = _brief_train(state, step, batches, "dvmvs")
    vs = {"params": state.params, "batch_stats": state.batch_stats}
    _note_meta("dvmvs", vs, TRAIN_STEPS)
    return DV.make_pairnet_pred_fn(model, vs, chunk=4), True


def scene_grid_origin(v, dims, voxel):
    """Grid origin centered on the SCENE SURFACES, not the camera cluster.

    Round-5 fix: the previous camera-centroid origin placed the volumetric
    baselines' grids in free space — the synthetic scenes' walls sit just
    OUTSIDE it, so the GT TSDF contained zero negative values (measured:
    min 0.58 over every valid voxel) and no TSDF head could ever learn a
    zero-crossing (the NeuralRecon "empty" rows of rounds 3-5).  Center
    the grid on the 5-95% quantile box of the back-projected depth cloud
    instead (the reference sizes volumes from scene geometry too:
    `mv3d/baselines/atlas/eval-atlas.py:13-51` uses the GT-mesh bounds)."""
    d, K, R, t = v["depth"], v["K"], v["rotmats"], v["tvecs"]
    pts = []
    for i in range(d.shape[0]):
        h, w = d[i].shape
        ys, xs = np.mgrid[0:h:8, 0:w:8]
        dd = d[i][ys, xs]
        m = dd > 0
        if not m.any():
            continue
        uv1 = np.stack([xs[m], ys[m], np.ones(m.sum())], -1)
        rays = (np.linalg.inv(K[i]) @ uv1.T).T
        world = (R[i].T @ ((rays * dd[m][:, None]) - t[i]).T).T
        pts.append(world)
    pts = np.concatenate(pts)
    lo, hi = np.quantile(pts, 0.05, axis=0), np.quantile(pts, 0.95, axis=0)
    ctr = (lo + hi) / 2
    return (ctr - np.array(dims) * voxel / 2).astype(np.float32)


def _gt_tsdf_for(v, origin, dims, voxel):
    import jax.numpy as jnp

    from tdvnet.ops import tsdf as T

    P = np.einsum("nij,njk->nik", v["K"],
                  np.concatenate([v["rotmats"], v["tvecs"][..., None]], 2))
    t, w, _ = T.integrate_frames(
        jnp.asarray(v["depth"]), jnp.asarray(
            np.zeros((*v["depth"].shape, 3), np.float32)),
        jnp.asarray(P.astype(np.float32)), jnp.asarray(origin), dims,
        float(voxel), 3.0)
    tn = np.asarray(t)
    wn = np.asarray(w)
    return (np.where(wn > 0, tn / np.maximum(wn, 1e-6), 1.0)
            .reshape(dims).astype(np.float32),
            wn.reshape(dims).astype(np.float32))


def method_atlas(args, train_views, cfg):
    import jax
    import jax.numpy as jnp
    import optax

    from tdvnet.baselines import atlas as A

    dims = (48, 48, 32)
    voxel = 0.08
    model, variables = A.init_atlas(jax.random.PRNGKey(0), IMG, dims)

    def loss_fn(params, batch_stats, images, P, origin, gt, gtw):
        (tsdfs, valid), upd = model.apply(
            {"params": params, "batch_stats": batch_stats}, images, P,
            origin, dims, voxel, True, method="multi_scale",
            mutable=["batch_stats"])
        return A.atlas_multi_scale_loss(tsdfs, gt, gtw), upd["batch_stats"]

    tx = optax.adam(1e-3)
    opt = tx.init(variables["params"])
    params, stats = variables["params"], variables["batch_stats"]

    @jax.jit
    def step(params, stats, opt, images, P, origin, gt, gtw):
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, stats, images, P, origin, gt, gtw)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), new_stats, opt, loss

    batches = []
    for v in train_views:
        origin = scene_grid_origin(v, dims, voxel)
        gt, gtw = _gt_tsdf_for(v, origin, dims, voxel)
        P = np.einsum("nij,njk->nik", v["K"], np.concatenate(
            [v["rotmats"], v["tvecs"][..., None]], 2)).astype(np.float32)
        sel = np.linspace(0, v["images"].shape[0] - 1, 6).astype(int)
        batches.append((jnp.asarray(v["images"][sel]), jnp.asarray(P[sel]),
                        jnp.asarray(origin), jnp.asarray(gt),
                        jnp.asarray(gtw)))
    losses = []
    for it in range(TRAIN_STEPS):
        b = batches[it % len(batches)]
        params, stats, opt, loss = step(params, stats, opt, *b)
        if it % 10 == 0:
            losses.append(float(loss))
    print(f"[atlas] loss {losses[0]:.3f} -> {losses[-1]:.3f}")
    vs = {"params": params, "batch_stats": stats}
    _note_meta("atlas", vs, TRAIN_STEPS)
    return A.make_pred_fn(model, vs, voxel_size=voxel, max_dim=96), False


def method_neuralrecon(args, train_views, cfg):
    import jax
    import jax.numpy as jnp
    import optax

    from tdvnet.baselines import neuralrecon as NR

    dims = (32, 32, 32)
    voxel = 0.08
    model, variables = NR.init_neuralrecon(jax.random.PRNGKey(0), IMG, dims)

    def loss_fn(params, batch_stats, images, P, origin, h0, gt, gtw):
        (tsdf, occ_all, tsdf_all, h_new, fmask), upd = model.apply(
            {"params": params, "batch_stats": batch_stats}, images, P,
            origin, dims, h0, voxel, True, mutable=["batch_stats"])
        # per-level TSDF supervision (reference neucon_network.py:165-175
        # supervises every level's tsdf head) — round-5 fix for the
        # "TSDF head never crosses zero" empty-mesh failure
        return (NR.neuralrecon_loss(occ_all, tsdf, gt, gtw, dims,
                                    tsdf_all=tsdf_all),
                upd["batch_stats"])

    tx = optax.adam(1e-3)
    params, stats = variables["params"], variables["batch_stats"]
    opt = tx.init(params)

    @jax.jit
    def step(params, stats, opt, *b):
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, stats, *b)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), new_stats, opt, loss

    h0 = jnp.zeros((*dims, NR.HID))
    batches = []
    for v in train_views:
        origin = scene_grid_origin(v, dims, voxel)
        gt, gtw = _gt_tsdf_for(v, origin, dims, voxel)
        P = np.einsum("nij,njk->nik", v["K"], np.concatenate(
            [v["rotmats"], v["tvecs"][..., None]], 2)).astype(np.float32)
        sel = np.linspace(0, v["images"].shape[0] - 1,
                          NR.FRAGMENT_SIZE).astype(int)
        batches.append((jnp.asarray(v["images"][sel]), jnp.asarray(P[sel]),
                        jnp.asarray(origin), h0, jnp.asarray(gt),
                        jnp.asarray(gtw)))
    # the occupancy cascade gates every level at sigmoid>0.5 — a
    # briefly-trained net whose coarse logits sit just below 0 emits an
    # EMPTY mesh (the round-3/4 all-zero row), so NeuralRecon gets 4x the
    # brief-train budget; the steps column records it
    nr_steps = TRAIN_STEPS * 4
    losses = []
    for it in range(nr_steps):
        b = batches[it % len(batches)]
        params, stats, opt, loss = step(params, stats, opt, *b)
        if it % 10 == 0:
            losses.append(float(loss))
    print(f"[neuralrecon] loss {losses[0]:.3f} -> {losses[-1]:.3f} "
          f"({nr_steps} steps)")
    vs = {"params": params, "batch_stats": stats}
    _note_meta("neuralrecon", vs, nr_steps)
    return NR.make_pred_fn(model, vs, voxel_fine=voxel, frag_dim=32), False


METHODS = {
    "3dvnet": method_3dvnet,
    "fastmvsnet": method_fastmvsnet,
    "pointmvsnet": method_pointmvsnet,
    "gpmvs": method_gpmvs,
    "dvmvs": method_dvmvs,
    "atlas": method_atlas,
    "neuralrecon": method_neuralrecon,
}


def main():
    global IMG, N_VIEWS, TRAIN_STEPS, N_TRAIN_SCENES, N_EVAL_SCENES

    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--ckpt-dir", default="weights/3dvnet_synth48.npz")
    ap.add_argument("--methods", default=",".join(METHODS))
    ap.add_argument("--out", default="RESULTS.md")
    ap.add_argument("--quick", action="store_true",
                    help="tiny shapes + CPU platform: shake out the "
                         "pipeline without touching the TPU")
    ap.add_argument("--train-steps", type=int, default=None)
    ap.add_argument("--retries", type=int, default=2,
                    help="per-method retries on transient tunnel errors")
    ap.add_argument("--overwrite", action="store_true",
                    help="ignore cached rows.json method results")
    ap.add_argument("--cpu-methods", default="",
                    help="comma list of methods to run on the host CPU "
                         "backend (escape hatch for graphs that crash "
                         "the remote TPU compiler — metrics are "
                         "platform-independent; round 4: the dvmvs "
                         "train step reproducibly kills "
                         "tpu_compile_helper)")
    args = ap.parse_args()
    cpu_methods = set(m for m in args.cpu_methods.split(",") if m)

    if args.quick:
        import jax

        jax.config.update("jax_platforms", "cpu")
        IMG = (64, 80)
        N_VIEWS = 10
        TRAIN_STEPS = 4
        N_TRAIN_SCENES = 2
        N_EVAL_SCENES = 1
    if args.train_steps is not None:
        TRAIN_STEPS = args.train_steps

    from tools.make_synthetic_dataset import make_scene_dir
    from tdvnet.eval import harness

    data = os.path.join(args.workdir, "data")
    os.makedirs(data, exist_ok=True)
    train_dirs, eval_dirs = [], []
    for s in range(N_TRAIN_SCENES):
        d = os.path.join(data, f"train_{s:02d}")
        if not os.path.exists(os.path.join(d, "info.json")):
            make_scene_dir(data, f"train_{s:02d}", N_VIEWS, IMG, s)
        train_dirs.append(d)
    for s in range(N_EVAL_SCENES):
        d = os.path.join(data, f"eval_{s:02d}")
        if not os.path.exists(os.path.join(d, "info.json")):
            make_scene_dir(data, f"eval_{s:02d}", N_VIEWS, IMG, 100 + s)
        eval_dirs.append(d)

    train_views = train_scene_batches(train_dirs, N_VIEWS)

    # resumable: completed method rows are cached in rows.json, so a re-run
    # after a tunnel failure only recomputes the missing/failed methods
    # (the harness additionally caches per-scene preds.npz)
    rows_path = os.path.join(args.workdir, "rows.json")
    rows = {}
    if os.path.exists(rows_path) and not args.overwrite:
        with open(rows_path) as f:
            rows = {k: v for k, v in json.load(f).items()
                    if "error" not in v}
        if rows:
            print(f"resuming: cached rows for {sorted(rows)}")

    def _is_transient(e: Exception) -> bool:
        s = str(e)
        return ("HTTP 5" in s or "INTERNAL" in s or "UNAVAILABLE" in s
                or "DEADLINE_EXCEEDED" in s)

    import contextlib

    for name in args.methods.split(","):
        if name in rows:
            print(f"===== {name} ===== (cached)")
            ROW_META.setdefault(name, rows[name].get("_meta", {}))
            continue
        cfg = eval_cfg(args.workdir)
        on_cpu = name in cpu_methods
        print(f"===== {name} =====" + (" (cpu backend)" if on_cpu else ""))
        # the remote-TPU tunnel throws transient HTTP 5xx (the round-3
        # dvmvs row died on one); retry those per method
        for attempt in range(args.retries + 1):
            try:
                import jax

                ctx = (jax.default_device(
                    jax.local_devices(backend="cpu")[0])
                    if on_cpu else contextlib.nullcontext())
                with ctx:
                    pred_fn, is_depth = METHODS[name](args, train_views,
                                                      cfg)
                    avg = harness.main(name, pred_fn, cfg, depth=is_depth,
                                       scenes=eval_dirs)
                rows[name] = dict(avg, _meta=ROW_META.get(name, {}))
                break
            except Exception as e:                          # noqa: BLE001
                import traceback

                traceback.print_exc()
                if _is_transient(e) and attempt < args.retries:
                    print(f"[{name}] transient backend error, retry "
                          f"{attempt + 1}/{args.retries}")
                    continue
                rows[name] = {"error": str(e)[:200]}
                break
        with open(rows_path, "w") as f:
            json.dump(rows, f, indent=1, default=float)

    keys2d = ["abs_rel", "abs_diff", "rmse", "d_125"]
    keys3d = ["fscore", "prec", "recal"]

    def flat(avg):
        # harness.main returns {metrics_file_name: {metric: value}}
        out = {}
        for fk, m in avg.items():
            if fk != "_meta" and isinstance(m, dict):
                for k, v in m.items():
                    out.setdefault(k, v)
        return out
    with open(args.out, "w") as f:
        f.write(
            "# Method comparison — synthetic scenes, common eval harness\n\n"
            f"All methods ran through `tdvnet.eval.harness` on the same "
            f"{N_EVAL_SCENES} unseen synthetic scenes ({N_VIEWS} views @ "
            f"{IMG[0]}x{IMG[1]}); the flagship restored from its synthetic "
            f"training checkpoint, each baseline briefly trained on "
            f"{N_TRAIN_SCENES} synthetic scenes (per-method step counts "
            f"in the table) — "
            "the reference's comparison protocol (`mv3d/eval/main.py`), "
            "scaled to this environment (no real ScanNet data; numbers "
            "rank methods on this renderer only and are NOT paper "
            "numbers).\n\n"
            "| method | params (M) | train steps | "
            + " | ".join(keys2d + keys3d) + " |\n"
            "|---|---|---|" + "---|" * (len(keys2d) + len(keys3d)) + "\n")
        any_empty = False
        for name, avg in rows.items():
            meta = ROW_META.get(name, {})
            pm = meta.get("params_m")
            mcells = ["-" if pm is None else f"{pm:.1f}",
                      str(meta.get("steps", "-"))]
            if "error" in avg:
                f.write(f"| {name} | " + " | ".join(mcells)
                        + f" | failed: {avg['error'][:60]} |\n")
                continue
            fm = flat(avg)
            # an empty prediction (empty mesh / all-invalid depths) must
            # not render as a numeric 0.000 row: round 3's neuralrecon row
            # was all zeros with no way to tell failure from score
            empty2d = fm.get("perc_valid", 1.0) < 1e-6
            empty3d = fm.get("n_pred_points", 1) < 1
            cells = []
            for k in keys2d + keys3d:
                v = fm.get(k)
                if v is None:
                    cells.append("-")
                elif (empty2d and k in keys2d) or (empty3d and k in keys3d):
                    cells.append("empty")
                else:
                    cells.append(f"{v:.3f}")
            f.write(f"| {name} | " + " | ".join(mcells + cells) + " |\n")
            if empty2d or empty3d:
                any_empty = True
                print(f"[{name}] WARNING: empty prediction "
                      f"(perc_valid={fm.get('perc_valid')}, "
                      f"n_pred_points={fm.get('n_pred_points')})")
        if any_empty:
            f.write(
                "\n`empty` = the method produced an empty prediction "
                "(no valid depths / empty mesh), distinct from a crash "
                "(`failed`) and from a true 0.000 score.  NeuralRecon's "
                "occupancy cascade opens (~950 gated voxels/scene at 960 "
                "steps; per-scene counts in the run log) but its "
                "log-TSDF head produces no zero-crossing at brief-train "
                "budgets — the reference trains it for ~2 days on "
                "ScanNet, so an empty mesh is this protocol's honest "
                "outcome for it.\n")
    print(f"wrote {args.out}")

    # interactive side-by-side viewer (reference `mv3d/eval/visualizer.py`)
    from tdvnet.eval.export_viewer import export_viewer

    res_root = os.path.join(args.workdir, "results")
    method_dirs = []
    for name, avg in rows.items():
        if "error" in avg:
            continue
        volumetric = name in ("atlas", "neuralrecon")
        method_dirs.append(
            (name, os.path.join(res_root, name, "scenes"),
             "trimmed_mesh_masked.ply" if volumetric
             else "fused_0.010_3v_masked.ply",
             "metrics_3d_masked.json" if volumetric
             else "metrics_3d_0.010_3v_masked.json"))
    try:
        out = export_viewer(method_dirs, eval_dirs,
                            os.path.join(args.workdir, "viewer.html"))
        print(f"wrote {out}")
    except ValueError as e:
        print(f"viewer export skipped: {e}")


if __name__ == "__main__":
    main()
