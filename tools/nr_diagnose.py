"""NeuralRecon training diagnosis: gated-voxel / TSDF statistics vs steps.

VERDICT r4 #6: the committed comparison row for NeuralRecon is "empty"
(occupancy cascade opens, TSDF head never crosses zero at 960 brief-train
steps) — but the claim "needs more training" was asserted, not evidenced.
This tool trains the baseline exactly like `tools/run_comparison.py`
(same synthetic scenes, optimizer, fragment batches) and logs, every
--log-every steps:

  - loss
  - per-level occupancy-gated voxel counts (cascade health)
  - frac(tsdf < 0 | gated) for each level head and the fused head
    (zero-crossing health — the round-4 failure signature)
  - mesh vertex count of a full pred_fn run on one eval scene

The per-level TSDF supervision toggle (--finest-only reproduces the
round-4 loss) isolates whether the missing per-level gradients (reference
`neucon_network.py:165-175` supervises every level) caused the failure.

Writes JSONL curve + a markdown summary to --out.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--steps", type=int, default=960)
    ap.add_argument("--log-every", type=int, default=80)
    ap.add_argument("--finest-only", action="store_true",
                    help="round-4 loss (no per-level TSDF supervision)")
    ap.add_argument("--train-scenes", type=int, default=6)
    ap.add_argument("--lr", type=float, default=1e-3)
    args = ap.parse_args()
    out_dir = args.out or os.path.join(args.workdir, "nr_diag")
    os.makedirs(out_dir, exist_ok=True)

    import jax
    import jax.numpy as jnp
    import optax

    import tools.run_comparison as RC
    from tdvnet.baselines import neuralrecon as NR
    from tools.make_synthetic_dataset import make_scene_dir

    IMG, N_VIEWS = RC.IMG, RC.N_VIEWS
    data = os.path.join(args.workdir, "data")
    os.makedirs(data, exist_ok=True)
    train_dirs, eval_dirs = [], []
    for s in range(args.train_scenes):
        d = os.path.join(data, f"train_{s:02d}")
        if not os.path.exists(os.path.join(d, "info.json")):
            make_scene_dir(data, f"train_{s:02d}", N_VIEWS, IMG, s)
        train_dirs.append(d)
    d = os.path.join(data, "eval_00")
    if not os.path.exists(os.path.join(d, "info.json")):
        make_scene_dir(data, "eval_00", N_VIEWS, IMG, 100)
    eval_dirs.append(d)

    train_views = RC.train_scene_batches(train_dirs, N_VIEWS)
    dims = (32, 32, 32)
    voxel = 0.08
    model, variables = NR.init_neuralrecon(jax.random.PRNGKey(0), IMG, dims)

    def loss_fn(params, batch_stats, images, P, origin, h0, gt, gtw):
        (tsdf, occ_all, tsdf_all, h_new, fmask), upd = model.apply(
            {"params": params, "batch_stats": batch_stats}, images, P,
            origin, dims, h0, voxel, True, mutable=["batch_stats"])
        loss = NR.neuralrecon_loss(
            occ_all, tsdf, gt, gtw, dims,
            tsdf_all=None if args.finest_only else tsdf_all)
        aux = (upd["batch_stats"], occ_all, tsdf_all, tsdf, fmask)
        return loss, aux

    tx = optax.adam(args.lr)
    params, stats = variables["params"], variables["batch_stats"]
    opt = tx.init(params)

    @jax.jit
    def step(params, stats, opt, *b):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, stats, *b)
        new_stats, occ_all, tsdf_all, tsdf, fmask = aux
        updates, opt = tx.update(grads, opt)
        diag = {"loss": loss}
        for lvl, (o, t) in enumerate(zip(occ_all, tsdf_all)):
            gate = jax.nn.sigmoid(o) > NR.OCC_THRESH
            diag[f"gated_l{lvl}"] = jnp.sum(gate.astype(jnp.int32))
            diag[f"neg_frac_l{lvl}"] = (
                jnp.sum(((t < 0) & gate).astype(jnp.float32))
                / jnp.maximum(jnp.sum(gate.astype(jnp.float32)), 1.0))
        fg = fmask > 0
        diag["gated_final"] = jnp.sum(fg.astype(jnp.int32))
        diag["neg_frac_final"] = (
            jnp.sum(((tsdf < 0) & fg).astype(jnp.float32))
            / jnp.maximum(jnp.sum(fg.astype(jnp.float32)), 1.0))
        return (optax.apply_updates(params, updates), new_stats, opt, diag)

    h0 = jnp.zeros((*dims, NR.HID))
    batches = []
    for v in train_views:
        origin = RC.scene_grid_origin(v, dims, voxel)
        gt, gtw = RC._gt_tsdf_for(v, origin, dims, voxel)
        P = np.einsum("nij,njk->nik", v["K"], np.concatenate(
            [v["rotmats"], v["tvecs"][..., None]], 2)).astype(np.float32)
        sel = np.linspace(0, v["images"].shape[0] - 1,
                          NR.FRAGMENT_SIZE).astype(int)
        batches.append((jnp.asarray(v["images"][sel]), jnp.asarray(P[sel]),
                        jnp.asarray(origin), h0, jnp.asarray(gt),
                        jnp.asarray(gtw)))

    from tdvnet.data.dataset import Dataset
    from tdvnet.data.frameselector import NextPoseDistSelector

    dset = Dataset(eval_dirs, NextPoseDistSelector(0.05, 20),
                   None, depth_img_size=(60, 80), img_size=IMG,
                   augment=False, n_src_on_either_side=1)
    eval_views = dset.load_views(0, seed_idx=0)

    def mesh_stats(params, stats):
        vs = {"params": params, "batch_stats": stats}
        pred_fn = NR.make_pred_fn(model, vs, voxel_fine=voxel, frag_dim=32)
        verts, faces = pred_fn(eval_views, eval_dirs[0], dset)
        return int(verts.shape[0]), int(np.asarray(faces).shape[0])

    tag = "finest_only" if args.finest_only else "per_level"
    curve_path = os.path.join(out_dir, f"curve_{tag}.jsonl")
    cf = open(curve_path, "w")
    for it in range(args.steps + 1):
        b = batches[it % len(batches)]
        params, stats, opt, diag = step(params, stats, opt, *b)
        if it % args.log_every == 0 or it == args.steps:
            rec = {"step": it}
            rec.update({k: float(v) for k, v in diag.items()})
            nv, nf = mesh_stats(params, stats)
            rec["mesh_verts"], rec["mesh_faces"] = nv, nf
            cf.write(json.dumps(rec) + "\n")
            cf.flush()
            print(f"step {it:5d}  loss {rec['loss']:.3f}  "
                  f"gated {int(rec['gated_l0'])}/{int(rec['gated_l1'])}/"
                  f"{int(rec['gated_l2'])}/{int(rec['gated_final'])}  "
                  f"neg_frac l2 {rec['neg_frac_l2']:.3f} "
                  f"final {rec['neg_frac_final']:.3f}  "
                  f"mesh_verts {nv}", flush=True)
    cf.close()
    print(f"curve: {curve_path}")


if __name__ == "__main__":
    main()
