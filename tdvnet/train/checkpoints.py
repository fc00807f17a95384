"""Orbax checkpointing of params/opt-state/batch-stats + hparams JSON.

Reproduces the reference's self-describing Lightning checkpoints
(`save_hyperparameters` + `load_from_checkpoint`,
`mv3d/lightningmodel.py:33`, `mv3d/finetune.py:11-12`): the config is stored
alongside the state so a checkpoint restores into a correctly-shaped model.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


def _cfg_to_json(cfg) -> str:
    def enc(o):
        if dataclasses.is_dataclass(o):
            return {f.name: enc(getattr(o, f.name)) for f in dataclasses.fields(o)}
        if isinstance(o, (tuple, list)):
            return [enc(x) for x in o]
        if isinstance(o, type) or hasattr(o, "dtype") or str(o).startswith("<class"):
            return str(o)
        try:
            json.dumps(o)
            return o
        except TypeError:
            return str(o)

    return json.dumps(enc(cfg), indent=2)


def save(ckpt_dir: str, state, epoch: int, cfg=None) -> str:
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"epoch_{epoch:05d}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()
    with open(os.path.join(ckpt_dir, "meta.json"), "w") as f:
        json.dump({"last_epoch": epoch}, f)
    if cfg is not None:
        with open(os.path.join(ckpt_dir, "config.json"), "w") as f:
            f.write(_cfg_to_json(cfg))
    return path


def latest_epoch(ckpt_dir: str) -> Optional[int]:
    meta = os.path.join(ckpt_dir, "meta.json")
    if not os.path.exists(meta):
        return None
    with open(meta) as f:
        return int(json.load(f)["last_epoch"])


def restore(ckpt_dir: str, state_template) -> Optional[Tuple[Any, int]]:
    """Restore the latest checkpoint into the shape of `state_template`."""
    ep = latest_epoch(ckpt_dir)
    if ep is None:
        return None
    path = os.path.join(os.path.abspath(ckpt_dir), f"epoch_{ep:05d}")
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path, jax.device_get(state_template))
    return restored, ep


def restore_params(ckpt_dir: str) -> Optional[Tuple[dict, int]]:
    """Restore only params/batch_stats from the latest checkpoint, without
    a state template — robust to optimizer-config differences between the
    training run and the consumer (e.g. eval restoring a MultiSteps
    checkpoint).  `ckpt_dir` may also point at an `.npz` weights file
    written by `export_npz` (the committable form of a checkpoint)."""
    if ckpt_dir.endswith(".npz"):
        if not os.path.exists(ckpt_dir):
            return None
        vars_, ep = load_npz(ckpt_dir)
        return vars_, ep
    ep = latest_epoch(ckpt_dir)
    if ep is None:
        return None
    path = os.path.join(os.path.abspath(ckpt_dir), f"epoch_{ep:05d}")
    raw = ocp.StandardCheckpointer().restore(path)
    out = {"params": raw["params"]}
    if raw.get("batch_stats") is not None:
        out["batch_stats"] = raw["batch_stats"]
    return out, ep


# ---- committable single-file weights (.npz) ------------------------------
# Orbax checkpoint dirs hold optimizer state and sharding metadata and are
# gitignored (large, scratch-resident — round 2 lost a 165-epoch run to a
# scratch wipe).  The .npz form stores only params/batch_stats as flat
# path->array entries, float params downcast to fp16 (inference-grade; BN
# statistics and any int arrays stay exact), so a trained model can live in
# the repo.  The reference ships weights the same way in spirit: a Google
# Drive .ckpt linked from its README (`/root/reference/README.md:91`).

_SEP = "//"


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{_SEP}{k}" if prefix else k))
        return out
    out[prefix] = np.asarray(tree)
    return out


def _unflatten(flat):
    tree: dict = {}
    for path, arr in flat.items():
        node = tree
        keys = path.split(_SEP)
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = arr
    return tree


def export_npz(path: str, variables: dict, epoch: int = 0,
               dtype=np.float16) -> str:
    """Write params/batch_stats to one compressed .npz.

    Float arrays are stored as `dtype` (default fp16 — ~1e-3 relative
    rounding, well under trained-model noise); everything else verbatim.
    """
    flat = _flatten({k: v for k, v in variables.items()
                     if k in ("params", "batch_stats")})
    stored = {}
    for k, v in flat.items():
        if np.issubdtype(v.dtype, np.floating):
            v = v.astype(dtype)
        stored[k] = v
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, __epoch__=np.int64(epoch), **stored)
    return path


def load_npz(path: str) -> Tuple[dict, int]:
    """Load an `export_npz` file back into {params[, batch_stats]} (fp32)."""
    with np.load(path) as z:
        epoch = int(z["__epoch__"]) if "__epoch__" in z else 0
        flat = {}
        for k in z.files:
            if k == "__epoch__":
                continue
            v = z[k]
            if np.issubdtype(v.dtype, np.floating):
                v = v.astype(np.float32)
            flat[k] = v
    return _unflatten(flat), epoch
