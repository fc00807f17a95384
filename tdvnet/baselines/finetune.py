"""Baseline finetuning on ScanNet-style batches.

Counterpart of the reference's per-baseline `finetune.py` wrappers
(`baselines/{gpmvs,pointmvsnet,fastmvsnet}/finetune.py`: Adam lr 1e-4,
StepLR 50/0.5 — `mv3d/config.py:17-19`): one generic optimizer/step builder
parameterized by each family's forward + loss.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from flax import core
from flax.training import train_state

from tdvnet.eval.metrics2d import mae_loss


class FtState(train_state.TrainState):
    batch_stats: core.FrozenDict = None


def create_finetune_state(variables, lr: float = 1e-4, lr_step: int = 50,
                          lr_gamma: float = 0.5, steps_per_epoch: int = 100,
                          apply_fn=None) -> FtState:
    def sched(step):
        epoch = step // max(steps_per_epoch, 1)
        return lr * lr_gamma ** (epoch // lr_step)

    return FtState.create(
        apply_fn=apply_fn, params=variables["params"],
        tx=optax.adam(sched),
        batch_stats=variables.get("batch_stats", core.FrozenDict()))


def depth_l1_loss(depth_pred, depth_gt, depth_interval: float = 0.05):
    """Masked depth L1 in interval units (shared by dvmvs/pmvs/fmvs)."""
    return mae_loss(depth_pred, depth_gt, depth_interval)


def make_finetune_step(apply_loss: Callable):
    """apply_loss(params, batch_stats, batch) → (loss, new_batch_stats)."""

    @jax.jit
    def step(state: FtState, batch):
        def loss_fn(p):
            loss, new_stats = apply_loss(p, state.batch_stats, batch)
            return loss, new_stats

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        if new_stats is not None:
            state = state.replace(batch_stats=new_stats)
        return state, loss

    return step


def gpmvs_apply_loss(model):
    from tdvnet.baselines.gpmvs import gpmvs_loss

    def fn(params, batch_stats, batch):
        images, costs, D, depth_gt = batch
        (_, disps), upd = model.apply(
            {"params": params, "batch_stats": batch_stats}, images, costs, D,
            True, mutable=["batch_stats"])
        return gpmvs_loss(disps, depth_gt), upd["batch_stats"]

    return fn


def pairnet_apply_loss(model):
    def fn(params, batch_stats, batch):
        images, rotmats, tvecs, K, ri, si, sm, depth_gt = batch
        depths, upd = model.apply(
            {"params": params, "batch_stats": batch_stats}, images, rotmats,
            tvecs, K, ri, si, sm, True, mutable=["batch_stats"])
        loss = 0.0
        for d in depths:  # deep supervision over the pyramid
            from tdvnet.ops.sampling import resize_nearest

            gt_s = resize_nearest(depth_gt, d.shape[1:3])
            loss = loss + depth_l1_loss(d, gt_s)
        return loss, upd["batch_stats"]

    return fn


def fastmvsnet_apply_loss(model):
    def fn(params, batch_stats, batch):
        images, rotmats, tvecs, K, ri, si, sm, depth_gt = batch
        (depth, _), upd = model.apply(
            {"params": params, "batch_stats": batch_stats}, images, rotmats,
            tvecs, K, ri, si, sm, 1, True, mutable=["batch_stats"])
        from tdvnet.ops.sampling import resize_nearest

        gt_s = resize_nearest(depth_gt, depth.shape[1:3])
        return depth_l1_loss(depth, gt_s), upd["batch_stats"]

    return fn


def pointmvsnet_apply_loss(model):
    def fn(params, batch_stats, batch):
        images, rotmats, tvecs, K, ri, si, sm, depth_gt = batch
        (depth, _, _), upd = model.apply(
            {"params": params, "batch_stats": batch_stats}, images, rotmats,
            tvecs, K, ri, si, sm, 2, True, mutable=["batch_stats"])
        from tdvnet.ops.sampling import resize_nearest

        gt_s = resize_nearest(depth_gt, depth.shape[1:3])
        return depth_l1_loss(depth, gt_s), upd["batch_stats"]

    return fn
