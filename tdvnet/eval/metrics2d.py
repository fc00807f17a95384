"""2D depth metrics (jit-able jnp).

Same definitions as the reference (`mv3d/eval/metricfunctions.py:26-67`):
per-image masked means over GT ∈ [0.5, 65) m, then mean over images.  An
optional per-image weight vector supports padded ref slots (weight 0) —
the reference has no padding so all-ones reproduces it exactly.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp

GT_MIN = 0.5
GT_MAX = 65.0


def calc_2d_depth_metrics(depth_pred: jnp.ndarray, depth_gt: jnp.ndarray,
                          img_weight: Optional[jnp.ndarray] = None,
                          pred_valid: Optional[jnp.ndarray] = None
                          ) -> Dict[str, jnp.ndarray]:
    """depth_pred/depth_gt: [N, H, W]; img_weight: [N] (0 for padded slots)."""
    out = {}
    valid = (depth_gt >= GT_MIN) & (depth_gt < GT_MAX)
    if pred_valid is not None:
        valid = valid & pred_valid
        out["perc_valid"] = jnp.mean(
            jnp.sum(pred_valid, axis=(1, 2))
            / (pred_valid.shape[1] * pred_valid.shape[2]))
    valid = valid.astype(jnp.float32)
    denom = jnp.sum(valid, axis=(1, 2)) + 1e-7

    if img_weight is None:
        img_weight = jnp.ones(depth_pred.shape[0], jnp.float32)
    wsum = jnp.maximum(jnp.sum(img_weight), 1e-7)

    def img_mean(per_img):
        return jnp.sum(per_img * img_weight) / wsum

    abs_diff = jnp.abs(depth_pred - depth_gt)
    abs_inv = jnp.abs(1.0 / depth_pred - 1.0 / depth_gt)
    abs_inv = jnp.where(jnp.isfinite(abs_inv), abs_inv, 0.0)

    out["abs_rel"] = img_mean(jnp.sum(abs_diff / (depth_gt + 1e-7) * valid,
                                      axis=(1, 2)) / denom)
    out["sq_rel"] = img_mean(jnp.sum(abs_diff ** 2 / (depth_gt + 1e-7) * valid,
                                     axis=(1, 2)) / denom)
    out["rmse"] = img_mean(jnp.sqrt(jnp.sum(abs_diff ** 2 * valid,
                                            axis=(1, 2)) / denom))
    out["abs_diff"] = img_mean(jnp.sum(abs_diff * valid, axis=(1, 2)) / denom)
    out["abs_inv"] = img_mean(jnp.sum(abs_inv * valid, axis=(1, 2)) / denom)

    safe_gt = jnp.where(depth_gt > 0, depth_gt, 1.0)
    safe_pred = jnp.where(depth_pred > 0, depth_pred, 1e-7)
    rel_max = jnp.maximum(safe_pred / safe_gt, safe_gt / safe_pred)
    for name, thr in [("d_125", 1.25), ("d_125_2", 1.25 ** 2),
                      ("d_125_3", 1.25 ** 3)]:
        out[name] = img_mean(jnp.sum((rel_max < thr) * valid, axis=(1, 2))
                             / denom)
    return out


def mae_loss(depth_pred: jnp.ndarray, depth_gt: jnp.ndarray,
             depth_interval: float,
             img_weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Masked mean-absolute-error in units of depth intervals
    (reference `mv3d/loss.py:6-20`).  GT==0 pixels are invalid."""
    mask = (depth_gt != 0.0).astype(jnp.float32)
    denom = jnp.sum(mask, axis=(1, 2)) + 1e-7
    per_img = jnp.sum(mask * jnp.abs(depth_pred - depth_gt), axis=(1, 2))
    per_img = per_img / depth_interval / denom
    if img_weight is None:
        return jnp.mean(per_img)
    return jnp.sum(per_img * img_weight) / jnp.maximum(jnp.sum(img_weight),
                                                       1e-7)
