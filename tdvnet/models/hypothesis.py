"""PointFlow hypothesis decoder.

Counterpart of the reference `HypothesisDecoder`
(`mv3d/subnetworks/refinement.py:16-44`): for every depth pixel, score the
2n+1 hypothesis points by trilinearly sampling each scene-U-Net scale at the
points, concatenating with the per-hypothesis image variance feature, and
running a small conv stack *across the hypothesis axis* (kernel 3 couples
neighboring hypotheses) ending in a softmax.

The Minkowski sparse interpolation becomes `trilinear_sample` on the masked
dense grids — identical values (inactive cells hold zeros).
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
from flax import linen as nn

from tdvnet.ops.sampling import (pack_trilinear_octs,
                                 trilinear_sample_batched,
                                 trilinear_sample_octs_batched)

# oct-packed tables cost 8x the grid's memory; above this budget fall back
# to the 8-tap sampler.  1.75 GB admits the finest scale of auto-sized eval
# grids up to ~160x160x64 (bf16) — one wide-row gather beats eight C-wide
# ones by ~8x on TPU (gather cost is per row).
_PACK_BUDGET_BYTES = 1792 * 1024 * 1024


def pack_scales(grids):
    """Oct-pack a list of dense scale grids ([B, X, Y, Z, C] each).

    Returns one packed table per scale (None where the table would exceed
    the budget).  Used by the eval path to build the tables ONCE per scene
    iteration instead of inside every pointflow chunk dispatch."""
    out = []
    for g in grids:
        B, X, Y, Z, C = g.shape
        packed_bytes = (B * (X + 1) * (Y + 1) * (Z + 1) * 8 * C
                        * g.dtype.itemsize)
        if packed_bytes <= _PACK_BUDGET_BYTES:
            out.append(jax.vmap(pack_trilinear_octs)(g))
        else:
            out.append(None)
    return out


def sample_scales(scales, pts: jnp.ndarray, origins: jnp.ndarray,
                  edge_len: float) -> jnp.ndarray:
    """Trilinear-sample every U-Net scale at world points, concat channels.

    scales: list of {"grid": [B,x,y,z,C], "stride": s} coarsest-first.
    pts: [B, Q, 3] world points grouped per scene; origins: [B, 3].
    Query convention (reference `refinement.py:33-39`): lattice nodes of the
    stride-s scale sit at world pos center0 + s*i*edge, center0 = origin +
    edge/2, so node coords are ((pt - center0) / (s * edge)).
    Returns [B, Q, sum C] with finest scale FIRST (the reference prepends
    each coarser scale's features: final order fine→coarse).

    On TPU each scale's 8 taps are fetched as ONE oct-packed gather when
    the packed table fits the budget (XLA gather cost is per row — see
    `pack_bilinear_quads`).
    """
    center0 = origins + 0.5 * edge_len              # [B, 3]
    feats = []
    for sc in scales:
        s = sc["stride"]
        q = (pts - center0[:, None, :]) / (s * edge_len)
        if sc.get("octs") is not None:              # prepacked (eval path)
            X, Y, Z = sc["dims"]
            feats.append(trilinear_sample_octs_batched(sc["octs"], q,
                                                       (X, Y, Z)))
            continue
        g = sc["grid"]
        B, X, Y, Z, C = g.shape
        packed_bytes = (B * (X + 1) * (Y + 1) * (Z + 1) * 8 * C
                        * g.dtype.itemsize)
        if packed_bytes <= _PACK_BUDGET_BYTES:
            octs = jax.vmap(pack_trilinear_octs)(g)
            feats.append(trilinear_sample_octs_batched(octs, q, (X, Y, Z)))
        else:
            feats.append(trilinear_sample_batched(g, q))
    # scales arrive coarsest-first; reference output order is finest-first
    return jnp.concatenate(feats[::-1], axis=-1)


class HypothesisDecoder(nn.Module):
    hidden: int = 128
    ksize: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """feats: [M, n_hyp, C] per-hypothesis features (scene scales +
        variance).  Returns softmax scores [M, n_hyp]."""
        y = feats.astype(self.dtype)
        for i in range(3):
            y = nn.Conv(self.hidden, (self.ksize,), padding="SAME",
                        use_bias=False, dtype=self.dtype)(y)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32)(y)
            y = nn.relu(y)
        y = nn.Conv(1, (self.ksize,), padding="SAME", dtype=self.dtype)(y)
        return nn.softmax(y[..., 0].astype(jnp.float32), axis=-1)
