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
                                 trilinear_sample_octs_batched,
                                 trilinear_sample_octs_scaled_batched,
                                 upsample_linear_zeropad)

# oct-packed tables cost 8x the grid's memory; above this budget fall back
# to the 8-tap sampler.  1.75 GB admits the finest scale of auto-sized eval
# grids up to ~160x160x64 (bf16) — one wide-row gather beats eight C-wide
# ones by ~8x on TPU (gather cost is per row).
_PACK_BUDGET_BYTES = 1792 * 1024 * 1024

# scale-combining budget (eval fast path, see combine_scales): the combined
# fine-lattice table costs 8 * sum(C) * prod(dims+1) bytes; 3.5 GB admits
# the 48-keyframe bench scene's 112x112x48 auto grid at 320 channels.
_COMBINE_BUDGET_BYTES = 3584 * 1024 * 1024


def combine_scales(scales):
    """Merge U-Net scales into the fewest fine-lattice grids the pack
    budget allows (eval fast path).

    The scale lattices are NESTED (stride-s node i sits at world position
    center0 + s*i*edge, so it is fine node s*i), and trilinear interpolation
    of a multilinear field restricted to a sub-cell is exact — so sampling a
    coarse scale equals sampling its linearly-upsampled image on the fine
    lattice (`upsample_linear_zeropad`), including the zero-padding region.
    Combining turns 3 gathers + 3 epilogues per query into 1 wide-row
    gather: XLA's TPU gather cost is dominated by a ~11 ns/row term
    (tools/bench_gather_variants.py), so fewer, wider rows win.

    scales: coarsest-first [{"grid": [B,x,y,z,C], "stride": s}, ...].
    Returns a coarsest-first list with the same sampling semantics; entry
    channel order within a combined grid is finest-scale-first, so
    `sample_scales`' fine-first output concat order is preserved.
    """
    if len(scales) <= 1:
        return scales
    by_fine = sorted(scales, key=lambda sc: sc["stride"])  # finest first
    itemsize = by_fine[0]["grid"].dtype.itemsize
    for ti, tgt in enumerate(by_fine):
        ts = tgt["stride"]
        B, X, Y, Z, _ = tgt["grid"].shape
        n_ch = sum(sc["grid"].shape[-1] for sc in by_fine[ti:])
        pn = by_fine[-1]["stride"] // ts - 1
        packed = (B * (X + pn + 1) * (Y + pn + 1) * (Z + pn + 1) * 8 * n_ch
                  * itemsize)
        if packed > _COMBINE_BUDGET_BYTES:
            continue
        # exactness needs the coarse coverage (incl. its zero-pad ramp) to
        # end exactly at the fine grid's: dim_s * (s/ts) == dim_ts per axis.
        # True for bucket-rounded eval grids (multiples of 16); guard the
        # general case by falling through to the unfused path.
        if any(d * (sc["stride"] // ts) != D
               for sc in by_fine[ti + 1:]
               for d, D in zip(sc["grid"].shape[1:4], (X, Y, Z))):
            continue
        # a stride-s scale's zero-pad ramp spans s fine cells on the LOW
        # side of the volume (on the high side coverage ends exactly at
        # dim*s == D by the guard above, where the fine ramp coincides).
        # Extend the combined lattice by PAD = r_max - 1 low-side nodes
        # carrying the true ramp values so out-of-volume queries stay exact.
        pad_n = by_fine[-1]["stride"] // ts - 1

        def low_pad(g, n):
            return jnp.pad(g, ((0, 0), (n, 0), (n, 0), (n, 0), (0, 0))) \
                if n else g

        parts = [low_pad(tgt["grid"], pad_n)]
        for sc in by_fine[ti + 1:]:
            r = sc["stride"] // ts
            up = upsample_linear_zeropad(low_pad(sc["grid"], 1), r,
                                         (X + r, Y + r, Z + r))
            # nodes cover fine [-r, D-1]; align to [-pad_n, D-1]
            sl = max(r - pad_n, 0)
            up = up[:, sl:, sl:, sl:]
            parts.append(low_pad(up, max(pad_n - r, 0)))
        combined = {"grid": jnp.concatenate(parts, axis=-1), "stride": ts,
                    "cell_offset": float(pad_n)}
        # finer-than-target scales stay separate, coarsest-first order
        return [combined] + by_fine[:ti][::-1]
    return scales


def pack_scales(grids, budget: int = _PACK_BUDGET_BYTES):
    """Oct-pack a list of dense scale grids ([B, X, Y, Z, C] each).

    Returns one packed table per scale (None where the table would exceed
    the budget).  Used by the eval path to build the tables ONCE per scene
    iteration instead of inside every pointflow chunk dispatch."""
    out = []
    for g in grids:
        B, X, Y, Z, C = g.shape
        packed_bytes = (B * (X + 1) * (Y + 1) * (Z + 1) * 8 * C
                        * g.dtype.itemsize)
        if packed_bytes <= budget:
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
        if sc.get("cell_offset"):                   # combined-grid low pad
            q = q + sc["cell_offset"]
        if sc.get("octs") is not None:              # prepacked (eval path)
            X, Y, Z = sc["dims"]
            if sc.get("oct_scale") is not None:     # int8 fast path
                feats.append(trilinear_sample_octs_scaled_batched(
                    sc["octs"], sc["oct_scale"], q, (X, Y, Z)))
            else:
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


def decoder_scene_projection(decoder_params, n_var: int, rank: int):
    """Rank-r spectral compression of the pointflow sampling interface
    (eval fast path, VERDICT r4 #4 — the route past the parity gather
    ceiling).

    The HypothesisDecoder's first conv is LINEAR in the sampled scene
    features: y[h] = sum_j K_j^T s[h+j] + (var terms).  Sampling is linear
    in the table, so a basis change V applied to the TABLE ONCE per scene
    iteration absorbs into the conv weights: table T -> T V, K_j -> V^T
    K_j, and the decoder sees V V^T s instead of s.  With V = the top-r
    left singular vectors of the stacked scene weights [K_-1 K_0 K_+1]
    ([n_scene, 3*hidden]), V V^T s is the optimal rank-r approximation of
    everything the first conv can extract — EXACT when r >= rank(stack).

    Why: the pointflow scene gather is bandwidth/row-bound
    (docs/ROOFLINE.md §3 D: 5 KB rows at the 78 GB/s gather ceiling =
    23 ms/pass); sampled rows shrink from n_scene to r channels, so the
    dominant term scales by ~r/n_scene (and drops into the ~11 ns/row
    regime below ~1 KB rows).  Quality is judged by the standing unseen-
    scene gate (tools/fastpath_gate.py), like every op-mix change.

    decoder_params: the decoder's param subtree (first conv 'Conv_0'
    kernel [taps, n_scene + n_var, hidden]).
    Returns (V [n_scene, rank] fp32, new_decoder_params, tail_energy)
    where tail_energy = sqrt(discarded spectral energy fraction).
    """
    import numpy as np

    k = np.asarray(decoder_params["Conv_0"]["kernel"], np.float32)
    T, n_in, H = k.shape
    n_scene = n_in - n_var
    assert 0 < rank < n_scene, (rank, n_scene)
    scene = k[:, :n_scene, :]                       # [T, n_scene, H]
    M = np.transpose(scene, (1, 0, 2)).reshape(n_scene, T * H)
    U, S, _ = np.linalg.svd(M, full_matrices=False)
    V = np.ascontiguousarray(U[:, :rank])           # [n_scene, r]
    proj = np.einsum("cr,tch->trh", V, scene)       # [T, r, H]
    new_k = np.concatenate([proj, k[:, n_scene:, :]], axis=1)
    tail = float(np.sqrt(np.sum(S[rank:] ** 2)
                         / max(np.sum(S ** 2), 1e-30)))
    new_params = dict(decoder_params)
    new_params["Conv_0"] = dict(decoder_params["Conv_0"],
                                kernel=jnp.asarray(new_k))
    return V, new_params, tail


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
                             epsilon=1e-5, dtype=self.dtype)(y)
            y = nn.relu(y)
        y = nn.Conv(1, (self.ksize,), padding="SAME", dtype=self.dtype)(y)
        return nn.softmax(y[..., 0].astype(jnp.float32), axis=-1)
