"""NeuralRecon baseline: incremental coarse-to-fine TSDF prediction per
keyframe fragment with GRU fusion into a global hidden volume.

TPU-native counterpart of `mv3d/baselines/neuralrecon/` (4,048 LoC torch +
torchsparse + PyCUDA): fragments of 9 keyframes (`eval-neuralrecon.py:25-80`)
are processed coarse-to-fine over 3 voxel scales (16/8/4 cm, `NeuConNet`,
`models/neucon_network.py:15-68`); each scale back-projects image features
into the fragment grid, concatenates the upsampled previous scale, runs 3D
convs masked by the coarser occupancy (the torchsparse SPVCNN becomes our
masked dense convs — same semantics, MXU-friendly), and predicts occupancy +
TSDF.  A convolutional GRU fuses the finest fragment volume into a global
hidden state (`models/gru_fusion.py:8`), kept host-side and cropped per
fragment.  The final global TSDF is meshed for the depth=False harness path.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tdvnet.baselines.atlas import backproject_accumulate
from tdvnet.models.backbone import MnasMulti
from tdvnet.models.fpn import FPN
from tdvnet.models.layers import MaskedGroupNorm
from tdvnet.models.scene_unet import MaskedConv3d

FRAGMENT_SIZE = 9
VOXEL_FINE = 0.04
SCALES = (4, 2, 1)          # voxel multipliers: 16, 8, 4 cm
OCC_THRESH = 0.5
HID = 32


def _upsample3d(x, factor=2):
    """Nearest 2x upsample of [X, Y, Z, C]."""
    for ax in range(3):
        x = jnp.repeat(x, factor, axis=ax)
    return x


class _MaskedRes(nn.Module):
    """torchsparse ResidualBlock (`models/modules.py:43-68`) on the masked
    dense grid: conv-GN-relu-conv-GN + (projected) skip, relu."""

    features: int

    @nn.compact
    def __call__(self, x, mask):
        g = 4 if self.features % 4 == 0 else 1
        y = MaskedConv3d(self.features)(x, mask)
        y = MaskedGroupNorm(g, self.features)(y, mask)
        y = nn.relu(y) * mask
        y = MaskedConv3d(self.features)(y, mask)
        y = MaskedGroupNorm(g, self.features)(y, mask)
        if x.shape[-1] != self.features:
            x = MaskedConv3d(self.features, kernel=1)(x, mask)
            x = MaskedGroupNorm(g, self.features)(x, mask)
        return nn.relu(y + x) * mask


class _ScaleNet(nn.Module):
    """Per-scale SPVCNN-equivalent masked U-Net + occupancy/TSDF heads.

    Mirrors torchsparse `SPVCNN` (`models/modules.py:72-160`): stem →
    2 stride-2 stages of residual pairs → 2 deconv stages with skip
    concatenation and residual pairs; channel plan cs = (32, 64, 128,
    96, 96) * cr with cr halving at each finer pyramid level
    (`neucon_network.py:38-44`).
    """

    cr: float = 1.0

    @nn.compact
    def __call__(self, x, mask):
        cs = tuple(max(int(self.cr * c), 8) for c in (32, 64, 128, 96, 96))
        from tdvnet.models.layers import downsample_mask

        m0 = mask
        x0 = MaskedConv3d(cs[0])(x, m0)
        x0 = MaskedGroupNorm(4, cs[0])(x0, m0)
        x0 = nn.relu(x0) * m0

        m1 = downsample_mask(m0)
        x1 = MaskedConv3d(cs[0], strides=2)(x0, m1)
        x1 = MaskedGroupNorm(4, cs[0])(x1, m1)
        x1 = nn.relu(x1) * m1
        x1 = _MaskedRes(cs[1])(x1, m1)
        x1 = _MaskedRes(cs[1])(x1, m1)

        m2 = downsample_mask(m1)
        x2 = MaskedConv3d(cs[1], strides=2)(x1, m2)
        x2 = MaskedGroupNorm(4, cs[1])(x2, m2)
        x2 = nn.relu(x2) * m2
        x2 = _MaskedRes(cs[2])(x2, m2)
        x2 = _MaskedRes(cs[2])(x2, m2)

        from tdvnet.models.scene_unet import MaskedUpConv3d

        u1 = MaskedUpConv3d(cs[3])(x2, m1)
        u1 = MaskedGroupNorm(4, cs[3])(u1, m1)
        u1 = nn.relu(u1) * m1
        u1 = _MaskedRes(cs[3])(jnp.concatenate([u1, x1], -1), m1)
        u1 = _MaskedRes(cs[3])(u1, m1)

        u2 = MaskedUpConv3d(cs[4])(u1, m0)
        u2 = MaskedGroupNorm(4, cs[4])(u2, m0)
        u2 = nn.relu(u2) * m0
        u2 = _MaskedRes(cs[4])(jnp.concatenate([u2, x0], -1), m0)
        u2 = _MaskedRes(cs[4])(u2, m0)

        occ = nn.Conv(1, (1, 1, 1))(u2)[..., 0]
        tsdf = 1.05 * jnp.tanh(nn.Conv(1, (1, 1, 1))(u2)[..., 0])
        return u2, occ, tsdf


class _GRUFusion(nn.Module):
    """Convolutional GRU over the fragment crop of the global hidden state
    (`gru_fusion.py:8`)."""

    hidden: int = HID

    @nn.compact
    def __call__(self, h, x):
        cat = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(nn.Conv(self.hidden, (3, 3, 3), padding="SAME")(cat))
        r = nn.sigmoid(nn.Conv(self.hidden, (3, 3, 3), padding="SAME")(cat))
        n = jnp.tanh(nn.Conv(self.hidden, (3, 3, 3), padding="SAME")(
            jnp.concatenate([r * h, x], axis=-1)))
        return (1 - z) * h + z * n


class NeuralReconNet(nn.Module):
    """Fragment network: coarse-to-fine TSDF + GRU fusion."""

    feat_dim: int = 32

    def setup(self):
        self.backbone = MnasMulti()
        self.fpn = FPN(self.feat_dim)
        # channel ratio halves per finer level (`neucon_network.py:38-44`:
        # SPVCNN(cr=1/2**i) coarse-to-fine)
        self.scale_nets = [_ScaleNet(cr=1.0 / 2 ** i) for i in range(3)]
        self.adj = [MaskedConv3d(HID, kernel=1, use_bias=True)
                    for _ in range(3)]
        self.gru = _GRUFusion(HID)
        self.final_tsdf = nn.Conv(1, (1, 1, 1))

    def features(self, images, train=False):
        p = self.fpn(self.backbone(images, train))
        return p[1], p[2], p[3]   # strides 4, 8, 16

    def __call__(self, images, projections, origin,
                 dims_fine: Tuple[int, int, int], h_prev,
                 voxel_fine: float = VOXEL_FINE, train: bool = False):
        """One fragment.  h_prev: [*dims_fine, HID] global hidden crop.

        Returns (tsdf [dims_fine], occ_logits, h_new).
        """
        f4, f8, f16 = self.features(images, train)
        feats_per_scale = [f16, f8, f4]
        strides_per_scale = [16, 8, 4]

        prev_feats = None
        mask = None
        occ_all = []
        tsdf_all = []
        for lvl, s in enumerate(SCALES):           # coarse → fine
            dims = tuple(d // s for d in dims_fine)
            vsize = voxel_fine * s
            vol, valid = backproject_accumulate(
                feats_per_scale[lvl], projections, origin, dims, vsize,
                feat_stride=strides_per_scale[lvl])
            if prev_feats is None:
                x = jnp.concatenate([vol, valid], axis=-1)[None]
                mask = valid[None]
            else:
                up = _upsample3d(prev_feats)
                x = jnp.concatenate([vol, valid, up], axis=-1)[None]
                mask = jnp.minimum(_upsample3d(mask[0])[None][..., :1]
                                   + valid[None], 1.0)
            x = self.adj[lvl](x, mask)
            x, occ, tsdf_lvl = self.scale_nets[lvl](x, mask)
            occ_all.append(occ[0])
            tsdf_all.append(tsdf_lvl[0])
            # sparsify: next level only where this level is occupied
            occ_mask = (nn.sigmoid(occ) > OCC_THRESH).astype(jnp.float32)
            mask = mask * occ_mask[..., None]
            prev_feats = x[0]

        h_new = self.gru(h_prev, prev_feats)
        tsdf = 1.05 * jnp.tanh(self.final_tsdf(h_new)[..., 0])
        final_mask = mask[0, ..., 0]
        tsdf = jnp.where(final_mask > 0, tsdf, 1.0)
        return tsdf, occ_all, tsdf_all, h_new, final_mask


def neuralrecon_loss(occ_all, tsdf, gt_tsdf, gt_weight, dims_fine,
                     tsdf_all=None):
    """BCE occupancy + L1 log-TSDF at EVERY scale (each level's tsdf head
    is supervised like the reference `neucon_network.py:165-175`, which
    calls `compute_loss(tsdf, occ, ...)` per level), plus L1 log-TSDF on
    the final fused volume.  tsdf_all=None reproduces the pre-round-5
    finest-only supervision (the per-level heads then get no gradient —
    the round-4 "TSDF never crosses zero" failure mode)."""
    logt = lambda x: jnp.sign(x) * jnp.log1p(jnp.abs(x))
    total = 0.0
    for lvl, s in enumerate(SCALES):
        gt_s = -nn.max_pool(-gt_tsdf[None, ..., None],
                            (s, s, s), strides=(s, s, s))[0, ..., 0] \
            if s > 1 else gt_tsdf
        w_s = nn.max_pool(gt_weight[None, ..., None], (s, s, s),
                          strides=(s, s, s))[0, ..., 0] if s > 1 else gt_weight
        occ_gt = (jnp.abs(gt_s) < 1.0).astype(jnp.float32)
        m = (w_s > 0).astype(jnp.float32)
        logits = occ_all[lvl]
        bce = jnp.maximum(logits, 0) - logits * occ_gt \
            + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        total = total + jnp.sum(bce * m) / jnp.maximum(jnp.sum(m), 1.0)
        if tsdf_all is not None:
            # per-level heads are already 1.05*tanh-bounded (_ScaleNet)
            total = total \
                + jnp.sum(jnp.abs(logt(tsdf_all[lvl]) - logt(gt_s)) * m) \
                / jnp.maximum(jnp.sum(m), 1.0)
    m = (gt_weight > 0).astype(jnp.float32)
    total = total + jnp.sum(jnp.abs(logt(tsdf) - logt(gt_tsdf)) * m) \
        / jnp.maximum(jnp.sum(m), 1.0)
    return total


def init_neuralrecon(rng, img_size=(64, 80), dims_fine=(32, 32, 32)):
    model = NeuralReconNet()
    H, W = img_size
    variables = jax.jit(lambda r: model.init(
        r, jnp.zeros((2, H, W, 3)), jnp.zeros((2, 3, 4)), jnp.zeros(3),
        dims_fine, jnp.zeros((*dims_fine, HID)), VOXEL_FINE, False))(rng)
    return model, variables


def make_pred_fn(model: NeuralReconNet, variables,
                 voxel_fine: float = VOXEL_FINE, frag_dim: int = 48,
                 max_global_dim: int = 256):
    """Harness pred_fn (depth=False): incremental fragments → global mesh.

    The global hidden + TSDF volumes live host-side; each fragment crops a
    static [frag_dim]^3 window around the fragment's view centers.
    """
    from tdvnet.ops import marching

    dims_fine = (frag_dim,) * 3

    @jax.jit
    def run(variables, images, projections, origin, h_prev):
        return model.apply(variables, images, projections, origin, dims_fine,
                           h_prev, voxel_fine, False)

    def pred_fn(views, scene_dir, dset):
        import jax.numpy as jnp

        n = views["images"].shape[0]
        # global volume bounds from camera centers +- margin
        centers = np.stack([
            -views["rotmats"][i].T @ views["tvecs"][i] for i in range(n)])
        g_lo = centers.min(0) - 3.0
        g_hi = centers.max(0) + 3.0
        g_dims = np.minimum(np.ceil((g_hi - g_lo) / voxel_fine),
                            max_global_dim).astype(int)
        g_tsdf = np.ones(tuple(g_dims), np.float32)
        g_w = np.zeros(tuple(g_dims), np.float32)
        g_h = np.zeros((*g_dims, HID), np.float32)

        for f0 in range(0, n, FRAGMENT_SIZE):
            f1 = min(f0 + FRAGMENT_SIZE, n)
            frag_centers = centers[f0:f1]
            mid = frag_centers.mean(0) + np.array([0, 0, 0.5])
            # fragment origin snapped to the global grid
            half = frag_dim * voxel_fine / 2
            o_idx = np.floor((mid - half - g_lo) / voxel_fine).astype(int)
            o_idx = np.clip(o_idx, 0, g_dims - frag_dim)
            origin = g_lo + o_idx * voxel_fine

            sl = tuple(slice(o_idx[d], o_idx[d] + frag_dim) for d in range(3))
            h_prev = jnp.asarray(g_h[sl])

            P = np.einsum("nij,njk->nik", views["K"][f0:f1],
                          np.concatenate([views["rotmats"][f0:f1],
                                          views["tvecs"][f0:f1][..., None]],
                                         axis=2)).astype(np.float32)
            imgs = views["images"][f0:f1]
            pad = FRAGMENT_SIZE - imgs.shape[0]
            if pad:
                imgs = np.concatenate([imgs, np.repeat(imgs[-1:], pad, 0)], 0)
                P = np.concatenate([P, np.repeat(P[-1:], pad, 0)], 0)

            tsdf, _, _, h_new, fmask = run(variables, jnp.asarray(imgs),
                                           jnp.asarray(P),
                                           jnp.asarray(origin), h_prev)
            tsdf = np.asarray(tsdf)
            fmask = np.asarray(fmask)
            g_h[sl] = np.asarray(h_new)
            upd = fmask > 0
            g_tsdf[sl] = np.where(upd, tsdf, g_tsdf[sl])
            g_w[sl] = np.maximum(g_w[sl], upd.astype(np.float32))

        n_upd = int((g_w > 0).sum())
        verts, faces = marching.marching_tetrahedra(g_tsdf, 0.0,
                                                    mask=g_w > 0)
        print(f"  [neuralrecon] updated voxels {n_upd}, "
              f"mesh verts {len(verts)}"
              + ("  (occupancy gate never opened — empty prediction)"
                 if n_upd == 0 else ""))
        verts = verts * voxel_fine + g_lo[None]
        return verts.astype(np.float32), faces

    return pred_fn
