"""Atlas baseline: volumetric TSDF regression from back-projected image
features accumulated over all views.

TPU-native counterpart of `mv3d/baselines/atlas/` (3,222 LoC torch +
detectron2): 2D features are filled along rays into a dense voxel grid with
a running mean across views (`model.py:35-84` backproject + `:137-186`
accumulation — the per-view python loop becomes one `lax.scan`), a 3D
encoder-decoder regularizes the volume, and a tanh TSDF head regresses the
field that marching cubes meshes (`eval-atlas.py:13-39`).  The 2D backbone
is the shared MnasMulti+FPN (quarter-res features) instead of detectron2's
ResNet50-FPN.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tdvnet.models.backbone import MnasMulti
from tdvnet.models.fpn import FPN
from tdvnet.models.layers import ConvBnRelu, ConvTransposeUp3d

FEAT_DIM = 32
VOXEL_SIZE = 0.04


def backproject_accumulate(feats, projections, origin, dims, voxel_size,
                           feat_stride: int = 4):
    """Mean of per-view voxel features along camera rays.

    feats: [N, h, w, C] (stride-`feat_stride` features); projections:
    [N, 3, 4] full-res K[R|t].  Returns (volume [nx, ny, nz, C],
    valid [nx, ny, nz, 1]) — the running mean/counter of `model.py:137-186`.
    """
    N, h, w, C = feats.shape
    nx, ny, nz = dims
    ii, jj, kk = jnp.meshgrid(jnp.arange(nx), jnp.arange(ny), jnp.arange(nz),
                              indexing="ij")
    world = (jnp.stack([ii, jj, kk], -1).reshape(-1, 3).astype(jnp.float32)
             * voxel_size + origin[None])
    V = world.shape[0]

    def body(carry, i):
        vol, cnt = carry
        P = projections[i]
        cam = jnp.einsum("ij,vj->vi", P[:, :3], world,
                         precision=jax.lax.Precision.HIGHEST) + P[:, 3]
        z = cam[:, 2]
        px = jnp.round(cam[:, 0] / jnp.maximum(z, 1e-6) / feat_stride)
        py = jnp.round(cam[:, 1] / jnp.maximum(z, 1e-6) / feat_stride)
        px = px.astype(jnp.int32)
        py = py.astype(jnp.int32)
        ok = (px >= 0) & (px < w) & (py >= 0) & (py < h) & (z > 0)
        f = feats[i][jnp.clip(py, 0, h - 1), jnp.clip(px, 0, w - 1)]
        okf = ok.astype(jnp.float32)[:, None]
        return (vol + f * okf, cnt + okf[:, 0]), None

    init = (jnp.zeros((V, C), jnp.float32), jnp.zeros((V,), jnp.float32))
    (vol, cnt), _ = jax.lax.scan(body, init, jnp.arange(N))
    denom = jnp.maximum(cnt, 1.0)[:, None]
    volume = (vol / denom).reshape(nx, ny, nz, C)
    valid = jnp.minimum(cnt, 1.0).reshape(nx, ny, nz, 1)
    return volume, valid


class BasicBlock3d(nn.Module):
    """Residual 3D block (atlas `backbone3d.py:30-60` BasicBlock3d):
    conv-BN-relu-conv-BN + identity, zero-init second BN scale."""

    features: int

    @nn.compact
    def __call__(self, x, train=False):
        bn = lambda zero: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            scale_init=nn.initializers.zeros if zero
            else nn.initializers.ones)
        y = nn.Conv(self.features, (3, 3, 3), padding="SAME",
                    use_bias=False)(x)
        y = nn.relu(bn(False)(y))
        y = nn.Conv(self.features, (3, 3, 3), padding="SAME",
                    use_bias=False)(y)
        y = bn(True)(y)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1, 1), use_bias=False)(x)
        return nn.relu(x + y)


class TSDF3DNet(nn.Module):
    """Reference-capacity 3D encoder-decoder + multi-scale log-TSDF head.

    Mirrors atlas `backbone3d.py:134` EncoderDecoder at the reference's
    configured capacity (`config.py:115-117`: channels (32, 64, 128, 256),
    layers_down (1, 2, 3, 4), layers_up (3, 2, 1)) and the
    multi-scale `heads3d.py:58` TSDFHead: a 1x1 conv + tanh head at every
    decoder scale, each finer scale sparsified where the coarser scale is
    already confident (|tsdf| >= sparse_threshold -> sign * 0.999).
    Returns tsdf list coarse-to-fine, finest last.
    """

    channels: Tuple[int, ...] = (32, 64, 128, 256)
    layers_down: Tuple[int, ...] = (1, 2, 3, 4)
    layers_up: Tuple[int, ...] = (3, 2, 1)
    label_smoothing: float = 1.05
    sparse_threshold: float = 0.99

    @nn.compact
    def __call__(self, vol, train=False):
        chs = self.channels
        x = nn.Conv(chs[0], (1, 1, 1), use_bias=False)(vol)
        skips = []
        for lvl, ch in enumerate(chs):
            if lvl > 0:
                x = ConvBnRelu(ch, (3, 3, 3), (2, 2, 2))(x, train)
            for _ in range(self.layers_down[lvl]):
                x = BasicBlock3d(ch)(x, train)
            skips.append(x)

        crop = lambda u, ref: u[:, :ref.shape[1], :ref.shape[2],
                                :ref.shape[3], :]
        tsdfs = []
        head = lambda h: self.label_smoothing * jnp.tanh(
            nn.Conv(1, (1, 1, 1), use_bias=False)(h)[..., 0])
        tsdfs.append(head(x))                           # coarsest scale
        for i, ch in enumerate(reversed(chs[:-1])):
            x = crop(ConvTransposeUp3d(ch)(x, train), skips[-2 - i])
            x = (x + skips[-2 - i]) / 2
            for _ in range(self.layers_up[i]):
                x = BasicBlock3d(ch)(x, train)
            t = head(x)
            # coarse-confident region is frozen to +-0.999 (heads3d:102-110)
            prev = tsdfs[-1]
            prev_up = crop(jnp.repeat(jnp.repeat(jnp.repeat(
                prev, 2, 1), 2, 2), 2, 3)[..., None], x)[..., 0]
            confident = jnp.abs(prev_up) >= self.sparse_threshold
            t = jnp.where(confident, jnp.sign(prev_up) * 0.999, t)
            tsdfs.append(t)
        return tsdfs


class AtlasNet(nn.Module):
    """Full Atlas-style model: 2D features → ray fill → 3D net → TSDF."""

    feat_dim: int = FEAT_DIM

    def setup(self):
        self.backbone = MnasMulti()
        self.fpn = FPN(self.feat_dim)
        self.net3d = TSDF3DNet()

    def features(self, images, train=False):
        return self.fpn(self.backbone(images, train))[1]  # quarter res

    def multi_scale(self, images, projections, origin,
                    dims: Tuple[int, int, int],
                    voxel_size: float = VOXEL_SIZE, train: bool = False):
        """All TSDF scales (coarse→fine) + finest-res validity, for the
        multi-scale training loss (heads3d multi_scale=True)."""
        feats = self.features(images, train)
        vol, valid = backproject_accumulate(feats, projections, origin, dims,
                                            voxel_size)
        x = jnp.concatenate([vol, valid], axis=-1)[None]
        return self.net3d(x, train), valid

    def __call__(self, images, projections, origin, dims: Tuple[int, int, int],
                 voxel_size: float = VOXEL_SIZE, train: bool = False):
        tsdfs, valid = self.multi_scale(images, projections, origin, dims,
                                        voxel_size, train)
        tsdf = tsdfs[-1][0]                       # finest scale, batch 0
        # unobserved voxels are empty space (tsdf = 1)
        return jnp.where(valid[..., 0] > 0, tsdf, 1.0)


def atlas_tsdf_loss(pred_tsdf, gt_tsdf, gt_weight):
    """L1 on log-transformed TSDF over observed voxels (Atlas heads3d)."""
    logt = lambda x: jnp.sign(x) * jnp.log1p(jnp.abs(x))
    mask = (gt_weight > 0).astype(jnp.float32)
    return jnp.sum(jnp.abs(logt(pred_tsdf) - logt(gt_tsdf)) * mask) \
        / jnp.maximum(jnp.sum(mask), 1.0)


def atlas_multi_scale_loss(tsdfs, gt_tsdf, gt_weight):
    """Sum of per-scale log-L1 losses (heads3d:114-139): GT down-sampled by
    min-|tsdf| pooling to each scale."""
    total = 0.0
    for t in tsdfs:
        f = gt_tsdf.shape[0] // t.shape[1]
        if f > 1:
            mag = -nn.max_pool(-jnp.abs(gt_tsdf)[None, ..., None],
                               (f, f, f), strides=(f, f, f))[0, ..., 0]
            sgn = jnp.sign(nn.avg_pool(gt_tsdf[None, ..., None], (f, f, f),
                                       strides=(f, f, f))[0, ..., 0])
            gt_s = jnp.where(sgn == 0, 1.0, sgn) * mag
            w_s = nn.max_pool(gt_weight[None, ..., None], (f, f, f),
                              strides=(f, f, f))[0, ..., 0]
        else:
            gt_s, w_s = gt_tsdf, gt_weight
        d = [min(a, b) for a, b in zip(t.shape[1:], gt_s.shape)]
        total = total + atlas_tsdf_loss(t[0, :d[0], :d[1], :d[2]],
                                        gt_s[:d[0], :d[1], :d[2]],
                                        w_s[:d[0], :d[1], :d[2]])
    return total


def init_atlas(rng, img_size=(64, 80), dims=(32, 32, 32)):
    model = AtlasNet()
    H, W = img_size
    variables = jax.jit(lambda r: model.init(
        r, jnp.zeros((2, H, W, 3)), jnp.zeros((2, 3, 4)), jnp.zeros(3),
        dims, VOXEL_SIZE, False))(rng)
    return model, variables


def make_pred_fn(model: AtlasNet, variables, voxel_size: float = VOXEL_SIZE,
                 max_dim: int = 208, img_batch: int = 50):
    """Harness pred_fn (depth=False): returns a mesh (verts, faces).

    Origin follows the reference: GT-mesh min bound − 0.25
    (`eval-atlas.py:17-19`); the feature accumulation streams over image
    chunks like `VoxelNet.inference1`.
    """
    import json
    import os

    from tdvnet.ops import marching, ply

    @functools.partial(jax.jit, static_argnames=("dims",))
    def run(variables, images, projections, origin, dims):
        return model.apply(variables, images, projections, origin, dims,
                           voxel_size, False)

    def pred_fn(views, scene_dir, dset):
        info = json.load(open(os.path.join(scene_dir, "info.json")))
        gverts, _, _ = ply.read_ply(info["gt_mesh"])
        origin = gverts.min(axis=0) - 0.25
        extent = gverts.max(axis=0) + 0.25 - origin
        dims = tuple(int(x) for x in
                     np.minimum(np.ceil(extent / voxel_size), max_dim)
                     .astype(int))
        P = np.einsum("nij,njk->nik", views["K"],
                      np.concatenate([views["rotmats"],
                                      views["tvecs"][..., None]], axis=2))
        tsdf = run(variables, jnp.asarray(views["images"]),
                   jnp.asarray(P.astype(np.float32)), jnp.asarray(origin),
                   dims)
        verts, faces = marching.marching_tetrahedra(np.asarray(tsdf), 0.0)
        verts = verts * voxel_size + origin[None]
        return verts.astype(np.float32), faces

    return pred_fn
