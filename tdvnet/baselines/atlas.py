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


class TSDF3DNet(nn.Module):
    """3-scale dense 3D encoder-decoder + tanh TSDF head
    (counterpart of atlas backbone3d EncoderDecoder + TSDFHead)."""

    base: int = 32

    @nn.compact
    def __call__(self, vol, train=False):
        b = self.base
        c3 = lambda f, s: ConvBnRelu(f, (3, 3, 3), (s, s, s))
        e0 = c3(b, 1)(vol, train)
        e0 = c3(b, 1)(e0, train)
        e1 = c3(2 * b, 2)(e0, train)
        e1 = c3(2 * b, 1)(e1, train)
        e2 = c3(4 * b, 2)(e1, train)
        e2 = c3(4 * b, 1)(e2, train)
        # odd grid dims: crop the exact-2x upsample to the skip's shape
        crop = lambda u, ref: u[:, :ref.shape[1], :ref.shape[2],
                                :ref.shape[3], :]
        d1 = e1 + crop(ConvTransposeUp3d(2 * b)(e2, train), e1)
        d1 = c3(2 * b, 1)(d1, train)
        d0 = e0 + crop(ConvTransposeUp3d(b)(d1, train), e0)
        d0 = c3(b, 1)(d0, train)
        tsdf = 1.05 * jnp.tanh(nn.Conv(1, (1, 1, 1))(d0))
        return tsdf[..., 0]


class AtlasNet(nn.Module):
    """Full Atlas-style model: 2D features → ray fill → 3D net → TSDF."""

    feat_dim: int = FEAT_DIM

    def setup(self):
        self.backbone = MnasMulti()
        self.fpn = FPN(self.feat_dim)
        self.net3d = TSDF3DNet()

    def features(self, images, train=False):
        return self.fpn(self.backbone(images, train))[1]  # quarter res

    def __call__(self, images, projections, origin, dims: Tuple[int, int, int],
                 voxel_size: float = VOXEL_SIZE, train: bool = False):
        feats = self.features(images, train)
        vol, valid = backproject_accumulate(feats, projections, origin, dims,
                                            voxel_size)
        x = jnp.concatenate([vol, valid], axis=-1)[None]
        tsdf = self.net3d(x, train)[0]
        # unobserved voxels are empty space (tsdf = 1)
        return jnp.where(valid[..., 0] > 0, tsdf, 1.0)


def atlas_tsdf_loss(pred_tsdf, gt_tsdf, gt_weight):
    """L1 on log-transformed TSDF over observed voxels (Atlas heads3d)."""
    logt = lambda x: jnp.sign(x) * jnp.log1p(jnp.abs(x))
    mask = (gt_weight > 0).astype(jnp.float32)
    return jnp.sum(jnp.abs(logt(pred_tsdf) - logt(gt_tsdf)) * mask) \
        / jnp.maximum(jnp.sum(mask), 1.0)


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
