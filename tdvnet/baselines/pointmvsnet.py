"""PointMVSNet baseline: coarse MVS depth + iterative point-cloud PointFlow
refinement with EdgeConv over kNN graphs.

TPU-native counterpart of `mv3d/baselines/pointmvsnet/` (3,939 LoC torch +
the `gather_knn` CUDA extension): a coarse variance cost volume regressed by
a small 3D CNN (`model.py:72-135`), then flow iterations that build 5 depth-
offset hypothesis points per pixel, fetch multi-scale feature variance at
them, and run EdgeConv message passing over a kNN graph before a softmax
over offsets (`model.py:155-240`, `networks.py:9-47`).

TPU redesign notes:
- the `gather_knn` CUDA kernel (fwd expand+gather, bwd atomicAdd scatter)
  becomes `jnp.take_along_axis` — JAX AD provides the scatter-add backward;
- kNN candidates are restricted to each pixel's 3x3 spatial neighborhood
  across all 5 hypothesis layers (45 candidates → top-k): geometric
  neighbors of a hypothesis point lie in that window, and the search
  becomes a static gather instead of an all-pairs sweep;
- probability maps (coarse + flow) reproduce the reference extractors
  (`mv3d/utils.py:111-182`) for the harness's confidence masking.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tdvnet.models.layers import ConvBnRelu, ConvTransposeUp3d
from tdvnet.ops import camera, costvolume
from tdvnet.ops.sampling import resize_nearest

K_NEIGHBORS = 16
INTERVALS = (-2.0, -1.0, 0.0, 1.0, 2.0)


class ImageConv(nn.Module):
    """3-scale image feature tower (`networks.py:84-126` contract:
    conv1 @ s2/32ch? — we keep (s1 16, s2 32, s4 64))."""

    base: int = 16

    @nn.compact
    def __call__(self, x, train=False):
        b = self.base
        c = lambda f, s, k=3: ConvBnRelu(f, (k, k), (s, s))
        c1 = c(b, 1)(c(b, 1)(x, train), train)
        c2 = c(2 * b, 1)(c(2 * b, 2, 5)(c1, train), train)
        c3 = c(4 * b, 1)(c(4 * b, 2, 5)(c2, train), train)
        return c1, c2, c3


class VolumeConv(nn.Module):
    """Small 3D U-Net cost regularizer (`networks.py:127-...`)."""

    base: int = 8

    @nn.compact
    def __call__(self, x, train=False):
        b = self.base
        c3 = lambda f, s: ConvBnRelu(f, (3, 3, 3), (s, s, s))
        e0 = c3(b, 1)(x, train)
        e1 = c3(2 * b, 2)(e0, train)
        e2 = c3(4 * b, 2)(e1, train)
        crop = lambda u, ref: u[:, :ref.shape[1], :ref.shape[2],
                                :ref.shape[3], :]
        d1 = e1 + crop(ConvTransposeUp3d(2 * b)(e2, train), e1)
        d0 = e0 + crop(ConvTransposeUp3d(b)(d1, train), e0)
        return nn.Conv(1, (3, 3, 3), padding="SAME")(d0)[..., 0]


class EdgeConv(nn.Module):
    """DGCNN edge convolution over a kNN graph (`networks.py:9-47`)."""

    features: int

    @nn.compact
    def __call__(self, feats, knn_idx, train=False):
        """feats: [P, C]; knn_idx: [P, k].  Returns [P, features]."""
        local = nn.Dense(self.features, use_bias=False)(feats)      # [P, F]
        edge = nn.Dense(self.features, use_bias=False)(feats)
        neigh = edge[knn_idx]                                       # [P, k, F]
        central = jnp.repeat(local[:, None, :], knn_idx.shape[1], 1)
        y = jnp.concatenate([central, neigh - central], axis=-1)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9)(y)
        y = nn.relu(y)
        return jnp.max(y, axis=1)                                   # [P, F]


def local_knn(xyz: jnp.ndarray, H: int, W: int, L: int,
              k: int = K_NEIGHBORS) -> jnp.ndarray:
    """kNN among each pixel's 3x3 spatial window across hypothesis layers.

    xyz: [L*H*W, 3] hypothesis points (layer-major).  Returns [L*H*W, k]
    indices into the flat point list.
    """
    P = L * H * W
    # candidate index grid: for point (l, y, x) → (l', y+dy, x+dx)
    lyx = jnp.arange(P)
    l0 = lyx // (H * W)
    y0 = (lyx // W) % H
    x0 = lyx % W
    cand = []
    for dl in range(L):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                yy = jnp.clip(y0 + dy, 0, H - 1)
                xx = jnp.clip(x0 + dx, 0, W - 1)
                cand.append(dl * H * W + yy * W + xx)
    cand = jnp.stack(cand, axis=1)                       # [P, 9L]
    d = jnp.sum((xyz[cand] - xyz[:, None, :]) ** 2, axis=-1)
    _, top = jax.lax.top_k(-d, k)
    return jnp.take_along_axis(cand, top, axis=1)


def prob_map_from_volume(prob_volume, depth, depth_start, depth_interval):
    """Sum of the two plane probabilities bracketing the predicted depth
    (reference `get_propability_map`, `mv3d/utils.py:111-145`)."""
    D = prob_volume.shape[1]
    dcoord = (depth - depth_start) / depth_interval
    lo = jnp.clip(jnp.floor(dcoord), 0, D - 1).astype(jnp.int32)
    hi = jnp.clip(jnp.ceil(dcoord), 0, D - 1).astype(jnp.int32)
    take = lambda idx: jnp.take_along_axis(prob_volume, idx[:, None], 1)[:, 0]
    return take(lo) + take(hi)


def prob_map_from_flow(flow_prob):
    """Bracketing-interval confidence of a flow distribution (reference
    `get_propability_map_from_flow`, `mv3d/utils.py:148-182`)."""
    L = flow_prob.shape[1]
    ivals = jnp.arange(L, dtype=jnp.float32)
    d = jnp.sum(flow_prob * ivals[None, :, None, None], axis=1)
    lo = jnp.clip(jnp.floor(d), 0, L - 1).astype(jnp.int32)
    hi = jnp.clip(jnp.ceil(d), 0, L - 1).astype(jnp.int32)
    take = lambda idx: jnp.take_along_axis(flow_prob, idx[:, None], 1)[:, 0]
    return take(lo) + take(hi)


class PointMVSNet(nn.Module):
    """Coarse depth + 2 point-flow refinement iterations."""

    img_size: Tuple[int, int] = (256, 320)
    depth_start: float = 0.5
    depth_interval: float = 0.1
    n_depth: int = 48

    def setup(self):
        self.coarse_conv = ImageConv(16)
        self.flow_conv = ImageConv(16)
        self.vol_conv = VolumeConv(8)
        in_dim = 16 + 32 + 64 + 24          # 3 pyramid variances + xyz*8
        self.edge1 = EdgeConv(64)
        self.edge2 = EdgeConv(64)
        self.edge3 = EdgeConv(64)
        self.flow_mlp = nn.Dense(1)

    def coarse_depth(self, images, rotmats, tvecs, K, ref_idx, src_idx,
                     src_mask, train=False):
        """Variance cost volume at 1/4 features → depth + prob map."""
        _, _, f3 = self.coarse_conv(images, train)      # [N, H/4, W/4, 64]
        h, w = f3.shape[1:3]
        var = costvolume.plane_sweep_cost_volume(
            f3, rotmats, tvecs, K, ref_idx, src_idx, src_mask,
            self.depth_start, self.depth_interval, self.n_depth,
            self.img_size, (h, w))
        cost = self.vol_conv(var, train)                # [R, D, h, w]
        prob = nn.softmax(-cost, axis=1)
        dvals = self.depth_start + self.depth_interval * jnp.arange(
            self.n_depth, dtype=jnp.float32)
        depth = jnp.sum(prob * dvals[None, :, None, None], axis=1)
        pm = prob_map_from_volume(prob, depth, self.depth_start,
                                  self.depth_interval)
        return depth, pm

    def point_flow(self, depth, images, rotmats, tvecs, K, ref_idx, src_idx,
                   src_mask, interval: float, train=False):
        """One refinement iteration at the depth map's resolution."""
        R, h, w = depth.shape
        L = len(INTERVALS)
        pyr = self.flow_conv(images, train)             # 3 scales

        # hypothesis world points [R, L, h*w, 3]
        grid = camera.build_img_grid(self.img_size, (h, w))
        K_inv = jnp.linalg.inv(K[ref_idx])
        rays = jnp.einsum("nij,pj->npi", K_inv, grid,
                          precision=jax.lax.Precision.HIGHEST)
        rays_w = jnp.einsum("nji,npj->npi", rotmats[ref_idx], rays,
                            precision=jax.lax.Precision.HIGHEST)
        center = camera.camera_center(rotmats[ref_idx], tvecs[ref_idx])
        ivals = jnp.asarray(INTERVALS, jnp.float32) * interval
        dh = depth.reshape(R, 1, h * w) + ivals[None, :, None]
        pts = center[:, None, None, :] + rays_w[:, None] * dh[..., None]
        pts = jax.lax.stop_gradient(pts)

        # multi-scale variance features at all hypothesis points
        feats = []
        for f in pyr:
            v = costvolume.hypothesis_point_variance(
                pts.reshape(R, L * h * w, 3), f, src_idx, src_mask,
                rotmats, tvecs, K, self.img_size)
            feats.append(v)
        xyz = pts.reshape(R, L * h * w, 3)
        mean = jnp.mean(xyz, axis=1, keepdims=True)
        std = jnp.maximum(jnp.std(xyz, axis=(1, 2), keepdims=True), 1e-6)
        xyz_n = (xyz - mean) / std
        feats.append(jnp.tile(xyz_n, (1, 1, 8)))
        feat = jnp.concatenate(feats, axis=-1)          # [R, LHW, C]

        # flatten refs into the point axis (knn indices offset per ref)
        # instead of jax.vmap over the bound EdgeConv modules: module calls
        # under plain vmap leak BatchNorm's mutable stats out of the trace,
        # and the reference's BatchNorm2d normalizes across the whole batch
        # anyway (`networks.py:9-47`)
        P = L * h * w
        knn = jax.vmap(lambda x: local_knn(x, h, w, L))(xyz_n)  # [R, P, k]
        knn_flat = (knn + (jnp.arange(R) * P)[:, None, None]).reshape(
            R * P, -1)
        f_flat = feat.reshape(R * P, -1)
        y1 = self.edge1(f_flat, knn_flat, train)
        y2 = self.edge2(y1, knn_flat, train)
        y3 = self.edge3(y2, knn_flat, train)
        edge = jnp.concatenate([y1, y2, y3], axis=-1)   # [R*P, 192]
        edge = edge.reshape(R, P, -1)
        logits = self.flow_mlp(edge)[..., 0].reshape(R, L, h, w)
        flow_prob = nn.softmax(-logits, axis=1)
        flow = jnp.sum(flow_prob * ivals[None, :, None, None], axis=1)
        return depth + flow, flow_prob

    def __call__(self, images, rotmats, tvecs, K, ref_idx, src_idx, src_mask,
                 n_flow: int = 2, train: bool = False):
        depth, coarse_prob = self.coarse_depth(images, rotmats, tvecs, K,
                                               ref_idx, src_idx, src_mask,
                                               train)
        flow_prob = None
        interval = self.depth_interval
        for it in range(n_flow):
            # upsample 2x each iteration like the reference scales
            H2, W2 = depth.shape[1] * 2, depth.shape[2] * 2
            if (H2 <= self.img_size[0] // 2):
                depth = resize_nearest(depth, (H2, W2))
            interval = interval / 2.0
            depth, flow_prob = self.point_flow(depth, images, rotmats, tvecs,
                                               K, ref_idx, src_idx, src_mask,
                                               interval, train)
        return depth, coarse_prob, flow_prob


def init_pointmvsnet(rng, img_size=(64, 80), n_imgs=3,
                     depth_cfg=(0.5, 0.2, 16)):
    ds, di, nd = depth_cfg
    model = PointMVSNet(img_size, ds, di, nd)
    H, W = img_size
    variables = jax.jit(lambda r: model.init(
        r, jnp.zeros((n_imgs, H, W, 3)), jnp.tile(jnp.eye(3), (n_imgs, 1, 1)),
        jnp.zeros((n_imgs, 3)), jnp.tile(jnp.eye(3), (n_imgs, 1, 1)),
        jnp.asarray([1]), jnp.asarray([[0, 2]]), jnp.ones((1, 2), bool),
        1, False))(rng)
    return model, variables


def make_pred_fn(model: PointMVSNet, variables, chunk: int = 4):
    """Harness pred_fn returning (depth, init_prob, final_prob) — the
    reference adapter contract (`eval-pointmvsnet.py:7-35`) whose prob maps
    drive confidence masking in `processresults.py:232-243`."""
    from tdvnet.baselines.dvmvs import _local_tables

    @jax.jit
    def run(variables, images, rotmats, tvecs, K, ri, si, sm):
        return model.apply(variables, images, rotmats, tvecs, K, ri, si, sm,
                           2, False)

    def pred_fn(views, scene_dir, dset):
        k = dset.k
        n = views["images"].shape[0]
        R_total = n - 2 * k
        depths, iprobs, fprobs = [], [], []
        for r0 in range(0, R_total, chunk):
            r1 = min(r0 + chunk, R_total)
            ri, si, sm, _ = _local_tables(n, r0, r1, k, chunk)
            sl = slice(r0, r0 + chunk + 2 * k)

            def pad(a):
                x = a[sl]
                need = chunk + 2 * k - x.shape[0]
                if need:
                    x = np.concatenate([x, np.repeat(x[-1:], need, 0)], 0)
                return jnp.asarray(x)

            d, ip, fp = run(variables, pad(views["images"]),
                            pad(views["rotmats"]), pad(views["tvecs"]),
                            pad(views["K"]), ri, si, sm)
            nv = r1 - r0
            depths.append(np.asarray(d[:nv]))
            iprobs.append(np.asarray(ip[:nv]))
            fprobs.append(np.asarray(prob_map_from_flow(fp[:nv])))
        return (np.concatenate(depths, 0), np.concatenate(iprobs, 0),
                np.concatenate(fprobs, 0))

    return pred_fn
