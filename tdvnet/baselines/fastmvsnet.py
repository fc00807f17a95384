"""FastMVSNet baseline: sparse cost volume → learned propagation →
differentiable Gauss–Newton depth refinement.

TPU-native counterpart of `mv3d/baselines/fastmvsnet/` (3,694 LoC torch):
- coarse variance cost volume + small 3D CNN → initial depth
  (`model.py:34-100`);
- a 9-way propagation network sharpens the depth using image-guided
  neighbor weights (`networks.py:46` — identical mechanism to the
  flagship's PropagationNet, shared here);
- per-pixel 1-D Gauss–Newton step minimizing the multi-view feature
  reprojection residual (`model.py:147-...` `gn_update`): here the
  Jacobian dF_src(proj(d))/dd comes from `jax.jvp` through the projection
  + bilinear sampling — exact derivatives instead of the reference's
  hand-assembled chain rule;
- probability map for fusion masking via the shared extractor.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tdvnet.baselines.pointmvsnet import (ImageConv, VolumeConv,
                                          prob_map_from_volume)
from tdvnet.models.upsampling import PropagationNet
from tdvnet.ops import camera, costvolume
from tdvnet.ops.sampling import bilinear_sample_batched, resize_nearest


def gauss_newton_step(depth, ref_feat, src_feats, src_idx_row, src_mask_row,
                      rotmats, tvecs, K, ref_i, img_size,
                      damping: float = 1e-6, step_clip: float | None = None,
                      accept_gate: bool = True):
    """One GN update of a single ref view's depth map.

    depth: [h, w]; ref_feat: [h, w, C] (ref features at depth res);
    src_feats: [N, hf, wf, C].  Returns refined depth [h, w].

    Solves per pixel: min_d sum_s ||F_s(pi_s(X(d))) - F_ref||^2 via
    delta = -(J^T r) / (J^T J + damping), with J from jax.jvp through the
    projection+sampling — the reference's `gn_update`
    (`mv3d/baselines/fastmvsnet/model.py:147-248`) with exact AD instead
    of its hand-assembled chain rule.  Matching the reference: damping
    1e-6 (`:228`) and an accept gate that keeps the update only where the
    summed |residual| decreased (`:245-248`).
    """
    h, w = depth.shape
    H, W = img_size
    Hf, Wf, C = src_feats.shape[1:]
    scale = jnp.array([(Wf - 1.0) / (W - 1.0), (Hf - 1.0) / (H - 1.0)])

    grid = camera.build_img_grid(img_size, (h, w))
    K_inv = jnp.linalg.inv(K[ref_i])
    rays = jnp.einsum("ij,pj->pi", K_inv, grid,
                      precision=jax.lax.Precision.HIGHEST)
    rays_w = jnp.einsum("ji,pj->pi", rotmats[ref_i], rays,
                        precision=jax.lax.Precision.HIGHEST)
    center = camera.camera_center(rotmats[ref_i], tvecs[ref_i])
    ref_flat = ref_feat.reshape(-1, C)

    def residuals(d_flat):
        pts = center[None] + rays_w * d_flat[:, None]        # [P, 3]
        res = []
        for s in range(src_idx_row.shape[0]):
            P_s = camera.projection_matrix(K[src_idx_row[s]][None],
                                           rotmats[src_idx_row[s]][None],
                                           tvecs[src_idx_row[s]][None])[0]
            xy, _ = camera.project_points(pts[None], P_s[None])
            f = bilinear_sample_batched(src_feats[src_idx_row[s]][None],
                                        xy * scale[None, None])[0]
            m = src_mask_row[s].astype(jnp.float32)
            res.append((f - ref_flat) * m)
        return jnp.stack(res, axis=0)                        # [S, P, C]

    d0 = depth.reshape(-1)
    r, jvp = jax.jvp(residuals, (d0,), (jnp.ones_like(d0),))
    # J has one column per pixel: JtJ and Jtr reduce over (S, C)
    JtJ = jnp.sum(jvp * jvp, axis=(0, 2))
    Jtr = jnp.sum(jvp * r, axis=(0, 2))
    delta = -Jtr / (JtJ + damping)
    if step_clip is not None:
        delta = jnp.clip(delta, -step_clip, step_clip)
    d1 = d0 + delta
    if accept_gate:
        first = jnp.sum(jnp.abs(r), axis=(0, 2))
        second = jnp.sum(jnp.abs(residuals(d1)), axis=(0, 2))
        d1 = jnp.where(second < first, d1, d0)
    return d1.reshape(h, w)


class FastMVSNet(nn.Module):
    img_size: Tuple[int, int] = (256, 320)
    depth_start: float = 0.5
    depth_interval: float = 0.1
    n_depth: int = 48

    def setup(self):
        self.img_conv = ImageConv(16)
        self.vol_conv = VolumeConv(8)
        self.propagation = PropagationNet(32)

    def __call__(self, images, rotmats, tvecs, K, ref_idx, src_idx, src_mask,
                 gn_iters: int = 1, train: bool = False):
        """Returns (depth [R, h, w], prob_map [R, h, w])."""
        f1, f2, f3 = self.img_conv(images, train)
        h, w = f3.shape[1:3]
        var = costvolume.plane_sweep_cost_volume(
            f3, rotmats, tvecs, K, ref_idx, src_idx, src_mask,
            self.depth_start, self.depth_interval, self.n_depth,
            self.img_size, (h, w))
        cost = self.vol_conv(var, train)
        prob = nn.softmax(-cost, axis=1)
        dvals = self.depth_start + self.depth_interval * jnp.arange(
            self.n_depth, dtype=jnp.float32)
        depth = jnp.sum(prob * dvals[None, :, None, None], axis=1)
        prob_map = prob_map_from_volume(prob, depth, self.depth_start,
                                        self.depth_interval)

        # guided propagation at quarter-feature resolution
        depth = self.propagation(f3[ref_idx], depth, train)

        # Gauss-Newton refinement against half-res features
        for _ in range(gn_iters):
            depth = jax.vmap(
                lambda d, ri, si, sm: gauss_newton_step(
                    d, resize_nearest(
                        f2[ri].transpose(2, 0, 1),
                        d.shape).transpose(1, 2, 0),
                    f2, si, sm, rotmats, tvecs, K, ri, self.img_size)
            )(depth, ref_idx, src_idx, src_mask)
        return depth, prob_map


def init_fastmvsnet(rng, img_size=(64, 80), n_imgs=3,
                    depth_cfg=(0.5, 0.2, 16)):
    ds, di, nd = depth_cfg
    model = FastMVSNet(img_size, ds, di, nd)
    H, W = img_size
    variables = jax.jit(lambda r: model.init(
        r, jnp.zeros((n_imgs, H, W, 3)), jnp.tile(jnp.eye(3), (n_imgs, 1, 1)),
        jnp.zeros((n_imgs, 3)), jnp.tile(jnp.eye(3), (n_imgs, 1, 1)),
        jnp.asarray([1]), jnp.asarray([[0, 2]]), jnp.ones((1, 2), bool),
        1, False))(rng)
    return model, variables


def make_pred_fn(model: FastMVSNet, variables, chunk: int = 4):
    """Harness pred_fn returning (depth, init_prob, None)
    (`eval-fastmvsnet.py:6-32`)."""
    from tdvnet.baselines.dvmvs import _local_tables

    @jax.jit
    def run(variables, images, rotmats, tvecs, K, ri, si, sm):
        return model.apply(variables, images, rotmats, tvecs, K, ri, si, sm,
                           1, False)

    def pred_fn(views, scene_dir, dset):
        k = dset.k
        n = views["images"].shape[0]
        R_total = n - 2 * k
        depths, probs = [], []
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

            d, p = run(variables, pad(views["images"]), pad(views["rotmats"]),
                       pad(views["tvecs"]), pad(views["K"]), ri, si, sm)
            nv = r1 - r0
            depths.append(np.asarray(d[:nv]))
            probs.append(np.asarray(p[:nv]))
        return np.concatenate(depths, 0), np.concatenate(probs, 0), None

    return pred_fn
