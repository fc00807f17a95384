"""ThreeDVNet — the flagship model: initial MVS depth, scene-level volumetric
modeling, iterative PointFlow refinement, multi-scale guided upsampling.

TPU-native counterpart of the reference `PL3DVNet`
(`mv3d/lightningmodel.py:14-296`).  The forward graph is identical in
structure; every dynamic-shape construct is replaced by the padded
fixed-shape batch + masked ops:

  initial depth   `make_initial_depth_predictions` (ref :124-130)
  point cloud     `build_scene_pointcloud`         (ref :132-174)
  scene volume    `model_scene`                    (ref :176-185)
  refinement      `run_pointflow`                  (ref :187-242)
  upsampling      3 stages inside `__call__`       (ref :83-119)

Loss = deep supervision with masked MAE at every stage and a λ ramp on the
refinement iterations (ref :65-81).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from tdvnet.config import DepthConfig, GridConfig, ModelConfig
from tdvnet.data.batch import FrameBatch
from tdvnet.eval import metrics2d
from tdvnet.models.hypothesis import HypothesisDecoder, sample_scales
from tdvnet.models.mvsnet import MVSNet
from tdvnet.models.pointnet import PointNet
from tdvnet.models.scene_unet import SceneUNet
from tdvnet.models.upsampling import PropagationNet
from tdvnet.ops import camera, costvolume, voxelize as vox
from tdvnet.ops.sampling import resize_nearest


class ThreeDVNet(nn.Module):
    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        self.mvsnet = MVSNet(c.feat_dim, c.img_size, c.cost_base_channels,
                             dtype=c.dtype, warp_mode=c.warp_mode,
                             warp_alpha_max=c.warp_alpha_max,
                             conv3d_impl=c.conv3d_impl)
        # PointNet(hidden=4f, out=2f, in=f+3) per reference PL3DVNet.__init__
        self.pointnet = PointNet(4 * c.feat_dim, 2 * c.feat_dim, dtype=c.dtype)
        self.scene_unet = SceneUNet(c.unet_dims, c.unet_groups, c.unet_res,
                                    dtype=c.dtype, impl=c.conv3d_impl)
        self.decoder = HypothesisDecoder(c.decoder_hidden, c.hyp_ksize,
                                         dtype=c.dtype)
        self.refine_quarter = PropagationNet(c.propagation_hidden,
                                             dtype=c.dtype)
        self.refine_half = PropagationNet(c.propagation_hidden, dtype=c.dtype)
        self.refine_full = PropagationNet(c.propagation_hidden, dtype=c.dtype)

    # ---------------------------------------------------------------- 2D stage
    def extract_features(self, images, train: bool = False):
        return self.mvsnet.extract_features(images, train)

    def initial_depth(self, batch: FrameBatch, depth_cfg: DepthConfig,
                      feats_quarter, train: bool = False):
        depth, prob = self.mvsnet.predict_depth(
            feats_quarter, batch.rotmats, batch.tvecs, batch.K, batch.ref_idx,
            batch.src_idx, batch.src_mask, depth_cfg.depth_start,
            depth_cfg.depth_interval, depth_cfg.n_intervals, depth_cfg.size,
            train)
        return depth, prob

    # ---------------------------------------------------------------- 3D stage
    def build_scene_pointcloud(self, depth_pred, feats_quarter,
                               batch: FrameBatch):
        """Back-project all ref depths; variance feature per point
        (ref `construct_feature_rich_pointcloud`, :132-174)."""
        pts = camera.backproject_grid(depth_pred, batch.K[batch.ref_idx],
                                      batch.rotmats[batch.ref_idx],
                                      batch.tvecs[batch.ref_idx],
                                      self.cfg.img_size)          # [R, P, 3]
        feats = costvolume.hypothesis_point_variance(
            jax.lax.stop_gradient(pts), feats_quarter, batch.src_idx,
            batch.src_mask, batch.rotmats, batch.tvecs, batch.K,
            self.cfg.img_size)                                    # [R, P, C]
        return pts, feats

    def scene_dense(self, depth_pred, feats_quarter, batch: FrameBatch,
                    grid_cfg: Optional[GridConfig] = None):
        """Voxelize the scene point cloud and PointNet-encode it into the
        dense grid the U-Net consumes.

        Returns (dense [B, gx, gy, gz, 2f], occ [B, gx, gy, gz, 1],
        origins [B, 3], stats).  Split out of `model_scene` so the eval
        path can run the U-Net spatially sharded (x-blocks + halo
        exchange) while the point stage stays replicated.
        """
        g = grid_cfg or self.cfg.grid
        B = batch.n_scenes
        pts, feats = self.build_scene_pointcloud(depth_pred, feats_quarter,
                                                 batch)
        R, P, _ = pts.shape
        pts_flat = pts.reshape(-1, 3)
        pt_scene = jnp.repeat(batch.ref_scene, P)
        pt_valid = jnp.repeat(batch.ref_mask, P)
        vg = vox.voxelize(jax.lax.stop_gradient(pts_flat), pt_scene, pt_valid,
                          g.edge_len, g.grid_size, g.max_anchors, B)

        centers = jnp.concatenate(
            [vg.anchor_center, jnp.zeros((1, 3), jnp.float32)], axis=0)
        # sorted-order PointNet (round 5): permute points into anchor-sorted
        # order once, then all 4 segment-max pools + 3 pooled-gathers run
        # over nondecreasing ids (see PointNet.indices_are_sorted)
        ordr = vg.order
        x = jnp.concatenate(
            [pts_flat[ordr] - centers[vg.p2a_sorted],
             feats.reshape(R * P, -1)[ordr]], axis=-1)           # [RP, 3+C]
        anchor_feats = self.pointnet(x, vg.p2a_sorted,
                                     vg.point_valid[ordr], g.max_anchors,
                                     indices_are_sorted=True)    # [A, 2f]
        dense, occ = vox.scatter_anchors_to_dense(anchor_feats, vg,
                                                  g.grid_size, B)
        stats = {"n_out_of_grid": vg.n_out_of_grid,
                 "n_overflow": vg.n_overflow,
                 "n_points": jnp.sum(vg.point_valid.astype(jnp.int32))}
        return dense.astype(self.cfg.dtype), occ, vg.origins, stats

    def apply_scene_unet(self, dense, occ):
        """Run the scene U-Net on a pre-built dense grid (sharded eval
        calls this inside shard_map with an axis_name-enabled twin)."""
        return self.scene_unet(dense, occ)

    def model_scene(self, depth_pred, feats_quarter, batch: FrameBatch,
                    grid_cfg: Optional[GridConfig] = None,
                    train: bool = False, space_axis: Optional[str] = None):
        """Voxelize the scene point cloud, PointNet-encode, run the U-Net.

        space_axis: when set (inside shard_map over a mesh with that axis),
        the dense grid's x-extent is split into one block per device, the
        U-Net runs halo-sharded over the axis, and the output scales are
        all-gathered back — numerically identical to the replicated run
        (tests/test_parallel_halo.py), with the U-Net's FLOPs and activation
        memory divided across the axis.

        Returns (scales coarsest-first, origins [B, 3], stats) where stats
        carries the capacity-overflow counters (VERDICT r1 #9: no silent
        caps — the reference never drops geometry, `mv3d/utils.py:38-64`).
        """
        dense, occ, origins, stats = self.scene_dense(
            depth_pred, feats_quarter, batch, grid_cfg)
        if space_axis is None:
            scales = self.scene_unet(dense, occ)
        else:
            n = jax.lax.axis_size(space_axis)
            i = jax.lax.axis_index(space_axis)
            xb = dense.shape[1] // n
            dl = jax.lax.dynamic_slice_in_dim(dense, i * xb, xb, axis=1)
            ol = jax.lax.dynamic_slice_in_dim(occ, i * xb, xb, axis=1)
            scales_l = self.scene_unet(dl, ol, axis_name=space_axis)
            scales = [dict(sc,
                           grid=jax.lax.all_gather(sc["grid"], space_axis,
                                                   axis=1, tiled=True),
                           mask=jax.lax.all_gather(sc["mask"], space_axis,
                                                   axis=1, tiled=True))
                      for sc in scales_l]
        return scales, origins, stats

    def run_pointflow(self, scales, origins, depth_pred, feats_quarter,
                      batch: FrameBatch, offset: float, n: int = 3,
                      grid_cfg: Optional[GridConfig] = None,
                      train: bool = False, patch_variance: bool = False):
        """Score 2n+1 depth-offset hypotheses per pixel; return the expected
        depth correction [R, h, w] (ref `run_pointflow`, :187-242)."""
        g = grid_cfg or self.cfg.grid
        R, h, w = depth_pred.shape
        P = h * w
        H = 2 * n + 1
        B = batch.n_scenes
        n_ref = R // B

        # hypothesis world points (no grad through geometry, ref :191-223)
        grid = camera.build_img_grid(self.cfg.img_size, (h, w))
        K_inv = jnp.linalg.inv(batch.K[batch.ref_idx])
        ray_cam = jnp.einsum("nij,pj->npi", K_inv, grid,
                             precision=jax.lax.Precision.HIGHEST)
        Rr = batch.rotmats[batch.ref_idx]
        ray_world = jnp.einsum("nji,npj->npi", Rr, ray_cam,
                               precision=jax.lax.Precision.HIGHEST)
        center = camera.camera_center(Rr, batch.tvecs[batch.ref_idx])
        ivals = jnp.arange(-n, n + 1, dtype=jnp.float32)
        dh = depth_pred.reshape(R, 1, P) + ivals[None, :, None] * offset
        pts_hyp = center[:, None, None, :] \
            + ray_world[:, None, :, :] * dh[..., None]           # [R, H, P, 3]
        pts_hyp = jax.lax.stop_gradient(pts_hyp)

        # image variance feature per hypothesis point (grads → feats only)
        if patch_variance:
            # fast path: one 4x4-patch gather per (pixel, src) serves the
            # whole hypothesis fan (quality-gated, see
            # costvolume.hypothesis_patch_variance)
            var = costvolume.hypothesis_patch_variance(
                pts_hyp, feats_quarter, batch.src_idx, batch.src_mask,
                batch.rotmats, batch.tvecs, batch.K,
                self.cfg.img_size).reshape(R, H * P, -1)
        else:
            var = costvolume.hypothesis_point_variance(
                pts_hyp.reshape(R, H * P, 3), feats_quarter, batch.src_idx,
                batch.src_mask, batch.rotmats, batch.tvecs, batch.K,
                self.cfg.img_size)                               # [R, HP, C]

        # scene features: group queries per scene (ref slots are contiguous)
        q = pts_hyp.reshape(B, n_ref * H * P, 3)
        scene_feats = sample_scales(scales, q, origins, g.edge_len)
        scene_feats = scene_feats.reshape(R, H, P, -1)

        # concat + transpose in the scene-feature dtype (bf16 at eval): the
        # [R, H, P, 352] tensor is materialized twice here and the decoder
        # casts to the compute dtype anyway
        feats = jnp.concatenate(
            [scene_feats, var.reshape(R, H, P, -1).astype(scene_feats.dtype)],
            axis=-1)
        feats = feats.transpose(0, 2, 1, 3).reshape(R * P, H, -1)
        probs = self.decoder(feats, train)                        # [RP, H]
        offset_vals = ivals * offset
        pred = jnp.sum(probs * offset_vals[None, :], axis=-1)
        return pred.reshape(R, h, w)

    def run_pointflow_multi(self, scales, origins, depth_pred, feats_quarter,
                            batch: FrameBatch, offsets, n: int = 3,
                            grid_cfg: Optional[GridConfig] = None,
                            train: bool = False,
                            patch_variance: bool = False):
        """All of one refinement iteration's offset passes in a single
        graph (ref inner loop `eval-3dvnet.py:83-88`): depth carries
        between the statically-unrolled passes.  One device dispatch per
        chunk instead of one per (chunk, offset) — on a remote-tunnel TPU
        the roundtrip latency is the difference."""
        for off in offsets:
            depth_pred = depth_pred + self.run_pointflow(
                scales, origins, depth_pred, feats_quarter, batch,
                float(off), n, grid_cfg, train,
                patch_variance=patch_variance)
        return depth_pred

    def upsample(self, depth_pred, feats_half, feats_quarter, images,
                 ref_idx, train: bool = False):
        """3-stage guided upsampling: coarse → 1/4 → 1/2 → full."""
        depth_pred = resize_nearest(depth_pred, feats_quarter.shape[1:3])
        depth_pred = self.refine_quarter(feats_quarter[ref_idx], depth_pred,
                                         train)
        depth_pred = resize_nearest(depth_pred, feats_half.shape[1:3])
        depth_pred = self.refine_half(feats_half[ref_idx], depth_pred, train)
        depth_pred = resize_nearest(depth_pred, images.shape[1:3])
        depth_pred = self.refine_full(images[ref_idx], depth_pred, train)
        return depth_pred

    def infer_depth(self, batch: FrameBatch,
                    offsets_list: Sequence[Sequence[float]],
                    depth_cfg: Optional[DepthConfig] = None,
                    grid_cfg: Optional[GridConfig] = None) -> jnp.ndarray:
        """Monolithic whole-batch inference (no losses): the graph of
        `mv3d/eval-3dvnet.py:26-129` without chunking — used for training-
        scale batches and the benchmark; `tdvnet.eval.whole_scene` streams
        large scenes through the same submodules chunk-wise."""
        c = self.cfg
        dc = depth_cfg or c.depth_test
        feats_half, feats_quarter, _ = self.extract_features(batch.images,
                                                             False)
        depth_pred, _ = self.initial_depth(batch, dc, feats_quarter, False)
        for offsets in offsets_list:
            scales, origins, _ = self.model_scene(depth_pred, feats_quarter,
                                                  batch, grid_cfg, False)
            for off in offsets:
                depth_pred = depth_pred + self.run_pointflow(
                    scales, origins, depth_pred, feats_quarter, batch, off, 3,
                    grid_cfg, False)
        return self.upsample(depth_pred, feats_half, feats_quarter,
                             batch.images, batch.ref_idx, False)

    # ------------------------------------------------------------- full model
    def __call__(self, batch: FrameBatch, offsets: Sequence[float],
                 n_iters: int, lam: float = 1.0, train: bool = False,
                 depth_cfg: Optional[DepthConfig] = None,
                 grid_cfg: Optional[GridConfig] = None,
                 with_metrics: bool = True,
                 backbone_train: Optional[bool] = None,
                 space_axis: Optional[str] = None) -> Dict:
        """backbone_train=False keeps backbone BatchNorm in inference mode
        during training — the reference's non-finetune regime
        (`mv3d/lightningmodel.py:271-272`, `mv3d/utils.py:17-21`)."""
        c = self.cfg
        dc = depth_cfg or (c.depth_train if train else c.depth_test)
        w_ref = batch.ref_mask.astype(jnp.float32)

        bb_train = train if backbone_train is None else backbone_train
        feats_half, feats_quarter, feats_eighth = self.extract_features(
            batch.images, bb_train)
        depth_pred, _ = self.initial_depth(batch, dc, feats_quarter, train)

        out: Dict = {"ref": []}
        gt = batch.depth_gt

        def supervise(pred, key=None):
            gt_s = resize_nearest(gt, pred.shape[-2:])
            loss = metrics2d.mae_loss(pred, gt_s, dc.depth_interval, w_ref)
            mets = metrics2d.calc_2d_depth_metrics(pred, gt_s, w_ref) \
                if with_metrics else {}
            mets["loss_2d"] = loss
            return loss, mets

        loss, mets = supervise(depth_pred)
        out["initial"] = mets
        out["loss_2d"] = loss
        total = loss

        for _ in range(n_iters):
            scales, origins, scene_stats = self.model_scene(
                depth_pred, feats_quarter, batch, grid_cfg, train,
                space_axis=space_axis)
            out["scene_stats"] = scene_stats
            for off in offsets:
                delta = self.run_pointflow(scales, origins, depth_pred,
                                           feats_quarter, batch, off, 3,
                                           grid_cfg, train)
                depth_pred = depth_pred + delta
                l_off, mets = supervise(depth_pred)
                total = total + lam * l_off
                out["ref"].append(mets)

        # upsampling: coarse → 1/4 → 1/2 → full (ref :83-119)
        ref_i = batch.ref_idx
        depth_pred = resize_nearest(depth_pred, feats_quarter.shape[1:3])
        depth_pred = self.refine_quarter(feats_quarter[ref_i], depth_pred,
                                         train)
        l_q, out["quarter"] = supervise(depth_pred)
        total = total + l_q

        depth_pred = resize_nearest(depth_pred, feats_half.shape[1:3])
        depth_pred = self.refine_half(feats_half[ref_i], depth_pred, train)
        l_h, out["half"] = supervise(depth_pred)
        total = total + l_h

        depth_pred = resize_nearest(depth_pred, batch.images.shape[1:3])
        depth_pred = self.refine_full(batch.images[ref_i], depth_pred, train)
        l_f, out["final"] = supervise(depth_pred)
        total = total + l_f

        out["loss"] = total
        out["depth_pred"] = depth_pred
        return out
