"""Fused whole-scene inference: the entire eval graph in two dispatches.

Round-2 profiling showed the chunked driver (`tdvnet.eval.whole_scene`)
spends ~60% of scene wall time on host work and per-chunk tunnel dispatch
(~37 ms/roundtrip x ~20 dispatches + dozens of small jnp host ops), not on
compute.  This driver moves every chunk loop on-device as a `lax.scan`
(VERDICT r2 "Next round" #1b):

  dispatch 1  _prep    normalize u8 -> features (scanned) -> initial depth
                       (scanned over ref chunks) -> scene bbox
  host        fetch bbox (6 floats), choose the static grid size
  dispatch 2  _refine  n_iters x (scene volume + pointflow scan) ->
                       upsample scan -> full-res depth

Chunk semantics are identical to the reference streaming loop
(`mv3d/eval-3dvnet.py:26-129`): refs are independent inside a refinement
iteration, the scene volume is global per iteration.  Chunk-edge masks are
computed on device from the scalar ref count, so one compiled graph serves
every scene length within a ref bucket (multiples of `chunk`).

Transfers use the jit-argument path (the axon tunnel moves jit args at
~20-35 MB/s vs ~1-4 MB/s for device_put) and the result can be fetched as
uint16 millimeters (bounded +-0.5 mm quantization, far below the 1 cm
fusion z-threshold / 5 cm F-score tau — `mv3d/eval/config.py:26-29`) to
halve the download.
"""
from __future__ import annotations

import functools
import os
import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tdvnet.config import Config, GridConfig
from tdvnet.data.batch import FrameBatch
from tdvnet.models.threedvnet import ThreeDVNet


def _flops_of(lowered) -> float:
    ca = lowered.compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", 0.0) or 0.0)


def _scan_chunks(body, n: int, unroll: bool):
    """`lax.scan` of `body(None, i) -> (None, y)` over i in [0, n), or the
    unrolled equivalent (for FLOP counting — see `_count`)."""
    if unroll:
        return jnp.stack([body(None, jnp.int32(i))[1] for i in range(n)])
    _, ys = jax.lax.scan(body, None, jnp.arange(n, dtype=jnp.int32))
    return ys


class FusedSceneInference:
    """Whole-scene depth prediction in two device dispatches.

    Single-chip fast path.  For mesh-sharded scene volumes (scenes larger
    than one chip's HBM) use `SceneInference(mesh=...)`, which keeps the
    chunk loops on host but runs the U-Net spatially sharded.
    """

    # validated fast-path offsets (VERDICT r3 #4 — op-mix redesign past
    # the parity-graph gather ceiling): iteration 2 runs ONE fine pass
    # instead of three — by then depth is within the fine capture range,
    # so the two coarse re-gathers mostly re-confirm it.  Combined with
    # int8 scene tables (see `fast_path`); acceptance = unseen-scene
    # metrics within noise of the parity path (BASELINE.md fast-path
    # table).
    FAST_OFFSETS = ((0.05, 0.05, 0.025), (0.025,))

    def __init__(self, model: ThreeDVNet, variables, cfg: Config,
                 offsets_list: Sequence[Sequence[float]] = ((0.05, 0.05, 0.025),
                                                           (0.05, 0.05, 0.025)),
                 count_flops: bool = False, fetch_mm: bool = True,
                 fast_path: Optional[bool] = None):
        self.model = model
        self.variables = variables
        self.cfg = cfg
        self.fast_path = (cfg.eval.fast_path if fast_path is None
                          else fast_path)
        if self.fast_path and tuple(map(tuple, offsets_list)) == \
                ((0.05, 0.05, 0.025), (0.05, 0.05, 0.025)):
            offsets_list = self.FAST_OFFSETS
        self.offsets_list = tuple(tuple(float(o) for o in off)
                                  for off in offsets_list)
        self.fetch_mm = fetch_mm
        self.count_flops = count_flops
        self.flops = 0.0           # accumulated executed FLOPs (count mode)
        self._flop_cache: Dict = {}
        e = cfg.eval
        self.chunk = e.fused_chunk
        self.grid_cfg = GridConfig(
            edge_len=cfg.model.grid.edge_len, grid_size=e.eval_grid_size,
            max_anchors=e.eval_max_anchors)
        # fast-path rank-r spectral compression of the sampling interface
        # (hypothesis.decoder_scene_projection): host-side SVD of the
        # decoder's first-conv scene weights, applied to the tables inside
        # _refine_impl; the projected decoder params ride along as a jit
        # argument (embedding them as closed-over constants would blow up
        # the tunnel compile request)
        self.fast_rank = int(getattr(e, "fast_rank", 0)) \
            if self.fast_path else 0
        self.fast_patch = bool(getattr(e, "fast_patch", False)) \
            and self.fast_path
        self._proj_V = None
        self._vars_fast = None
        if self.fast_rank:
            from tdvnet.models.hypothesis import decoder_scene_projection

            dec = variables["params"]["decoder"]
            n_in = np.asarray(dec["Conv_0"]["kernel"]).shape[1]
            n_scene = n_in - cfg.model.feat_dim
            if 0 < self.fast_rank < n_scene:
                V, new_dec, tail = decoder_scene_projection(
                    dec, cfg.model.feat_dim, self.fast_rank)
                params_fast = dict(variables["params"])
                params_fast["decoder"] = new_dec
                self._vars_fast = dict(variables, params=params_fast)
                self._proj_V = jnp.asarray(V)
                print(f"fast-rank {self.fast_rank}/{n_scene}: discarded "
                      f"interface spectral energy {tail:.4f}")
            else:
                self.fast_rank = 0
        self._prep = jax.jit(self._prep_impl,
                             static_argnames=("u8", "n_chunks", "unroll"))
        self._refine = jax.jit(self._refine_impl,
                               static_argnames=("grid_cfg", "n_chunks",
                                                "unroll"))
        self.last_scene_stats: Dict = {}

    # ------------------------------------------------------------- helpers
    def _count(self, jitfn, kwargs, statics: Tuple):
        """Accumulate graph FLOPs once per static signature.

        XLA `cost_analysis` counts a `lax.scan` body ONCE regardless of
        trip count, so the counting pass lowers an UNROLLED twin of the
        dispatched graph (same math, python loops) — compile-only, never
        executed."""
        if not self.count_flops:
            return
        key = (id(jitfn), statics,
               tuple((k, v.shape, str(v.dtype)) for k, v in
                     sorted(kwargs.items()) if hasattr(v, "shape")))
        fl = self._flop_cache.get(key)
        if fl is None:
            fl = _flops_of(jitfn.lower(**dict(kwargs, unroll=True)))
            self._flop_cache[key] = fl
        self.flops += fl

    def reset_flops(self):
        self.flops = 0.0

    def flops_executed(self) -> float:
        return self.flops

    def _chunk_tables(self):
        """Static per-chunk index tables (local to a chunk window)."""
        CH, k = self.chunk, self.cfg.eval.n_src_on_either_side
        ref_idx = jnp.arange(CH, dtype=jnp.int32) + k
        off = jnp.arange(-k, k + 1, dtype=jnp.int32)
        src_idx = jnp.clip(ref_idx[:, None] + off[None], 0, CH + 2 * k - 1)
        return ref_idx, src_idx

    def _chunk_masks(self, r0, n_refs, n_imgs_valid):
        """Ref/src validity for the chunk starting at global ref r0."""
        CH, k = self.chunk, self.cfg.eval.n_src_on_either_side
        rg = r0 + jnp.arange(CH, dtype=jnp.int32)
        ref_mask = rg < n_refs
        off = jnp.arange(-k, k + 1, dtype=jnp.int32)
        src_global = rg[:, None] + k + off[None]          # global img idx
        src_mask = ref_mask[:, None] & (src_global >= 0) \
            & (src_global < n_imgs_valid)
        return ref_mask, src_mask

    def _chunk_frame_batch(self, cams, r0, n_refs, n_imgs_valid):
        """FrameBatch for ref slots [r0, r0+chunk) built inside the jit."""
        CH, k = self.chunk, self.cfg.eval.n_src_on_either_side
        W = CH + 2 * k
        rot, tv, Ks = cams
        ref_idx, src_idx = self._chunk_tables()
        ref_mask, src_mask = self._chunk_masks(r0, n_refs, n_imgs_valid)
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, r0, W, axis=0)
        return FrameBatch(
            images=jnp.zeros((W, 1, 1, 3), jnp.float32),
            rotmats=sl(rot), tvecs=sl(tv), K=sl(Ks), depth_gt=None,
            ref_idx=ref_idx, src_idx=src_idx, src_mask=src_mask,
            ref_mask=ref_mask, img_mask=jnp.ones((W,), bool),
            img_scene=jnp.zeros((W,), jnp.int32),
            ref_scene=jnp.zeros((CH,), jnp.int32), n_scenes=1)

    def _scene_frame_batch(self, cams, Rb, n_refs, n_imgs_valid):
        """Whole-scene FrameBatch (Rb ref slots)."""
        k = self.cfg.eval.n_src_on_either_side
        rot, tv, Ks = cams
        Nb = Rb + 2 * k
        ref_idx = jnp.arange(Rb, dtype=jnp.int32) + k
        off = jnp.arange(-k, k + 1, dtype=jnp.int32)
        src_idx = jnp.clip(ref_idx[:, None] + off[None], 0, Nb - 1)
        rg = jnp.arange(Rb, dtype=jnp.int32)
        ref_mask = rg < n_refs
        src_global = rg[:, None] + k + off[None]
        src_mask = ref_mask[:, None] & (src_global >= 0) \
            & (src_global < n_imgs_valid)
        return FrameBatch(
            images=jnp.zeros((Nb, 1, 1, 3), jnp.float32),
            rotmats=rot, tvecs=tv, K=Ks, depth_gt=None,
            ref_idx=ref_idx, src_idx=src_idx, src_mask=src_mask,
            ref_mask=ref_mask, img_mask=jnp.ones((Nb,), bool),
            img_scene=jnp.zeros((Nb,), jnp.int32),
            ref_scene=jnp.zeros((Rb,), jnp.int32), n_scenes=1)

    # -------------------------------------------------------- dispatch 1
    def _prep_impl(self, variables, images, rgb_scale, rgb_mean, rgb_std,
                   rot, tv, Ks, n_refs, u8: bool, n_chunks: int,
                   unroll: bool = False):
        """u8 stack -> features -> initial depth -> scene bbox."""
        cfg = self.cfg
        k = cfg.eval.n_src_on_either_side
        CH = self.chunk
        dc = cfg.model.depth_test
        h, w = dc.size
        Nb = images.shape[0]

        if u8:
            imgs = (images.astype(jnp.float32) / rgb_scale
                    - rgb_mean) / rgb_std
        else:
            imgs = images

        # features, scanned in image chunks of FC (memory, not dispatch)
        FC = 32
        pad = (-Nb) % FC
        imgs_p = jnp.concatenate(
            [imgs, jnp.repeat(imgs[-1:], pad, axis=0)], 0) if pad else imgs

        def feat_of(chunk_imgs):
            return self.model.apply(variables, chunk_imgs, False,
                                    method="extract_features")[:2]
        imgs_c = imgs_p.reshape(-1, FC, *imgs_p.shape[1:])
        if unroll:
            fhs, fqs = zip(*[feat_of(imgs_c[i])
                             for i in range(imgs_c.shape[0])])
            fh, fq = jnp.stack(fhs), jnp.stack(fqs)
        else:
            fh, fq = jax.lax.map(feat_of, imgs_c)
        feats_half = fh.reshape(-1, *fh.shape[2:])[:Nb]
        feats_quarter = fq.reshape(-1, *fq.shape[2:])[:Nb]

        # initial depth, scanned over ref chunks
        cams = (rot, tv, Ks)
        n_imgs_valid = n_refs + 2 * k

        def init_body(_, i):
            r0 = i * CH
            cb = self._chunk_frame_batch(cams, r0, n_refs, n_imgs_valid)
            q = jax.lax.dynamic_slice_in_dim(feats_quarter, r0, CH + 2 * k,
                                             axis=0)
            d, _ = self.model.apply(variables, cb, dc, q, False,
                                    method="initial_depth")
            return None, d
        d_chunks = _scan_chunks(init_body, n_chunks, unroll)
        depth_all = d_chunks.reshape(n_chunks * CH, h, w)

        # scene bbox from back-projected depths (valid refs only)
        from tdvnet.ops import camera as cam_ops

        Rb = depth_all.shape[0]
        ridx = jnp.arange(Rb, dtype=jnp.int32) + k
        pts = cam_ops.backproject_grid(depth_all, Ks[ridx], rot[ridx],
                                       tv[ridx], cfg.model.img_size)
        valid = ((jnp.arange(Rb) < n_refs)[:, None]
                 & (depth_all.reshape(Rb, -1) > 0))[..., None]
        big = jnp.float32(1e9)
        lo = jnp.min(jnp.where(valid, pts, big), axis=(0, 1))
        hi = jnp.max(jnp.where(valid, pts, -big), axis=(0, 1))
        bbox = jnp.stack([lo, hi])
        return imgs, feats_half, feats_quarter, depth_all, bbox

    # -------------------------------------------------------- dispatch 2
    def _refine_impl(self, variables, imgs, feats_half, feats_quarter,
                     rot, tv, Ks, depth_all, n_refs,
                     grid_cfg: GridConfig, n_chunks: int,
                     unroll: bool = False, proj_V=None, vars_fast=None):
        from tdvnet.models.hypothesis import (_COMBINE_BUDGET_BYTES,
                                              combine_scales, pack_scales)

        cfg = self.cfg
        k = cfg.eval.n_src_on_either_side
        CH = self.chunk
        Rb = depth_all.shape[0]
        cams = (rot, tv, Ks)
        n_imgs_valid = n_refs + 2 * k
        sb = self._scene_frame_batch(cams, Rb, n_refs, n_imgs_valid)
        stats_acc = {}

        for offsets in self.offsets_list:
            d_pad = jnp.where(sb.ref_mask[:, None, None], depth_all, 0.0)
            scales, origins, sstats = self.model.apply(
                variables, d_pad, feats_quarter, sb, grid_cfg, False,
                method="model_scene")
            for sk, sv in sstats.items():
                stats_acc[sk] = stats_acc.get(sk, 0) + sv
            # merge nested scale lattices into one fine grid (exact):
            # 1 wide-row gather per query instead of 3 (+3 epilogues)
            scales = combine_scales(scales)
            pf_vars = variables
            if proj_V is not None and len(scales) == 1 \
                    and scales[0]["grid"].shape[-1] == proj_V.shape[0]:
                # rank-r interface projection (see __init__): tables carry
                # V^T s, the decoder's modified first conv absorbs V
                g = scales[0]["grid"]
                gp = jnp.einsum("bxyzc,cr->bxyzr", g,
                                proj_V.astype(g.dtype),
                                preferred_element_type=g.dtype)
                scales = [dict(scales[0], grid=gp)]
                pf_vars = vars_fast
            if self.fast_path:
                # int8 rows halve the bandwidth-bound gather bytes
                # (docs/ROOFLINE.md §3); interpolation is linear per
                # channel so one post-sum dequant multiply is exact
                from tdvnet.ops.sampling import quantize_per_channel_int8

                qs = [jax.vmap(quantize_per_channel_int8)(sc["grid"])
                      for sc in scales]
                octs = pack_scales([qg for qg, _ in qs],
                                   budget=_COMBINE_BUDGET_BYTES)
                scales = [dict(sc, octs=o, oct_scale=sc_q,
                               dims=tuple(sc["grid"].shape[1:4]))
                          for sc, o, (_, sc_q) in zip(scales, octs, qs)]
            else:
                octs = pack_scales([sc["grid"] for sc in scales],
                                   budget=_COMBINE_BUDGET_BYTES)
                scales = [dict(sc, octs=o,
                               dims=tuple(sc["grid"].shape[1:4]))
                          for sc, o in zip(scales, octs)]

            def pf_body(_, i, scales=scales, origins=origins,
                        offsets=offsets, pf_vars=pf_vars):
                r0 = i * CH
                cb = self._chunk_frame_batch(cams, r0, n_refs, n_imgs_valid)
                q = jax.lax.dynamic_slice_in_dim(feats_quarter, r0,
                                                 CH + 2 * k, axis=0)
                dch = jax.lax.dynamic_slice_in_dim(depth_all, r0, CH, axis=0)
                dnew = self.model.apply(pf_vars, scales, origins, dch, q,
                                        cb, offsets, 3, grid_cfg, False,
                                        self.fast_patch,
                                        method="run_pointflow_multi")
                return None, dnew
            d_chunks = _scan_chunks(pf_body, n_chunks, unroll)
            depth_all = d_chunks.reshape(Rb, *depth_all.shape[1:])

        # upsample, scanned (ref r uses image r + k; windows contiguous)
        def up_body(_, i):
            r0 = i * CH
            dch = jax.lax.dynamic_slice_in_dim(depth_all, r0, CH, axis=0)
            im = jax.lax.dynamic_slice_in_dim(imgs, r0 + k, CH, axis=0)
            fh = jax.lax.dynamic_slice_in_dim(feats_half, r0 + k, CH, axis=0)
            fq = jax.lax.dynamic_slice_in_dim(feats_quarter, r0 + k, CH,
                                              axis=0)
            ridx = jnp.arange(CH, dtype=jnp.int32)
            d = self.model.apply(variables, dch, fh, fq, im, ridx, False,
                                 method="upsample")
            return None, d
        out_chunks = _scan_chunks(up_body, n_chunks, unroll)
        out = out_chunks.reshape(Rb, *out_chunks.shape[2:])
        if self.fetch_mm:
            out = jnp.round(jnp.clip(out, 0.0, 65.535) * 1000.0) \
                .astype(jnp.uint16)
        return out, stats_acc

    # ------------------------------------------------------------- driver
    def _grid_from_extent(self, extent: np.ndarray) -> GridConfig:
        """Static grid dims for this scene (same policy as
        `SceneInference._choose_grid`, from a device-computed bbox)."""
        e = self.cfg.eval
        gc = self.grid_cfg
        if not e.auto_grid or not np.isfinite(extent).all() \
                or (extent <= 0).any():
            return gc
        b = e.grid_bucket
        need = np.ceil(extent / gc.edge_len).astype(int) + 2
        buckets = np.array([b, b, b])
        dims = -(-need // buckets) * buckets
        cap = np.array(gc.grid_size) // buckets * buckets
        capped = np.minimum(dims, np.maximum(cap, buckets))
        if (dims > np.array(gc.grid_size)).any():
            import warnings

            warnings.warn(
                f"scene bbox needs grid {tuple(dims)} voxels but "
                f"eval_grid_size caps it at {gc.grid_size}; geometry "
                f"outside will be dropped (see scene_stats counters)")
        return GridConfig(edge_len=gc.edge_len,
                          grid_size=tuple(int(x) for x in capped),
                          max_anchors=gc.max_anchors)

    def predict_scene(self, views: Dict,
                      timings: Optional[Dict] = None) -> np.ndarray:
        """views: whole-scene dict (numpy) from `Dataset.load_views`.

        Returns [R, H, W] float32 depth at image resolution.
        """
        def mark(name, t0):
            now = time.perf_counter()
            if timings is not None:
                timings[name] = timings.get(name, 0.0) + now - t0
            return now

        cfg, e = self.cfg, self.cfg.eval
        k = e.n_src_on_either_side
        n_imgs = (views["images_u8"] if "images_u8" in views
                  else views["images"]).shape[0]
        R = n_imgs - 2 * k
        assert R >= 1, "scene too short"
        CH = self.chunk
        n_chunks = -(-R // CH)
        Rb = n_chunks * CH
        Nb = Rb + 2 * k

        u8 = "images_u8" in views
        images = views["images_u8"] if u8 else views["images"]
        pad = Nb - n_imgs

        def pad_imgs(a):
            a = np.asarray(a)
            if pad:
                a = np.concatenate([a, np.repeat(a[-1:], pad, axis=0)], 0)
            return a

        images = pad_imgs(images)
        rot = pad_imgs(views["rotmats"]).astype(np.float32)
        tv = pad_imgs(views["tvecs"]).astype(np.float32)
        Ks = pad_imgs(views["K"]).astype(np.float32)
        if u8:
            rgb_scale = np.float32(views.get("rgb_scale", 255.0))
            rgb_mean = np.asarray(views["rgb_mean"], np.float32)
            rgb_std = np.asarray(views["rgb_std"], np.float32)
        else:
            rgb_scale = np.float32(1.0)
            rgb_mean = np.zeros((3,), np.float32)
            rgb_std = np.ones((3,), np.float32)

        t0 = time.perf_counter()
        prep_kwargs = dict(variables=self.variables, images=images,
                           rgb_scale=rgb_scale, rgb_mean=rgb_mean,
                           rgb_std=rgb_std, rot=rot, tv=tv, Ks=Ks,
                           n_refs=np.int32(R), u8=u8, n_chunks=n_chunks)
        imgs_d, fh, fq, depth_all, bbox = self._prep(**prep_kwargs)
        self._count(self._prep, prep_kwargs, (u8, n_chunks))
        bbox_np = np.asarray(bbox)                    # small fetch (sync)
        t0 = mark("prep", t0)

        gc = self._grid_from_extent(bbox_np[1] - bbox_np[0])
        ref_kwargs = dict(variables=self.variables, imgs=imgs_d,
                          feats_half=fh, feats_quarter=fq, rot=rot, tv=tv,
                          Ks=Ks, depth_all=depth_all, n_refs=np.int32(R),
                          grid_cfg=gc, n_chunks=n_chunks,
                          proj_V=self._proj_V, vars_fast=self._vars_fast)
        out, stats = self._refine(**ref_kwargs)
        self._count(self._refine, ref_kwargs, (gc, n_chunks))
        out_np = np.asarray(out)[:R]
        stats_np = {sk: int(sv) for sk, sv in stats.items()}
        mark("refine", t0)

        self.last_scene_stats = stats_np
        dropped = stats_np.get("n_out_of_grid", 0) \
            + stats_np.get("n_overflow", 0)
        if dropped:
            import warnings

            warnings.warn(
                f"scene volume dropped {dropped} points "
                f"(out_of_grid={stats_np.get('n_out_of_grid', 0)}, "
                f"anchor_overflow={stats_np.get('n_overflow', 0)} of "
                f"{stats_np.get('n_points', 0)} valid) — enlarge "
                f"eval_grid_size / eval_max_anchors")

        if self.fetch_mm:
            return out_np.astype(np.float32) * 1e-3
        return out_np

    # ----------------------------------------------------- pipelined driver
    def _dispatch_prep(self, views: Dict):
        """Build padded host arrays and issue the prep dispatch (async)."""
        e = self.cfg.eval
        k = e.n_src_on_either_side
        u8 = "images_u8" in views
        images = views["images_u8"] if u8 else views["images"]
        n_imgs = images.shape[0]
        R = n_imgs - 2 * k
        assert R >= 1, "scene too short"
        n_chunks = -(-R // self.chunk)
        Nb = n_chunks * self.chunk + 2 * k
        pad = Nb - n_imgs

        def pad_imgs(a):
            a = np.asarray(a)
            if pad:
                a = np.concatenate([a, np.repeat(a[-1:], pad, axis=0)], 0)
            return a

        if u8:
            rgb = (np.float32(views.get("rgb_scale", 255.0)),
                   np.asarray(views["rgb_mean"], np.float32),
                   np.asarray(views["rgb_std"], np.float32))
        else:
            rgb = (np.float32(1.0), np.zeros((3,), np.float32),
                   np.ones((3,), np.float32))
        cams = (pad_imgs(views["rotmats"]).astype(np.float32),
                pad_imgs(views["tvecs"]).astype(np.float32),
                pad_imgs(views["K"]).astype(np.float32))
        kwargs = dict(variables=self.variables, images=pad_imgs(images),
                      rgb_scale=rgb[0], rgb_mean=rgb[1], rgb_std=rgb[2],
                      rot=cams[0], tv=cams[1], Ks=cams[2],
                      n_refs=np.int32(R), u8=u8, n_chunks=n_chunks)
        prep_out = self._prep(**kwargs)
        self._count(self._prep, kwargs, (u8, n_chunks))
        # start the bbox D2H transfer as soon as the value exists on
        # device: turns the later blocking np.asarray from a
        # request+response tunnel roundtrip into a local wait (the bytes
        # are already streaming) — part of the VERDICT r4 #8 bubble
        try:
            prep_out[4].copy_to_host_async()
        except (AttributeError, RuntimeError):
            pass
        return {"out": prep_out, "cams": cams, "R": R, "n_chunks": n_chunks}

    def _dispatch_refine(self, st):
        """Fetch the scene's bbox (sync), then issue refine (async)."""
        imgs_d, fh, fq, depth_all, bbox = st["out"]
        bbox_np = np.asarray(bbox)
        gc = self._grid_from_extent(bbox_np[1] - bbox_np[0])
        kwargs = dict(variables=self.variables, imgs=imgs_d, feats_half=fh,
                      feats_quarter=fq, rot=st["cams"][0], tv=st["cams"][1],
                      Ks=st["cams"][2], depth_all=depth_all,
                      n_refs=np.int32(st["R"]), grid_cfg=gc,
                      n_chunks=st["n_chunks"],
                      proj_V=self._proj_V, vars_fast=self._vars_fast)
        out, stats = self._refine(**kwargs)
        self._count(self._refine, kwargs, (gc, st["n_chunks"]))
        # NOTE (round 5): pre-staging the result with copy_to_host_async
        # here measured WORSE on the axon tunnel (yield_wait 618 ms ->
        # 1418 ms — the async copy races the fetch thread's asarray into
        # a second transfer); the bbox async copy in _dispatch_prep is
        # kept (6 floats, no concurrent fetch).  The unhidden result
        # download (~0.45-0.6 s/scene, 8 MB u16) remains the dominant
        # non-compute wall — see docs/ROOFLINE.md §5.5.
        st["result"] = (out, stats)

    def _fetch(self, st):
        out, stats = st["result"]
        out_np = np.asarray(out)[:st["R"]]
        self.last_scene_stats = {sk: int(sv) for sk, sv in stats.items()}
        if self.fetch_mm:
            return out_np.astype(np.float32) * 1e-3
        return out_np

    def predict_scenes(self, scene_iter):
        """Pipelined whole-scene inference over an iterable of view dicts.

        Yields [R, H, W] float32 per scene.  Scene i+1's image upload and
        prep dispatch are issued while scene i's refine runs, and scene
        i's result is fetched while scene i+1 computes — in steady state
        the tunnel transfers hide under device compute, so throughput
        approaches pure compute time (the reference's operating point is
        a long stream of scenes, `mv3d/eval/main.py:43`).
        """
        import concurrent.futures as cf

        timeline = os.environ.get("TDVNET_EVAL_TIMELINE", "") not in ("", "0")
        self.timeline = [] if timeline else None

        it = iter(scene_iter)
        prev = None
        fetch_pool = cf.ThreadPoolExecutor(1)
        fut = None
        try:
            for views in it:
                t0 = time.perf_counter()
                st = self._dispatch_prep(views)       # uploads overlap
                t1 = time.perf_counter()
                if prev is not None:
                    # result download on a worker thread: the main thread
                    # proceeds straight to the bbox fetch + refine dispatch
                    # for THIS scene, so on a full-duplex tunnel the 8 MB
                    # download streams while the next dispatch goes up
                    fut = fetch_pool.submit(self._fetch, prev)
                self._dispatch_refine(st)
                t2 = time.perf_counter()
                if fut is not None:
                    yield fut.result()
                    fut = None
                t3 = time.perf_counter()
                if timeline:
                    # prep_dispatch: host pad/upload/enqueue of this scene;
                    # bbox_wait+refine_dispatch: blocks on the DEVICE
                    # finishing the previous refine + this prep (steady-
                    # state device wall lives here); yield_wait: residual
                    # result-download not hidden by the refine dispatch
                    self.timeline.append({
                        "prep_dispatch_s": t1 - t0,
                        "bbox_refine_dispatch_s": t2 - t1,
                        "yield_wait_s": t3 - t2})
                prev = st
            if prev is not None:
                yield self._fetch(prev)
        finally:
            fetch_pool.shutdown(wait=False)


class FusedSceneInferenceDP:
    """DP-over-scenes fused whole-scene eval: one scene per device.

    The realistic multi-chip eval win (VERDICT r3 #6): the reference is
    single-GPU (`mv3d/config.py:3-5`), so its multi-device story is "run
    more processes"; here a group of S = mesh-size scenes runs as ONE
    SPMD program — every per-scene array carries a leading scene axis
    sharded over the mesh, computation is scene-independent (no
    collectives), and XLA partitions each scene onto its device.  Keeps
    the two-dispatch structure of `FusedSceneInference` (prep → bbox
    fetch → refine), with one static grid per GROUP (the max bucketed
    extent over the group's scenes — same compiled program on every
    device).

    For scene volumes bigger than one chip's HBM use
    `SceneInference(mesh=...)` (halo-sharded U-Net) instead: DP-fused
    trades per-scene sharding for zero cross-device traffic.
    """

    def __init__(self, model: ThreeDVNet, variables, cfg: Config, mesh,
                 axis: str = "data",
                 offsets_list: Sequence[Sequence[float]] = ((0.05, 0.05, 0.025),
                                                           (0.05, 0.05, 0.025)),
                 fetch_mm: bool = True):
        from jax.sharding import NamedSharding, PartitionSpec

        self.inner = FusedSceneInference(model, variables, cfg,
                                         offsets_list=offsets_list,
                                         fetch_mm=fetch_mm)
        self.mesh = mesh
        self.axis = axis
        self.n_dev = int(np.prod(mesh.devices.shape))
        self.fetch_mm = fetch_mm
        self._scene_sh = NamedSharding(mesh, PartitionSpec(axis))
        self._repl_sh = NamedSharding(mesh, PartitionSpec())

        inner = self.inner

        def prep_dp(variables, images, rgb_scale, rgb_mean, rgb_std,
                    rot, tv, Ks, n_refs, u8: bool, n_chunks: int):
            f = functools.partial(inner._prep_impl, u8=u8,
                                  n_chunks=n_chunks)
            return jax.vmap(
                lambda im, r, t, K, nr: f(variables, im, rgb_scale,
                                          rgb_mean, rgb_std, r, t, K, nr)
            )(images, rot, tv, Ks, n_refs)

        def refine_dp(variables, imgs, feats_half, feats_quarter,
                      rot, tv, Ks, depth_all, n_refs,
                      grid_cfg: GridConfig, n_chunks: int):
            f = functools.partial(inner._refine_impl, grid_cfg=grid_cfg,
                                  n_chunks=n_chunks)
            return jax.vmap(
                lambda im, fh, fq, r, t, K, d, nr: f(
                    variables, im, fh, fq, r, t, K, d, nr)
            )(imgs, feats_half, feats_quarter, rot, tv, Ks, depth_all,
              n_refs)

        self._prep_dp = jax.jit(prep_dp,
                                static_argnames=("u8", "n_chunks"))
        self._refine_dp = jax.jit(refine_dp,
                                  static_argnames=("grid_cfg", "n_chunks"))
        self.last_scene_stats: Dict = {}

    def _pad_group(self, group: List[Dict]):
        """Pad every scene in the group to a common ref-bucket and stack
        with a leading scene axis."""
        e = self.inner.cfg.eval
        k = e.n_src_on_either_side
        CH = self.inner.chunk
        u8 = "images_u8" in group[0]
        key = "images_u8" if u8 else "images"
        Rs = [v[key].shape[0] - 2 * k for v in group]
        n_chunks = max(-(-r // CH) for r in Rs)
        Nb = n_chunks * CH + 2 * k

        def pad_to(a, n):
            a = np.asarray(a)
            if a.shape[0] < n:
                a = np.concatenate(
                    [a, np.repeat(a[-1:], n - a.shape[0], axis=0)], 0)
            return a

        images = np.stack([pad_to(v[key], Nb) for v in group])
        rot = np.stack([pad_to(v["rotmats"], Nb) for v in group]) \
            .astype(np.float32)
        tv = np.stack([pad_to(v["tvecs"], Nb) for v in group]) \
            .astype(np.float32)
        Ks = np.stack([pad_to(v["K"], Nb) for v in group]) \
            .astype(np.float32)
        if u8:
            rgb = (np.float32(group[0].get("rgb_scale", 255.0)),
                   np.asarray(group[0]["rgb_mean"], np.float32),
                   np.asarray(group[0]["rgb_std"], np.float32))
        else:
            rgb = (np.float32(1.0), np.zeros((3,), np.float32),
                   np.ones((3,), np.float32))
        return (images, rot, tv, Ks, np.asarray(Rs, np.int32), u8,
                n_chunks, rgb)

    def predict_group(self, group: List[Dict]) -> List[np.ndarray]:
        """Run len(group) <= n_dev scenes as one SPMD program.

        Returns a list of [R_i, H, W] float32 depth maps.
        """
        n_real = len(group)
        assert n_real >= 1
        group = list(group) + [group[-1]] * (self.n_dev - n_real)
        images, rot, tv, Ks, Rs, u8, n_chunks, rgb = self._pad_group(group)

        put = lambda a: jax.device_put(a, self._scene_sh)
        prep_out = self._prep_dp(
            self.inner.variables, put(images), rgb[0], rgb[1], rgb[2],
            put(rot), put(tv), put(Ks), put(Rs), u8=u8, n_chunks=n_chunks)
        imgs_d, fh, fq, depth_all, bbox = prep_out
        bbox_np = np.asarray(bbox)                   # [S, 2, 3] small fetch
        # ONE static grid for the group: max bucketed extent over scenes
        ext = (bbox_np[:, 1] - bbox_np[:, 0])
        ext = np.where(np.isfinite(ext) & (ext > 0), ext, 0.0).max(0)
        gc = self.inner._grid_from_extent(ext)

        out, stats = self._refine_dp(
            self.inner.variables, imgs_d, fh, fq, put(rot), put(tv),
            put(Ks), depth_all, put(Rs), grid_cfg=gc, n_chunks=n_chunks)
        out_np = np.asarray(out)
        self.last_scene_stats = {sk: int(np.sum(sv[:n_real]))
                                 for sk, sv in stats.items()}
        res = []
        for i in range(n_real):
            d = out_np[i, :int(Rs[i])]
            if self.fetch_mm:
                d = d.astype(np.float32) * 1e-3
            res.append(d)
        return res

    def predict_scenes(self, scene_iter):
        """Group scenes n_dev at a time and yield per-scene depths."""
        group = []
        for views in scene_iter:
            group.append(views)
            if len(group) == self.n_dev:
                yield from self.predict_group(group)
                group = []
        if group:
            yield from self.predict_group(group)
