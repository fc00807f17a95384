"""Whole-scene streaming inference with static-shape chunking.

Counterpart of the reference eval entry (`mv3d/eval-3dvnet.py:26-129`):
initial depth streams over ref chunks (INIT_DEPTH_BATCH=18), the scene
volume is built once per refinement iteration from ALL depths
(`eval-3dvnet.py:75`), PointFlow streams over chunks (OFFSET_BATCH=16),
upsampling over chunks (UPSAMPLE_BATCH=100).  On TPU every chunk shape is
static: ref counts pad up to the chunk size and whole-scene ref totals pad
up to power-of-two buckets, so arbitrary-length scenes reuse a handful of
compiled graphs.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tdvnet.config import Config, DepthConfig, GridConfig
from tdvnet.data.batch import FrameBatch
from tdvnet.models.threedvnet import ThreeDVNet


def _bucket(n: int, lo: int = 16) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


class CountingJit:
    """`jax.jit` replacement that AOT-compiles per input signature and
    accumulates the executed-FLOP count from XLA's cost analysis.

    Used by `bench.py` to ground whole-scene throughput claims in measured
    compiled-graph FLOPs (the reference measures no throughput at all —
    SURVEY §6 gap row).  Statics are baked into the compiled executable, so
    calls pass only the dynamic arguments through.
    """

    def __init__(self, fn, static_argnames=()):
        self._jit = jax.jit(fn, static_argnames=static_argnames)
        self._static = frozenset(static_argnames)
        self._cache = {}
        self.flops = 0.0
        self.calls = 0

    def reset(self):
        self.flops = 0.0
        self.calls = 0

    @staticmethod
    def _key(args, kwargs):
        leaves, treedef = jax.tree_util.tree_flatten((args, kwargs))
        desc = tuple(
            (x.shape, str(x.dtype)) if hasattr(x, "shape") else x
            for x in leaves)
        return (str(treedef), desc)

    def __call__(self, *args, **kwargs):
        key = self._key(args, kwargs)
        ent = self._cache.get(key)
        if ent is None:
            compiled = self._jit.lower(*args, **kwargs).compile()
            ca = compiled.cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            ent = (compiled, float(ca.get("flops", 0.0) or 0.0))
            self._cache[key] = ent
        compiled, fl = ent
        self.flops += fl
        self.calls += 1
        dyn = {k: v for k, v in kwargs.items() if k not in self._static}
        return compiled(*args, **dyn)


def _chunk_batch(views: Dict, r0: int, r1: int, k: int,
                 chunk_refs: int, device_cams=None,
                 table_cache: Optional[Dict] = None) -> Tuple[FrameBatch, int]:
    """Build a local FrameBatch for ref slots [r0, r1) of a single scene.

    Refs r of the scene use images [r, r+2k]; the chunk's image window is
    [r0, r1 + 2k).  Pads to `chunk_refs` refs.  Returns (batch, n_valid).

    device_cams: optional (rotmats, tvecs, K) already on device — the
    camera window is then sliced/padded on device instead of re-uploading
    per chunk (each host->device upload is a ~tens-of-ms tunnel message).
    table_cache: optional dict caching the small index/mask tables per
    (r0, n_valid, chunk_refs) on device for the same reason.
    """
    n_valid = r1 - r0
    S = 2 * k + 1
    n_imgs_window = chunk_refs + 2 * k
    i0 = r0
    n_total_imgs = views["rotmats"].shape[0]

    if device_cams is None:
        device_cams = (views["rotmats"], views["tvecs"], views["K"])

    def pad_imgs(a):
        sl = a[i0:i0 + n_imgs_window]
        if sl.shape[0] < n_imgs_window:
            if isinstance(sl, np.ndarray):
                pad = np.repeat(sl[-1:], n_imgs_window - sl.shape[0], axis=0)
                sl = np.concatenate([sl, pad], axis=0)
            else:
                pad = jnp.repeat(sl[-1:], n_imgs_window - sl.shape[0], axis=0)
                sl = jnp.concatenate([sl, pad], axis=0)
        return jnp.asarray(sl)

    key = (r0, n_valid, chunk_refs, k, n_total_imgs)
    tables = table_cache.get(key) if table_cache is not None else None
    if tables is None:
        ref_idx = np.arange(chunk_refs, dtype=np.int32) + k
        src_idx = ref_idx[:, None] + np.arange(-k, k + 1,
                                               dtype=np.int32)[None]
        ref_mask = np.arange(chunk_refs) < n_valid
        src_global = src_idx + i0 - k
        src_mask = ref_mask[:, None] & (src_global >= 0) \
            & (src_global < n_total_imgs)
        src_idx = np.clip(src_idx, 0, n_imgs_window - 1)
        tables = (jnp.asarray(ref_idx), jnp.asarray(src_idx),
                  jnp.asarray(src_mask), jnp.asarray(ref_mask),
                  jnp.ones((n_imgs_window,), bool),
                  jnp.zeros((n_imgs_window,), jnp.int32),
                  jnp.zeros((chunk_refs,), jnp.int32),
                  jnp.zeros((n_imgs_window, 1, 1, 3), jnp.float32))
        if table_cache is not None:
            table_cache[key] = tables
    (ref_idx, src_idx, src_mask, ref_mask, img_mask, img_scene,
     ref_scene, img_stub) = tables

    return FrameBatch(
        images=img_stub,
        rotmats=pad_imgs(device_cams[0]),
        tvecs=pad_imgs(device_cams[1]),
        K=pad_imgs(device_cams[2]),
        depth_gt=None,
        ref_idx=ref_idx,
        src_idx=src_idx,
        src_mask=src_mask,
        ref_mask=ref_mask,
        img_mask=img_mask,
        img_scene=img_scene,
        ref_scene=ref_scene,
        n_scenes=1,
    ), n_valid


class SceneInference:
    """Compiled-chunk whole-scene depth prediction for one model."""

    def __init__(self, model: ThreeDVNet, variables, cfg: Config,
                 offsets_list: Sequence[Sequence[float]] = ((0.05, 0.05, 0.025),
                                                           (0.05, 0.05, 0.025)),
                 count_flops: bool = False, mesh=None,
                 shard_axis: str = "space"):
        """mesh: optional `jax.sharding.Mesh` with a `shard_axis` axis —
        the scene U-Net then runs spatially sharded (x-blocks + ppermute
        halo exchange; SURVEY §5.7), which is what lets whole-scene eval
        hold scene volumes bigger than one chip's HBM."""
        self.model = model
        self.variables = variables
        self.cfg = cfg
        self.offsets_list = [list(o) for o in offsets_list]
        self.mesh = mesh
        self.shard_axis = shard_axis
        e = cfg.eval
        self.grid_cfg = GridConfig(
            edge_len=cfg.model.grid.edge_len, grid_size=e.eval_grid_size,
            max_anchors=e.eval_max_anchors)
        wrap = CountingJit if count_flops else jax.jit
        self._feat = wrap(self._feat_impl)
        self._init_depth = wrap(self._init_depth_impl)
        self._scene = wrap(self._scene_impl, static_argnames=("grid_cfg",))
        self._pointflow = wrap(self._pointflow_impl,
                               static_argnames=("offsets", "grid_cfg"))
        self._upsample = wrap(self._upsample_impl)
        # uint8 upload path: the remote-TPU tunnel measures ~40 MB/s up, so
        # shipping 256x320 float32 stacks costs seconds per scene; uint8 is
        # 4x smaller and normalization runs on device.
        self._norm_u8 = jax.jit(
            lambda u8, scale, mean, std:
            (u8.astype(jnp.float32) / scale - mean) / std)
        self._pack = jax.jit(self._pack_impl)
        self._tables: Dict = {}          # _chunk_batch device-table cache
        if mesh is not None:
            from tdvnet.models.scene_unet import SceneUNet

            c = cfg.model
            self._unet_sh = SceneUNet(c.unet_dims, c.unet_groups,
                                      c.unet_res, dtype=c.dtype,
                                      axis_name=shard_axis)
            self._scene_dense = wrap(self._scene_dense_impl,
                                     static_argnames=("grid_cfg",))
            self._unet_sharded = wrap(self._unet_sharded_impl)
        self.last_scene_stats: Dict = {}

    def flops_executed(self) -> float:
        """Total FLOPs executed since the last reset (count_flops=True only)."""
        return sum(f.flops for f in self._counting_jits())

    def reset_flops(self) -> None:
        for f in self._counting_jits():
            f.reset()

    def _counting_jits(self):
        return [f for f in (self._feat, self._init_depth, self._scene,
                            self._pointflow, self._upsample)
                if isinstance(f, CountingJit)]

    # --- jitted impls (closed over model; variables passed as args) ---
    def _feat_impl(self, variables, images):
        return self.model.apply(variables, images, False,
                                method="extract_features")

    def _init_depth_impl(self, variables, batch, quarter):
        return self.model.apply(variables, batch, self.cfg.model.depth_test,
                                quarter, False, method="initial_depth")

    def _scene_impl(self, variables, depth_all, quarter_all, batch,
                    grid_cfg):
        return self.model.apply(variables, depth_all, quarter_all, batch,
                                grid_cfg, False, method="model_scene")

    def _pointflow_impl(self, variables, scales, origins, depth, quarter,
                        batch, offsets, grid_cfg):
        return self.model.apply(variables, scales, origins, depth, quarter,
                                batch, offsets, 3, grid_cfg, False,
                                method="run_pointflow_multi")

    def _scene_dense_impl(self, variables, depth_all, quarter_all, batch,
                          grid_cfg):
        return self.model.apply(variables, depth_all, quarter_all, batch,
                                grid_cfg, method="scene_dense")

    def _unet_sharded_impl(self, unet_vars, dense, occ):
        from jax.sharding import PartitionSpec as P

        a = self.shard_axis
        L = len(self.cfg.model.unet_dims)
        out_specs = [{"grid": P(None, a), "mask": P(None, a),
                      "stride": P()} for _ in range(L)]
        return jax.shard_map(
            lambda v, g, m: self._unet_sh.apply(v, g, m),
            mesh=self.mesh,
            in_specs=(P(), P(None, a), P(None, a)),
            out_specs=out_specs, check_vma=False)(unet_vars, dense, occ)

    def _run_scene(self, d_pad, q_all, scene_batch, gc):
        """One scene-volume build: replicated point stage, then the U-Net
        (sharded over the mesh when one was given)."""
        if self.mesh is None:
            return self._scene(self.variables, d_pad, q_all, scene_batch,
                               grid_cfg=gc)
        dense, occ, origins, stats = self._scene_dense(
            self.variables, d_pad, q_all, scene_batch, grid_cfg=gc)
        unet_vars = {"params": self.variables["params"]["scene_unet"]}
        scales = self._unet_sharded(unet_vars, dense, occ)
        return scales, origins, stats

    def _upsample_impl(self, variables, depth, half, quarter, images, ref_idx):
        return self.model.apply(variables, depth, half, quarter, images,
                                ref_idx, False, method="upsample")

    @staticmethod
    def _pack_impl(grids):
        """Oct-pack every U-Net scale once per scene iteration so the
        pointflow chunks gather from prebuilt tables instead of re-packing
        (or 8-tap-sampling) inside every chunk dispatch."""
        from tdvnet.models.hypothesis import pack_scales

        return pack_scales(grids)

    def _pack_scene_scales(self, scales):
        octs = self._pack([sc["grid"] for sc in scales])
        return [dict(sc, octs=o, dims=tuple(sc["grid"].shape[1:4]))
                for sc, o in zip(scales, octs)]

    def _device_images(self, views):
        """All scene images as one normalized float32 device stack.

        Prefers the `images_u8` raw stack (4x less tunnel traffic than the
        pre-normalized float images; normalization runs on device)."""
        u8 = views.get("images_u8")
        if u8 is None:
            return jnp.asarray(views["images"])
        scale = jnp.float32(views.get("rgb_scale", 255.0))
        mean = jnp.asarray(views["rgb_mean"], jnp.float32)
        std = jnp.asarray(views["rgb_std"], jnp.float32)
        return self._norm_u8(jnp.asarray(u8), scale, mean, std)

    def _choose_grid(self, views: Dict, depth_all: np.ndarray,
                     R: int) -> GridConfig:
        """Pick the scene-volume grid for this scene.

        With auto_grid on, backproject the predicted depths (host numpy,
        strided) and size the grid to the bbox extent rounded up to
        grid_bucket multiples, capped at eval_grid_size.  Warns when the
        cap clips the scene — the reference never drops geometry
        (`mv3d/utils.py:38-64`), so a clamp must be visible.
        """
        e = self.cfg.eval
        if not e.auto_grid:
            return self.grid_cfg
        h, w = depth_all.shape[1:]
        H, W = self.cfg.model.img_size
        k = e.n_src_on_either_side
        s = 4                                        # pixel stride
        xs = np.linspace(0.0, W - 1.0, w, dtype=np.float32)[::s]
        ys = np.linspace(0.0, H - 1.0, h, dtype=np.float32)[::s]
        xx, yy = np.meshgrid(xs, ys)
        grid = np.stack([xx, yy, np.ones_like(xx)], -1).reshape(-1, 3)
        Kr = views["K"][k:k + R]
        Rr = views["rotmats"][k:k + R]
        tr = views["tvecs"][k:k + R]
        rays = np.einsum("nij,pj->npi", np.linalg.inv(Kr), grid)
        d = depth_all[:R, ::s, ::s].reshape(R, -1, 1)
        pts = np.einsum("nji,npj->npi", Rr, rays * d - tr[:, None, :])
        pts = pts[np.asarray(d[..., 0]) > 0]
        gc = self.grid_cfg
        if pts.size == 0:
            return gc
        extent = pts.max(axis=0) - pts.min(axis=0)
        b = e.grid_bucket
        need = np.ceil(extent / gc.edge_len).astype(int) + 2
        # sharded U-Net: local x-extent must divide by 2^(levels-1)
        bx = b
        if self.mesh is not None:
            n = self.mesh.shape[self.shard_axis]
            bx = int(np.lcm(b, n * 2 ** (len(self.cfg.model.unet_dims) - 1)))
        buckets = np.array([bx, b, b])
        dims = -(-need // buckets) * buckets         # round up to bucket
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

    # --- streaming driver ---
    @staticmethod
    def _sync(x):
        """Force real completion of a device array (the tunnel's
        block_until_ready returns early; fetching bytes does not)."""
        np.asarray(jax.device_get(x.ravel()[:1]))
        return x

    def predict_scene(self, views: Dict,
                      timings: Optional[Dict] = None) -> np.ndarray:
        """views: whole-scene dict from `Dataset.load_views` (numpy).

        Returns depth maps [R, H, W] (image resolution) for all ref views.
        timings: optional dict — filled with per-stage wall seconds (each
        stage force-synced, so the breakdown is honest but the total is
        slightly worse than the free-running pipeline).
        """
        import time as _time

        t_mark = [_time.perf_counter()]

        def mark(name, sync_val=None):
            if timings is None:
                return
            if sync_val is not None:
                self._sync(sync_val)
            now = _time.perf_counter()
            timings[name] = timings.get(name, 0.0) + now - t_mark[0]
            t_mark[0] = now

        cfg, e = self.cfg, self.cfg.eval
        k = e.n_src_on_either_side
        n_imgs = views["images"].shape[0]
        R = n_imgs - 2 * k
        assert R >= 1, "scene too short"
        h, w = cfg.model.depth_test.size

        # one normalized image stack on device for stages A and E;
        # cameras uploaded once and sliced on device per chunk
        imgs_dev = self._device_images(views)
        cams_dev = (jnp.asarray(views["rotmats"]),
                    jnp.asarray(views["tvecs"]), jnp.asarray(views["K"]))
        mark("upload_norm", imgs_dev)

        # Stage A: features for all images, chunked
        CH = 32
        halves, quarters = [], []
        for i0 in range(0, n_imgs, CH):
            sl = imgs_dev[i0:i0 + CH]
            pad = CH - sl.shape[0]
            if pad:
                sl = jnp.concatenate([sl, jnp.repeat(sl[-1:], pad, 0)], 0)
            fh, fq, _ = self._feat(self.variables, sl)
            halves.append(fh if not pad else fh[:-pad])
            quarters.append(fq if not pad else fq[:-pad])
        feats_half = jnp.concatenate(halves, axis=0)
        feats_quarter = jnp.concatenate(quarters, axis=0)
        mark("A_features", feats_quarter)

        # Stage B: initial depth, chunked over refs
        IC = e.init_depth_batch
        depth_chunks = []
        for r0 in range(0, R, IC):
            r1 = min(r0 + IC, R)
            cb, n_valid = _chunk_batch(views, r0, r1, k, IC, cams_dev,
                                       self._tables)
            q = feats_quarter[r0:r0 + IC + 2 * k]
            qpad = IC + 2 * k - q.shape[0]
            if qpad:
                q = jnp.concatenate([q, jnp.repeat(q[-1:], qpad, 0)], 0)
            d, _ = self._init_depth(self.variables, cb, q)
            depth_chunks.append(d[:n_valid])
        depth_all = jnp.concatenate(depth_chunks, axis=0)       # [R, h, w]
        mark("B_init_depth", depth_all)

        # whole-scene padded batch for the global scene volume
        Rb = _bucket(R)
        scene_batch, _ = _chunk_batch(views, 0, R, k, Rb, cams_dev,
                                      self._tables)
        Nq = Rb + 2 * k
        q_all = feats_quarter
        if q_all.shape[0] < Nq:
            q_all = jnp.concatenate(
                [q_all, jnp.repeat(q_all[-1:], Nq - q_all.shape[0], 0)], 0)
        d_pad = jnp.concatenate(
            [depth_all, jnp.zeros((Rb - R, h, w), jnp.float32)], axis=0)

        # Stage C/D: refinement iterations
        OC = e.offset_batch
        gc = self._choose_grid(views, np.asarray(depth_all), R)
        mark("grid_choose")
        stats_acc = {}
        for offsets in self.offsets_list:
            scales, origins, sstats = self._run_scene(d_pad, q_all,
                                                      scene_batch, gc)
            scales = self._pack_scene_scales(scales)
            mark("C_scene", origins)
            for sk, sv in sstats.items():
                stats_acc[sk] = stats_acc.get(sk, 0) + int(sv)
            new_chunks = []
            for r0 in range(0, R, OC):
                r1 = min(r0 + OC, R)
                cb, n_valid = _chunk_batch(views, r0, r1, k, OC, cams_dev,
                                           self._tables)
                q = feats_quarter[r0:r0 + OC + 2 * k]
                qpad = OC + 2 * k - q.shape[0]
                if qpad:
                    q = jnp.concatenate([q, jnp.repeat(q[-1:], qpad, 0)], 0)
                dch = d_pad[r0:r0 + OC]
                # all of this iteration's offset passes in one dispatch —
                # refs are independent, so the offset chain lives inside
                # the per-chunk graph (run_pointflow_multi)
                dnew = self._pointflow(self.variables, scales, origins,
                                       dch, q, cb,
                                       offsets=tuple(float(o)
                                                     for o in offsets),
                                       grid_cfg=gc)
                new_chunks.append(dnew[:n_valid])
            depth_all = jnp.concatenate(new_chunks, axis=0)
            d_pad = jnp.concatenate(
                [depth_all, jnp.zeros((Rb - R, h, w), jnp.float32)], 0)
            mark("D_pointflow", depth_all)

        self.last_scene_stats = stats_acc
        dropped = stats_acc.get("n_out_of_grid", 0) \
            + stats_acc.get("n_overflow", 0)
        if dropped:
            import warnings

            warnings.warn(
                f"scene volume dropped {dropped} points "
                f"(out_of_grid={stats_acc.get('n_out_of_grid', 0)}, "
                f"anchor_overflow={stats_acc.get('n_overflow', 0)} of "
                f"{stats_acc.get('n_points', 0)} valid) — enlarge "
                f"eval_grid_size / eval_max_anchors")

        # Stage E: upsample, chunked
        UC = min(e.upsample_batch, max(R, 1))
        outs = []
        for r0 in range(0, R, UC):
            r1 = min(r0 + UC, R)
            n_valid = r1 - r0
            dch = depth_all[r0:r0 + UC]
            pad = UC - dch.shape[0]
            if pad:
                dch = jnp.concatenate([dch, jnp.repeat(dch[-1:], pad, 0)], 0)
            img_sel = np.clip(np.arange(r0, r0 + UC) + k, 0, n_imgs - 1)
            imgs = imgs_dev[img_sel]
            half = feats_half[img_sel]
            quarter = feats_quarter[img_sel]
            ridx = jnp.arange(UC, dtype=jnp.int32)
            d = self._upsample(self.variables, dch, half, quarter, imgs, ridx)
            outs.append(np.asarray(d[:n_valid]))
        out = np.concatenate(outs, axis=0)
        mark("E_upsample")
        return out
