"""Fixed-shape padded batch — the TPU replacement for the reference's PyG
`Batch` graph container (`mv3d/dsets/batch.py:6-52`).

The reference stores a flattened image tensor plus a `ref_src_edges [2, E]`
COO graph and relies on PyG collation to offset edge indices.  XLA wants
static shapes, so instead:

- every scene contributes exactly `n_views` images and `n_ref` ref slots
  (padded with masks when a scene is short);
- the ref↔src graph becomes a dense `[R, S]` source-index table per ref slot
  (the window includes the ref itself, like the reference's edges);
- PyG's synthesized `images_batch` becomes explicit `img_scene` segment ids.

All reductions over sources are masked axis reductions; all reductions over
scenes are segment ops with static counts.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class FrameBatch:
    """A collated multi-scene batch of posed frames.

    Shapes (N = total images, R = total ref slots, S = sources per ref):
      images:    [N, H, W, 3]  normalized RGB (channel-last)
      rotmats:   [N, 3, 3]     world→cam rotation
      tvecs:     [N, 3]        world→cam translation
      K:         [N, 3, 3]     intrinsics at images' resolution
      depth_gt:  [R, hg, wg]   GT depth for ref views (0 = invalid), or None
      ref_idx:   [R]           image index of each ref slot
      src_idx:   [R, S]        image indices of each ref's source window
      src_mask:  [R, S]        True where the source slot is real
      ref_mask:  [R]           True where the ref slot is real
      img_mask:  [N]           True where the image slot is real
      img_scene: [N]           scene id per image
      ref_scene: [R]           scene id per ref slot
    """

    images: jnp.ndarray
    rotmats: jnp.ndarray
    tvecs: jnp.ndarray
    K: jnp.ndarray
    depth_gt: Optional[jnp.ndarray]
    ref_idx: jnp.ndarray
    src_idx: jnp.ndarray
    src_mask: jnp.ndarray
    ref_mask: jnp.ndarray
    img_mask: jnp.ndarray
    img_scene: jnp.ndarray
    ref_scene: jnp.ndarray
    n_scenes: int = struct.field(pytree_node=False, default=1)

    @property
    def n_imgs(self) -> int:
        return self.images.shape[0]

    @property
    def n_refs(self) -> int:
        return self.ref_idx.shape[0]

    @property
    def img_size(self):
        return self.images.shape[1:3]

    def save_npz(self, path: str) -> None:
        arrs = {k: np.asarray(v) for k, v in self.__dict__.items()
                if v is not None and not isinstance(v, int)}
        arrs["n_scenes"] = np.int32(self.n_scenes)
        np.savez(path, **arrs)

    @classmethod
    def load_npz(cls, path: str) -> "FrameBatch":
        data = dict(np.load(path))
        n_scenes = int(data.pop("n_scenes"))
        return cls(n_scenes=n_scenes,
                   depth_gt=data.pop("depth_gt", None),
                   **{k: jnp.asarray(v) for k, v in data.items()})


def single_scene_views(images: np.ndarray, rotmats: np.ndarray,
                       tvecs: np.ndarray, K: np.ndarray,
                       depth_gt: Optional[np.ndarray],
                       n_src_on_either_side: int) -> FrameBatch:
    """Build a FrameBatch from one scene's ordered view list (no padding).

    The source window of ref i spans images [i-k, i+k] like the reference's
    sliding-window edge construction (`mv3d/dsets/dataset.py:133-137`).
    Images 0..k-1 and the trailing k images are source-only.
    """
    n = images.shape[0]
    k = n_src_on_either_side
    n_ref = n - 2 * k
    assert n_ref >= 1, "need at least one ref view"
    ref_idx = np.arange(k, n - k, dtype=np.int32)
    src_idx = ref_idx[:, None] + np.arange(-k, k + 1, dtype=np.int32)[None, :]
    S = 2 * k + 1
    return FrameBatch(
        images=jnp.asarray(images),
        rotmats=jnp.asarray(rotmats),
        tvecs=jnp.asarray(tvecs),
        K=jnp.asarray(K),
        depth_gt=None if depth_gt is None else jnp.asarray(depth_gt),
        ref_idx=jnp.asarray(ref_idx),
        src_idx=jnp.asarray(src_idx),
        src_mask=jnp.ones((n_ref, S), bool),
        ref_mask=jnp.ones((n_ref,), bool),
        img_mask=jnp.ones((n,), bool),
        img_scene=jnp.zeros((n,), jnp.int32),
        ref_scene=jnp.zeros((n_ref,), jnp.int32),
        n_scenes=1,
    )


def collate_scenes(scenes, n_views: int, n_ref: int, n_src_on_either_side: int):
    """Collate per-scene view dicts into one padded FrameBatch.

    scenes: list of dicts with keys images [V,H,W,3], rotmats, tvecs, K,
    depth_gt [V_ref, hg, wg] (numpy).  Each scene is padded/truncated to
    exactly `n_views` images and `n_ref` ref slots.
    """
    B = len(scenes)
    k = n_src_on_either_side
    S = 2 * k + 1
    H, W = scenes[0]["images"].shape[1:3]

    images = np.zeros((B * n_views, H, W, 3), np.float32)
    rotmats = np.tile(np.eye(3, dtype=np.float32), (B * n_views, 1, 1))
    tvecs = np.zeros((B * n_views, 3), np.float32)
    Ks = np.tile(np.eye(3, dtype=np.float32), (B * n_views, 1, 1))
    img_mask = np.zeros((B * n_views,), bool)
    img_scene = np.repeat(np.arange(B, dtype=np.int32), n_views)

    hg, wg = (scenes[0]["depth_gt"].shape[1:3]
              if scenes[0].get("depth_gt") is not None else (1, 1))
    has_depth = scenes[0].get("depth_gt") is not None
    depth_gt = np.zeros((B * n_ref, hg, wg), np.float32) if has_depth else None
    ref_idx = np.zeros((B * n_ref,), np.int32)
    src_idx = np.zeros((B * n_ref, S), np.int32)
    src_mask = np.zeros((B * n_ref, S), bool)
    ref_mask = np.zeros((B * n_ref,), bool)
    ref_scene = np.repeat(np.arange(B, dtype=np.int32), n_ref)

    for b, sc in enumerate(scenes):
        v = min(sc["images"].shape[0], n_views)
        base = b * n_views
        images[base:base + v] = sc["images"][:v]
        rotmats[base:base + v] = sc["rotmats"][:v]
        tvecs[base:base + v] = sc["tvecs"][:v]
        Ks[base:base + v] = sc["K"][:v]
        img_mask[base:base + v] = True

        r = min(max(v - 2 * k, 0), n_ref)
        rbase = b * n_ref
        for i in range(r):
            ref_idx[rbase + i] = base + k + i
            window = base + k + i + np.arange(-k, k + 1)
            src_idx[rbase + i] = np.clip(window, base, base + v - 1)
            src_mask[rbase + i] = (window >= base) & (window < base + v)
            ref_mask[rbase + i] = True
        # padded ref slots point at the scene's first image (safe gather)
        ref_idx[rbase + r:rbase + n_ref] = base
        src_idx[rbase + r:rbase + n_ref] = base
        if has_depth:
            depth_gt[rbase:rbase + r] = sc["depth_gt"][:r]

    return FrameBatch(
        images=jnp.asarray(images), rotmats=jnp.asarray(rotmats),
        tvecs=jnp.asarray(tvecs), K=jnp.asarray(Ks),
        depth_gt=None if depth_gt is None else jnp.asarray(depth_gt),
        ref_idx=jnp.asarray(ref_idx), src_idx=jnp.asarray(src_idx),
        src_mask=jnp.asarray(src_mask), ref_mask=jnp.asarray(ref_mask),
        img_mask=jnp.asarray(img_mask), img_scene=jnp.asarray(img_scene),
        ref_scene=jnp.asarray(ref_scene), n_scenes=B,
    )
