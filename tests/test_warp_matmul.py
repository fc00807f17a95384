"""Two-pass matmul plane-sweep warp vs the gather path.

The matmul warp (`tdvnet.ops.warp`) is the MXU replacement for the
gather-based `costvolume.plane_sweep_cost_volume`.  For pure-translation
source pairs the scanline slope alpha is exactly 0 and the two paths must
agree to float tolerance; for rotated (realistic) pairs they agree to the
documented O(alpha) sub-pixel bound.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdvnet.ops import costvolume, warp
from tdvnet.data import synthetic


def _scene_tables(sc, R_refs, S, k):
    ref_idx = jnp.arange(k, k + R_refs, dtype=jnp.int32)
    src_idx = jnp.asarray(
        np.arange(R_refs)[:, None] + np.arange(0, 2 * k + 1)[None]
    ).astype(jnp.int32)
    src_mask = jnp.ones((R_refs, S), bool)
    return ref_idx, src_idx, src_mask


def test_translation_pairs_exact():
    """Identity relative rotation => alpha == 0 => exact bilinear."""
    rng = np.random.RandomState(0)
    N, C = 4, 8
    H, W = 64, 80
    Hf, Wf = 16, 20
    feats = jnp.asarray(rng.rand(N, Hf, Wf, C).astype(np.float32))
    rotm = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (N, 1, 1)))
    tv = jnp.asarray((np.arange(N)[:, None]
                      * np.array([0.12, 0.03, 0.0])).astype(np.float32))
    K = jnp.asarray(np.tile(np.array([[70.0, 0, W / 2], [0, 70.0, H / 2],
                                      [0, 0, 1]], np.float32), (N, 1, 1)))
    ref_idx, src_idx, src_mask = _scene_tables(None, 2, 3, 1)

    args = (feats, rotm, tv, K, ref_idx, src_idx, src_mask,
            1.0, 0.2, 12, (H, W), (12, 16))
    ref = costvolume.plane_sweep_cost_volume(*args)
    got = warp.plane_sweep_variance_matmul(*args, weights_dtype=jnp.float32)

    Hm = warp.plane_sweep_homographies(rotm, tv, K, ref_idx, src_idx,
                                       1.0, 0.2, 12, (H, W), (12, 16),
                                       (Hf, Wf))
    assert float(warp.max_abs_alpha(Hm, 12)) < 1e-5
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_realistic_scene_close():
    """Rotated neighboring views from the synthetic renderer: the two-pass
    result matches the gather path to the O(alpha) sub-pixel bound."""
    rng = np.random.RandomState(1)
    sc = synthetic.make_scene(n_views=6, img_size=(64, 80), seed=3)
    N = 6
    C = 8
    Hf, Wf = 16, 20
    feats = jnp.asarray(rng.rand(N, Hf, Wf, C).astype(np.float32))
    rotm = jnp.asarray(sc["rotmats"])
    tv = jnp.asarray(sc["tvecs"])
    K = jnp.asarray(sc["K"])
    ref_idx, src_idx, src_mask = _scene_tables(sc, 2, 5, 2)

    args = (feats, rotm, tv, K, ref_idx, src_idx, src_mask,
            0.5, 0.25, 16, (64, 80), (16, 20))
    ref = np.asarray(costvolume.plane_sweep_cost_volume(*args))
    got = np.asarray(warp.plane_sweep_variance_matmul(
        *args, weights_dtype=jnp.float32))

    Hm = warp.plane_sweep_homographies(rotm, tv, K, ref_idx, src_idx,
                                       0.5, 0.25, 16, (64, 80), (16, 20),
                                       (Hf, Wf))
    alpha = float(warp.max_abs_alpha(Hm, 16))
    assert alpha < 0.5, "synthetic neighbors should have mild scanlines"

    # identical support: where the gather path sees zeros (out of image),
    # so must the matmul path
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr > 0.995, corr
    # O(alpha)-bounded deviation relative to the variance scale
    scale = np.abs(ref).mean()
    assert np.abs(got - ref).mean() < 0.05 * scale + 1e-4


def test_bf16_weights_close_to_fp32():
    rng = np.random.RandomState(2)
    sc = synthetic.make_scene(n_views=4, img_size=(64, 80), seed=5)
    feats = jnp.asarray(rng.rand(4, 16, 20, 8).astype(np.float32))
    ref_idx, src_idx, src_mask = _scene_tables(sc, 2, 3, 1)
    args = (feats, jnp.asarray(sc["rotmats"]), jnp.asarray(sc["tvecs"]),
            jnp.asarray(sc["K"]), ref_idx, src_idx, src_mask,
            0.5, 0.25, 8, (64, 80), (16, 20))
    a = np.asarray(warp.plane_sweep_variance_matmul(
        *args, weights_dtype=jnp.float32))
    b = np.asarray(warp.plane_sweep_variance_matmul(
        *args, weights_dtype=jnp.bfloat16))
    assert np.abs(a - b).mean() < 0.02 * (np.abs(a).mean() + 1e-6)


def test_auto_mode_falls_back_on_rotation_heavy_pair():
    """VERDICT r2 #4: warp_mode='auto' must route rotation-heavy view
    pairs (max |scanline slope| > alpha_max) to the EXACT gather path,
    and mild pairs to the matmul path."""
    import jax.numpy as jnp

    from tdvnet.ops import costvolume, warp

    rng = np.random.default_rng(3)
    H, W = 32, 40
    h, w = 8, 10
    C = 4
    K = jnp.array([[[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]]] * 2)
    feats = jnp.asarray(rng.normal(size=(2, H, W, C)).astype(np.float32))
    ref_idx = jnp.array([0])
    src_idx = jnp.array([[0, 1]])
    src_mask = jnp.array([[True, True]])
    args = (ref_idx, src_idx, src_mask, 1.0, 0.1, 6, (H, W), (h, w))

    def run(rotmats, tvecs, mode):
        return np.asarray(costvolume.plane_sweep_cost_volume(
            feats, rotmats, tvecs, K, *args, mode=mode))

    # mild pair: identity rotation, small baseline -> stays on matmul
    R_mild = jnp.stack([jnp.eye(3)] * 2)
    t_mild = jnp.array([[0.0, 0, 0], [-0.2, 0, 0]])
    auto = run(R_mild, t_mild, "auto")
    mm = run(R_mild, t_mild, "matmul")
    np.testing.assert_allclose(auto, mm, atol=1e-6)

    # rotation-heavy pair: 90 deg roll makes scanlines near-vertical in
    # the source image (|alpha| >> 1) -> must match the exact gather path
    cz, sz = 0.0, 1.0
    R_roll = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1.0]])
    R_heavy = jnp.stack([jnp.eye(3), R_roll])
    t_heavy = jnp.array([[0.0, 0, 0], [-0.2, 0, 0]])
    Hm = warp.plane_sweep_homographies(R_heavy, t_heavy, K, ref_idx,
                                       src_idx, 1.0, 0.1, 6, (H, W), (h, w),
                                       (H, W))
    assert float(warp.max_abs_alpha(Hm, h)) > 0.25, "scene not heavy enough"
    auto_h = run(R_heavy, t_heavy, "auto")
    gather_h = run(R_heavy, t_heavy, "gather")
    np.testing.assert_allclose(auto_h, gather_h, atol=1e-6)
    mm_h = run(R_heavy, t_heavy, "matmul")
    assert np.abs(mm_h - gather_h).max() > 1e-4, \
        "matmul path unexpectedly exact here; fallback test is vacuous"
