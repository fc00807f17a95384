"""Bilinear/trilinear sampling parity vs torch grid_sample (cpu torch is a
test-only dependency; the framework itself never imports torch)."""
import numpy as np
import jax.numpy as jnp
import pytest

from tdvnet.ops import sampling


def test_bilinear_matches_grid_sample(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    H, W, C = 13, 17, 4
    P = 200
    feat = rng.normal(size=(H, W, C)).astype(np.float32)
    # queries spanning in and out of bounds
    xy = rng.uniform(-3, W + 2, size=(P, 2)).astype(np.float32)
    xy[:, 1] = rng.uniform(-3, H + 2, size=P).astype(np.float32)

    ours = np.asarray(sampling.bilinear_sample(jnp.array(feat), jnp.array(xy)))

    t_feat = torch.from_numpy(feat).permute(2, 0, 1)[None]  # [1,C,H,W]
    gx = torch.from_numpy(xy[:, 0] / (W - 1) * 2 - 1)
    gy = torch.from_numpy(xy[:, 1] / (H - 1) * 2 - 1)
    grid = torch.stack([gx, gy], dim=-1)[None, :, None, :]  # [1,P,1,2]
    ref = F.grid_sample(t_feat, grid, mode="bilinear", padding_mode="zeros",
                        align_corners=True)[0, :, :, 0].T.numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_trilinear_interior_exact(rng):
    # a linear field is reproduced exactly by trilinear interpolation
    X, Y, Z = 8, 9, 10
    xx, yy, zz = np.meshgrid(np.arange(X), np.arange(Y), np.arange(Z),
                             indexing="ij")
    vol = (2.0 * xx - 3.0 * yy + 0.5 * zz).astype(np.float32)[..., None]
    q = rng.uniform(0.0, [X - 1, Y - 1, Z - 1], size=(100, 3)).astype(np.float32)
    out = np.asarray(sampling.trilinear_sample(jnp.array(vol), jnp.array(q)))
    expect = 2.0 * q[:, 0] - 3.0 * q[:, 1] + 0.5 * q[:, 2]
    np.testing.assert_allclose(out[:, 0], expect, rtol=1e-4, atol=1e-4)


def test_trilinear_zero_outside():
    vol = np.ones((4, 4, 4, 1), np.float32)
    q = np.array([[-2.0, 1.0, 1.0], [1.0, 1.0, 5.0], [-0.5, 0.0, 0.0]],
                 np.float32)
    out = np.asarray(sampling.trilinear_sample(jnp.array(vol), jnp.array(q)))
    assert out[0, 0] == 0.0
    assert out[1, 0] == 0.0
    # half-in point gets half weight
    np.testing.assert_allclose(out[2, 0], 0.5, atol=1e-6)


def test_resize_nearest_matches_torch(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    x = rng.normal(size=(2, 3, 11, 13)).astype(np.float32)
    for out_hw in [(22, 26), (5, 7), (11, 13), (33, 39)]:
        ours = np.asarray(sampling.resize_nearest(jnp.array(x), out_hw))
        ref = F.interpolate(torch.from_numpy(x), out_hw, mode="nearest").numpy()
        np.testing.assert_allclose(ours, ref)


def test_masked_mean_var(rng):
    from tdvnet.ops import masked

    x = rng.normal(size=(3, 5, 4)).astype(np.float32)
    mask = np.array([[1, 1, 0, 0, 0], [1, 1, 1, 1, 1], [0, 1, 0, 1, 0]],
                    bool)
    mean, var = masked.masked_mean_var(jnp.array(x), jnp.array(mask), axis=1)
    for i in range(3):
        sel = x[i, mask[i]]
        np.testing.assert_allclose(np.asarray(mean)[i], sel.mean(0), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(var)[i], sel.var(0), rtol=1e-4,
                                   atol=1e-6)


def test_source_variance_chunked_matches_unchunked(rng):
    """The memory-chunked point-axis scan must be numerically identical."""
    import jax.numpy as jnp
    from tdvnet.ops import camera, costvolume

    R, P, S, C = 2, 120, 3, 4
    feats = jnp.asarray(rng.normal(size=(4, 9, 11, C)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(-1, 1, size=(R, P, 3)).astype(np.float32))
    src_idx = jnp.asarray(rng.integers(0, 4, size=(R, S)).astype(np.int32))
    src_mask = jnp.asarray(rng.uniform(size=(R, S)) > 0.3)
    K = jnp.asarray(np.tile(np.array([[8.0, 0, 5], [0, 8.0, 4], [0, 0, 1]],
                                     np.float32), (4, 1, 1)))
    Rm = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (4, 1, 1)))
    t = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32) * 0.1
                    + np.array([0, 0, 3], np.float32))
    P_all = camera.projection_matrix(K, Rm, t)

    v1, m1 = costvolume._source_variance(pts, feats, src_idx, src_mask,
                                         P_all, (9, 11))
    old = costvolume._CHUNK_BUDGET_ELEMS
    try:
        costvolume._CHUNK_BUDGET_ELEMS = R * (P // 6) * C  # force 6 chunks
        v2, m2 = costvolume._source_variance(pts, feats, src_idx, src_mask,
                                             P_all, (9, 11))
    finally:
        costvolume._CHUNK_BUDGET_ELEMS = old
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-6)


def test_quad_packed_matches_bilinear(rng):
    from tdvnet.ops.sampling import (bilinear_sample, bilinear_sample_quads,
                                     pack_bilinear_quads)

    H, W, C = 13, 17, 6
    feat = jnp.asarray(rng.standard_normal((H, W, C)).astype(np.float32))
    # queries spanning in-bounds, border-margin and fully-out regions
    xy = jnp.asarray(np.stack([
        rng.uniform(-3, W + 2, 400), rng.uniform(-3, H + 2, 400)],
        axis=-1).astype(np.float32))
    ref = bilinear_sample(feat, xy)
    quads = pack_bilinear_quads(feat)
    out = bilinear_sample_quads(quads, xy, (H, W))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_oct_packed_matches_trilinear(rng):
    from tdvnet.ops.sampling import (pack_trilinear_octs, trilinear_sample,
                                     trilinear_sample_octs)

    X, Y, Z, C = 7, 9, 5, 4
    vol = jnp.asarray(rng.standard_normal((X, Y, Z, C)).astype(np.float32))
    q = jnp.asarray(np.stack([
        rng.uniform(-2, X + 1, 300), rng.uniform(-2, Y + 1, 300),
        rng.uniform(-2, Z + 1, 300)], axis=-1).astype(np.float32))
    ref = trilinear_sample(vol, q)
    out = trilinear_sample_octs(pack_trilinear_octs(vol), q, (X, Y, Z))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_costvolume_chunking_pads_odd_point_counts(rng, monkeypatch):
    """Prime P must not degrade to P chunks of 1 point (VERDICT r1 minor):
    the point axis pads to n_chunks * ceil(P/n) and results are identical
    to the unchunked path."""
    import jax
    from tdvnet.ops import camera, costvolume

    R, S, C = 2, 2, 4
    P = 97                                   # prime
    feats = jnp.asarray(rng.standard_normal((3, 10, 12, C))
                        .astype(np.float32))
    pts = jnp.asarray(rng.uniform(-1, 1, (R, P, 3)).astype(np.float32)
                      + np.array([0, 0, 3.0], np.float32))
    K = jnp.asarray(np.tile(np.array(
        [[9.0, 0, 6], [0, 9.0, 5], [0, 0, 1]], np.float32), (3, 1, 1)))
    rot = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (3, 1, 1)))
    tv = jnp.zeros((3, 3))
    src_idx = jnp.asarray([[0, 1], [1, 2]])
    src_mask = jnp.ones((R, S), bool)

    ref = costvolume.hypothesis_point_variance(
        pts, feats, src_idx, src_mask, rot, tv, K, (10, 12))

    monkeypatch.setattr(costvolume, "_CHUNK_BUDGET_ELEMS", 64)
    assert costvolume._pick_chunks(R, P, C) > 1
    out = costvolume.hypothesis_point_variance(
        pts, feats, src_idx, src_mask, rot, tv, K, (10, 12))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_combine_scales_matches_per_scale_sampling():
    """Merged fine-lattice sampling (eval fast path) must reproduce
    per-scale trilinear sampling exactly, including zero-pad boundaries
    (queries up to half a volume outside)."""
    import jax.numpy as jnp

    from tdvnet.models.hypothesis import combine_scales, sample_scales

    rng = np.random.default_rng(0)
    B, X, Y, Z = 2, 16, 12, 8
    scales = []
    for s, c in zip((4, 2, 1), (5, 4, 6)):
        g = jnp.asarray(rng.normal(
            size=(B, X // s, Y // s, Z // s, c)).astype(np.float32))
        scales.append({"grid": g, "stride": s})
    origins = jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32))
    pts = jnp.asarray((rng.uniform(-0.5, 1.5, size=(B, 4000, 3))
                       * np.array([X, Y, Z]) * 0.05
                       + np.asarray(origins)[:, None]).astype(np.float32))
    ref = sample_scales(scales, pts, origins, 0.05)
    comb = combine_scales(scales)
    assert len(comb) == 1 and comb[0]["grid"].shape[-1] == 15
    got = sample_scales(comb, pts, origins, 0.05)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    # non-nested (non-divisible) dims must fall back unchanged
    bad = [{"grid": jnp.zeros((1, 4, 3, 2, 2)), "stride": 4},
           {"grid": jnp.zeros((1, 13, 10, 7, 2)), "stride": 1}]
    out = combine_scales(bad)
    assert len(out) == 2 and out[0]["grid"].shape == (1, 4, 3, 2, 2)


def test_int8_oct_sampling_close_to_float(rng):
    """Fast-path int8-quantized oct table: per-channel symmetric
    quantization keeps sampling error under ~1% of the feature scale and
    preserves exact zeros (masked-dense inactive cells)."""
    import jax
    import jax.numpy as jnp

    from tdvnet.ops.sampling import (pack_trilinear_octs,
                                     quantize_per_channel_int8,
                                     trilinear_sample_octs,
                                     trilinear_sample_octs_scaled)

    X, Y, Z, C = 12, 10, 8, 16
    vol = rng.normal(size=(X, Y, Z, C)).astype(np.float32)
    vol[2:4] = 0.0                                   # inactive slab
    vol = jnp.asarray(vol)
    q = jnp.asarray((rng.uniform(-1.5, 1.5, size=(3000, 3))
                     * np.array([X, Y, Z]) * 0.6).astype(np.float32))

    ref = np.asarray(trilinear_sample_octs(pack_trilinear_octs(vol), q,
                                           (X, Y, Z)))
    vq, scale = quantize_per_channel_int8(vol)
    got = np.asarray(trilinear_sample_octs_scaled(
        pack_trilinear_octs(vq), scale, q, (X, Y, Z),
        out_dtype=jnp.float32))
    err = np.abs(got - ref)
    assert err.max() < 0.02 * np.abs(vol).max()
    # queries fully inside the zero slab stay exactly zero
    q0 = jnp.asarray(np.stack([np.full(50, 2.4), rng.uniform(1, 8, 50),
                               rng.uniform(1, 6, 50)], -1)
                     .astype(np.float32))
    z = np.asarray(trilinear_sample_octs_scaled(
        pack_trilinear_octs(vq), scale, q0, (X, Y, Z),
        out_dtype=jnp.float32))
    assert np.all(z == 0.0)


def test_fast_path_fused_scene_close_to_parity():
    """fast_path=True (int8 tables + single fine pass in iter 2) must
    track the parity driver on a tiny scene — the cheap CPU gate for the
    TPU fast-path acceptance run."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from tdvnet.config import tiny_test_config
    from tdvnet.data import batch as B, synthetic
    from tdvnet.eval.fused_scene import FusedSceneInference
    from tdvnet.models.threedvnet import ThreeDVNet

    cfg = tiny_test_config()
    cfg = dataclasses.replace(cfg, eval=dataclasses.replace(
        cfg.eval, eval_grid_size=(16, 16, 16), eval_max_anchors=4096,
        n_src_on_either_side=1, fused_chunk=4, grid_bucket=8))
    bc = cfg.batch
    views = synthetic.make_scene(n_views=6, img_size=bc.img_size, seed=3)
    model = ThreeDVNet(cfg.model)
    fb = B.collate_scenes(
        [synthetic.make_batch_scene(bc.n_views, bc.img_size,
                                    bc.depth_img_size, seed=0)],
        bc.n_views, bc.n_ref, bc.n_src_on_either_side)
    variables = jax.jit(lambda r, b: model.init(
        r, b, offsets=[0.05], n_iters=1, lam=0.0, train=False))(
        jax.random.PRNGKey(0), fb)

    offs = ((0.05, 0.025),)
    par = FusedSceneInference(model, variables, cfg, offsets_list=offs)
    d_par = par.predict_scene(views)
    fast = FusedSceneInference(model, variables, cfg, offsets_list=offs,
                               fast_path=True)
    assert fast.fast_path
    d_fast = fast.predict_scene(views)
    assert d_fast.shape == d_par.shape
    # int8 table quantization perturbs hypothesis scores slightly; depth
    # must stay within a small fraction of the offset step
    diff = np.abs(d_fast - d_par)
    assert np.median(diff) < 0.01
    assert diff.mean() < 0.02

    # + patch-fan image variance (fast_patch): still close to parity
    cfg_p = dataclasses.replace(cfg, eval=dataclasses.replace(
        cfg.eval, fast_patch=True))
    fastp = FusedSceneInference(model, variables, cfg_p, offsets_list=offs,
                                fast_path=True)
    assert fastp.fast_patch
    d_fastp = fastp.predict_scene(views)
    diff = np.abs(d_fastp - d_par)
    assert np.median(diff) < 0.01
    assert diff.mean() < 0.02


def test_decoder_scene_projection_exact_when_full_rank():
    """decoder_scene_projection: with r >= rank of the stacked first-conv
    scene weights (<= taps*hidden), the projected interface is EXACT —
    decoder(concat(s, var); params) == decoder(concat(s V, var); params')
    for arbitrary sampled features s."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tdvnet.models.hypothesis import (HypothesisDecoder,
                                          decoder_scene_projection)

    n_scene, n_var, hidden, H = 40, 8, 8, 7
    rank = 3 * hidden            # >= rank([K_-1 K_0 K_+1])
    dec = HypothesisDecoder(hidden=hidden, ksize=3)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(64, H, n_scene + n_var), jnp.float32)
    variables = dec.init(jax.random.PRNGKey(1), feats, False)

    V, new_params, tail = decoder_scene_projection(
        variables["params"], n_var, rank)
    assert tail < 1e-5, tail

    s, var = feats[..., :n_scene], feats[..., n_scene:]
    sp = jnp.einsum("mhc,cr->mhr", s, jnp.asarray(V))
    feats_p = jnp.concatenate([sp, var], axis=-1)

    y0 = dec.apply(variables, feats, False)
    y1 = dec.apply({"params": new_params,
                    "batch_stats": variables.get("batch_stats", {})},
                   feats_p, False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=2e-5, atol=2e-5)

    # truncated rank is a strict approximation but still a distribution
    V2, new_params2, tail2 = decoder_scene_projection(
        variables["params"], n_var, 12)
    assert tail2 > 0
    sp2 = jnp.einsum("mhc,cr->mhr", s, jnp.asarray(V2))
    y2 = dec.apply({"params": new_params2,
                    "batch_stats": variables.get("batch_stats", {})},
                   jnp.concatenate([sp2, var], axis=-1), False)
    np.testing.assert_allclose(np.asarray(y2).sum(axis=-1), 1.0, rtol=1e-4)


def test_patch_sample_matches_quads_for_small_fans(rng):
    """patch_sample_hypotheses == per-hypothesis bilinear_sample_quads
    whenever every hypothesis anchor is within +-1 texel of the center
    anchor (the epipolar-span condition the pointflow fast path relies
    on), including zero-padded borders and fully-out masking."""
    from tdvnet.ops.sampling import (bilinear_sample_quads,
                                     pack_bilinear_patches,
                                     pack_bilinear_quads,
                                     patch_sample_hypotheses)

    H, W, C = 13, 17, 6
    Hh, P = 7, 400
    feat = jnp.asarray(rng.standard_normal((H, W, C)).astype(np.float32))
    # centers spanning interior, border margin and fully-out regions
    xy_c = np.stack([rng.uniform(-3, W + 2, P),
                     rng.uniform(-3, H + 2, P)], axis=-1).astype(np.float32)
    # fan within +-0.9 texel of the center -> anchors differ by at most 1
    xy_h = (xy_c[None] + rng.uniform(-0.9, 0.9, (Hh, P, 2))
            ).astype(np.float32)
    xy_h[Hh // 2] = xy_c                   # center hypothesis is the anchor

    quads = pack_bilinear_quads(feat)
    ref = np.stack([np.asarray(bilinear_sample_quads(
        quads, jnp.asarray(xy_h[h]), (H, W))) for h in range(Hh)])
    # the quad path samples a fully-out hypothesis of an in-bounds pixel
    # normally; the patch path zeroes the whole fan when the CENTER is
    # fully out (clamped row holds the wrong neighborhood) — restrict the
    # comparison to real-center pixels and check the masking separately
    xc0 = np.floor(xy_c[:, 0]).astype(int)
    yc0 = np.floor(xy_c[:, 1]).astype(int)
    inb_c = ((xc0 >= -1) & (xc0 <= W - 1) & (yc0 >= -1) & (yc0 <= H - 1))

    patches = pack_bilinear_patches(feat)
    out = np.asarray(patch_sample_hypotheses(
        patches, jnp.asarray(xy_c), jnp.asarray(xy_h), (H, W)))
    np.testing.assert_allclose(out[:, inb_c], ref[:, inb_c],
                               rtol=1e-5, atol=1e-5)
    assert np.all(out[:, ~inb_c] == 0.0)


def test_hypothesis_patch_variance_matches_exact_small_offsets(rng):
    """hypothesis_patch_variance == hypothesis_point_variance when the
    hypothesis fan's epipolar span is sub-texel (small offsets / small
    baselines — the eval regime)."""
    from tdvnet.ops import costvolume

    R, Hh, P, S, C = 2, 5, 90, 3, 4
    N = 4
    feats = jnp.asarray(rng.standard_normal((N, 10, 12, C))
                        .astype(np.float32))
    K = jnp.asarray(np.tile(np.array(
        [[9.0, 0, 6], [0, 9.0, 5], [0, 0, 1]], np.float32), (N, 1, 1)))
    rot = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (N, 1, 1)))
    tv = jnp.asarray((rng.normal(size=(N, 3)) * 0.05).astype(np.float32))
    src_idx = jnp.asarray(rng.integers(0, N, size=(R, S)).astype(np.int32))
    src_mask = jnp.asarray(rng.uniform(size=(R, S)) > 0.3)

    # depth-offset fans along z: f*b*dd/d^2 ~ 9*0.1*0.1/9 ~ 0.01 texel span
    centers = rng.uniform(-1, 1, (R, P, 3)).astype(np.float32)
    centers[..., 2] += 3.0
    ivals = (np.arange(Hh) - Hh // 2).astype(np.float32)
    pts_hyp = centers[:, None, :, :].copy()
    pts_hyp = np.repeat(pts_hyp, Hh, axis=1)
    pts_hyp[..., 2] += (ivals[None, :, None] * 0.05)
    pts_hyp = jnp.asarray(pts_hyp)

    ref = costvolume.hypothesis_point_variance(
        pts_hyp.reshape(R, Hh * P, 3), feats, src_idx, src_mask, rot, tv,
        K, (10, 12)).reshape(R, Hh, P, C)
    out = costvolume.hypothesis_patch_variance(
        pts_hyp, feats, src_idx, src_mask, rot, tv, K, (10, 12))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
