"""Voxelization: compact-unique correctness vs a numpy reference."""
import numpy as np
import jax.numpy as jnp

from tdvnet.ops import voxelize as V


def test_voxelize_matches_numpy(rng):
    P, B = 500, 2
    pts = rng.uniform(0, 1.0, size=(P, 3)).astype(np.float32)
    scene = rng.integers(0, B, size=P).astype(np.int32)
    valid = rng.uniform(size=P) > 0.1
    edge = 0.13
    gs = (16, 16, 16)

    vg = V.voxelize(jnp.array(pts), jnp.array(scene), jnp.array(valid), edge,
                    gs, max_anchors=512, n_scenes=B)

    # numpy reference: per-scene bbox-min origin, floor quantization, unique
    origins = np.zeros((B, 3), np.float32)
    for b in range(B):
        origins[b] = pts[(scene == b) & valid].min(0)
    idx3 = np.floor((pts - origins[scene]) / edge).astype(np.int64)
    keys = {}
    p2k = np.zeros(P, np.int64)
    for i in range(P):
        if not valid[i]:
            p2k[i] = -1
            continue
        k = (scene[i], *idx3[i])
        keys.setdefault(k, len(keys))
        p2k[i] = hash(k)

    n_anchors = int(np.asarray(vg.anchor_valid).sum())
    assert n_anchors == len(keys)

    # same-voxel points map to the same anchor; different voxels differ
    p2a = np.asarray(vg.point2anchor)
    for i in range(0, P, 17):
        for j in range(0, P, 29):
            if valid[i] and valid[j]:
                same = (scene[i] == scene[j]) and (idx3[i] == idx3[j]).all()
                assert (p2a[i] == p2a[j]) == same
    # invalid points land in the dump slot
    assert (p2a[~valid] == 512).all()

    # anchor centers are voxel centers containing their member points
    centers = np.asarray(vg.anchor_center)
    avalid = np.asarray(vg.anchor_valid)
    for i in range(0, P, 13):
        if valid[i]:
            a = p2a[i]
            assert avalid[a]
            assert np.all(np.abs(pts[i] - centers[a]) <= edge / 2 + 1e-5)


def test_scatter_to_dense(rng):
    P, B = 64, 2
    pts = rng.uniform(0, 0.5, size=(P, 3)).astype(np.float32)
    scene = (np.arange(P) % B).astype(np.int32)
    valid = np.ones(P, bool)
    gs = (8, 8, 8)
    vg = V.voxelize(jnp.array(pts), jnp.array(scene), jnp.array(valid), 0.1,
                    gs, max_anchors=128, n_scenes=B)
    feats = rng.normal(size=(128, 4)).astype(np.float32)
    dense, occ = V.scatter_anchors_to_dense(jnp.array(feats), vg, gs, B)
    assert dense.shape == (B, 8, 8, 8, 4)
    # every valid anchor's feature is found at its cell
    a3 = np.asarray(vg.anchor_idx3)
    asc = np.asarray(vg.anchor_scene)
    av = np.asarray(vg.anchor_valid)
    d = np.asarray(dense)
    o = np.asarray(occ)
    for a in range(128):
        if av[a]:
            np.testing.assert_allclose(d[asc[a], a3[a, 0], a3[a, 1], a3[a, 2]],
                                       feats[a], rtol=1e-6)
            assert o[asc[a], a3[a, 0], a3[a, 1], a3[a, 2], 0] == 1.0
    assert o.sum() == av.sum()


def test_voxelize_overflow_goes_to_dump(rng):
    P = 100
    pts = rng.uniform(0, 1.0, size=(P, 3)).astype(np.float32)
    vg = V.voxelize(jnp.array(pts), jnp.zeros(P, jnp.int32),
                    jnp.ones(P, bool), 0.01, (128, 128, 128), max_anchors=10,
                    n_scenes=1)
    p2a = np.asarray(vg.point2anchor)
    assert (p2a <= 10).all()
    assert int(np.asarray(vg.anchor_valid).sum()) == 10


def test_overflow_counters(rng):
    P = 100
    pts = rng.uniform(0, 1.0, size=(P, 3)).astype(np.float32)
    # tiny voxels: ~every point its own anchor, capacity 10 → overflow
    vg = V.voxelize(jnp.array(pts), jnp.zeros(P, jnp.int32),
                    jnp.ones(P, bool), 0.01, (128, 128, 128), max_anchors=10,
                    n_scenes=1)
    assert int(vg.n_out_of_grid) == 0
    assert int(vg.n_overflow) == P - 10

    # grid too small: points past the grid from the bbox-min origin drop
    vg2 = V.voxelize(jnp.array(pts), jnp.zeros(P, jnp.int32),
                     jnp.ones(P, bool), 0.1, (4, 4, 4), max_anchors=512,
                     n_scenes=1)
    expect_oog = int((np.floor((pts - pts.min(0)) / 0.1) >= 4).any(1).sum())
    assert int(vg2.n_out_of_grid) == expect_oog > 0
    assert int(vg2.n_overflow) == 0

    # roomy grid: nothing dropped
    vg3 = V.voxelize(jnp.array(pts), jnp.zeros(P, jnp.int32),
                     jnp.ones(P, bool), 0.1, (16, 16, 16), max_anchors=512,
                     n_scenes=1)
    assert int(vg3.n_out_of_grid) == 0 and int(vg3.n_overflow) == 0
