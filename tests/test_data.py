"""Synthetic scenes, batch collation, frame selectors."""
import numpy as np
import jax.numpy as jnp

from tdvnet.data import batch as B
from tdvnet.data import frameselector as FS
from tdvnet.data import synthetic
from tdvnet.ops import camera


def test_synthetic_scene_multiview_consistent():
    """Back-project GT depth of view 0, reproject into view 1: depths agree."""
    sc = synthetic.make_scene(n_views=3, img_size=(48, 64), seed=1)
    d0 = sc["depth"][0]
    pts = camera.backproject_grid(jnp.array(d0)[None], jnp.array(sc["K"][:1]),
                                  jnp.array(sc["rotmats"][:1]),
                                  jnp.array(sc["tvecs"][:1]), (48, 64))
    P1 = camera.projection_matrix(jnp.array(sc["K"][1:2]),
                                  jnp.array(sc["rotmats"][1:2]),
                                  jnp.array(sc["tvecs"][1:2]))
    xy, z = camera.project_points(pts, P1)
    xy = np.asarray(xy)[0]
    z = np.asarray(z)[0]
    d1 = sc["depth"][1]
    # check in-bounds reprojections: sampled depth ≈ reprojected z
    xi = np.round(xy[:, 0]).astype(int)
    yi = np.round(xy[:, 1]).astype(int)
    ok = (xi >= 1) & (xi < 63) & (yi >= 1) & (yi < 47) & (z > 0.1)
    samp = d1[yi[ok], xi[ok]]
    rel = np.abs(samp - z[ok]) / z[ok]
    # most points should be consistent (occlusion boundaries excluded)
    assert np.median(rel) < 0.02, np.median(rel)


def test_single_scene_views_layout():
    sc = synthetic.make_scene(n_views=5, img_size=(32, 40), seed=0)
    fb = B.single_scene_views(sc["images"], sc["rotmats"], sc["tvecs"],
                              sc["K"], None, n_src_on_either_side=1)
    assert fb.n_imgs == 5 and fb.n_refs == 3
    np.testing.assert_array_equal(np.asarray(fb.ref_idx), [1, 2, 3])
    np.testing.assert_array_equal(np.asarray(fb.src_idx)[0], [0, 1, 2])
    assert np.asarray(fb.src_mask).all()


def test_collate_pads_short_scene():
    s1 = synthetic.make_batch_scene(5, (32, 40), (32, 40), seed=0)
    s2 = synthetic.make_batch_scene(4, (32, 40), (32, 40), seed=1)
    fb = B.collate_scenes([s1, s2], n_views=5, n_ref=3,
                          n_src_on_either_side=1)
    assert fb.n_imgs == 10 and fb.n_refs == 6 and fb.n_scenes == 2
    m = np.asarray(fb.img_mask)
    assert m[:5].all() and m[5:9].all() and not m[9]
    rm = np.asarray(fb.ref_mask)
    assert rm[:3].all() and rm[3:5].all() and not rm[5]
    # scene 2 ref slots index into scene-2 image range
    si = np.asarray(fb.src_idx)
    assert (si[3:5] >= 5).all() and (si[3:5] < 9).all()
    # roundtrip npz
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "b.npz")
        fb.save_npz(p)
        fb2 = B.FrameBatch.load_npz(p)
        np.testing.assert_allclose(np.asarray(fb2.images), np.asarray(fb.images))
        assert fb2.n_scenes == 2


def _circle_poses(n, step=0.1):
    poses = []
    for i in range(n):
        p = np.eye(4, dtype=np.float32)
        p[:3, 3] = [i * step, 0, 0]
        poses.append(p)
    return np.stack(poses)


def test_pose_distance_translation_only():
    poses = _circle_poses(5, step=0.2)
    d = FS.pose_distances(poses[0], poses)
    np.testing.assert_allclose(d, [0, 0.2, 0.4, 0.6, 0.8], atol=1e-5)


def test_next_pose_dist_selector():
    poses = _circle_poses(100, step=0.05)
    sel = FS.NextPoseDistSelector(p_thresh=0.1, search_interval=20)
    idx = sel.select_frames(poses, 10, seed_idx=0)
    # 0.1 threshold at 0.05 steps → every 2nd frame (fp rounding may make a
    # boundary distance land a hair under threshold → occasionally 3)
    steps = np.diff(idx)
    assert ((steps >= 2) & (steps <= 3)).all() and steps.mean() < 2.5


def test_best_pose_dist_selector():
    poses = _circle_poses(100, step=0.05)
    sel = FS.BestPoseDistSelector(p_opt=0.225, search_interval=20)
    idx = sel.select_frames(poses, 5, seed_idx=0)
    # closest multiple of 0.05 to 0.225 is 4 or 5 steps (0.2 / 0.25 tie → first)
    assert (np.diff(idx) >= 4).all() and (np.diff(idx) <= 5).all()


def test_range_selector_within_range():
    poses = _circle_poses(200, step=0.05)
    sel = FS.RangePoseDistSelector(0.125, 0.325, 20,
                                   rng=np.random.default_rng(0))
    idx = sel.select_frames(poses, 8, seed_idx=0)
    steps = np.diff(idx)
    assert ((steps >= 3) & (steps <= 6)).all()  # 0.15..0.30 at 0.05/frame


def test_every_nth_selector():
    poses = _circle_poses(50)
    sel = FS.EveryNthSelector(5)
    idx = sel.select_frames(poses, 4, seed_idx=3)
    np.testing.assert_array_equal(idx, [3, 8, 13, 18])
