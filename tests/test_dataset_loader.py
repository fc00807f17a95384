"""`info.json` Dataset loader on a synthetic on-disk scene: preprocessing
contract, depth rescale, pose conversion, augmentation, GT mesh generation."""
import json
import os

import numpy as np
import pytest

from tdvnet.data.dataset import Dataset, compute_crop_and_intrinsics
from tdvnet.data.frameselector import EveryNthSelector


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    from tools.make_synthetic_dataset import make_scene_dir

    root = str(tmp_path_factory.mktemp("ds"))
    return make_scene_dir(root, "scene0", n_views=8, hw=(60, 80), seed=5)


def test_load_views_roundtrip(scene_dir):
    dset = Dataset([scene_dir], EveryNthSelector(1), n_ref_imgs=4,
                   depth_img_size=(60, 80), img_size=(60, 80), augment=False,
                   n_src_on_either_side=1)
    v = dset.load_views(0, seed_idx=0)
    assert v["images"].shape == (6, 60, 80, 3)
    assert v["depth"].shape == (6, 60, 80)
    # depth round-trips the 16-bit mm encoding
    assert 0.3 < np.median(v["depth"][v["depth"] > 0]) < 10
    # R is orthonormal and R = pose[:3,:3]^T
    R = v["rotmats"][0]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    pose = v["poses"][0]
    np.testing.assert_allclose(R, pose[:3, :3].T, atol=1e-6)
    # t = -R c
    np.testing.assert_allclose(v["tvecs"][0], -R @ pose[:3, 3], atol=1e-5)


def test_augmentation_preserves_geometry(scene_dir):
    """Scaled+rotated scene must still back-project consistently: the world
    changes but depth(x)/||c1-c2|| ratios are preserved."""
    dset = Dataset([scene_dir], EveryNthSelector(1), n_ref_imgs=4,
                   depth_img_size=(60, 80), img_size=(60, 80), augment=True,
                   n_src_on_either_side=1,
                   rng=np.random.default_rng(3))
    v0 = Dataset([scene_dir], EveryNthSelector(1), n_ref_imgs=4,
                 depth_img_size=(60, 80), img_size=(60, 80), augment=False,
                 n_src_on_either_side=1).load_views(0, seed_idx=0)
    v1 = dset.load_views(0, seed_idx=0)
    from tdvnet.ops import camera
    import jax.numpy as jnp

    def c(v, i):
        return np.asarray(camera.camera_center(jnp.asarray(v["rotmats"][i]),
                                               jnp.asarray(v["tvecs"][i])))

    base0 = np.linalg.norm(c(v0, 0) - c(v0, 3))
    base1 = np.linalg.norm(c(v1, 0) - c(v1, 3))
    scale = base1 / base0
    assert 0.85 < scale < 1.15
    d0 = np.median(v0["depth"][v0["depth"] > 0])
    d1 = np.median(v1["depth"][v1["depth"] > 0])
    np.testing.assert_allclose(d1 / d0, scale, rtol=1e-3)


def test_crop_intrinsics():
    K = np.array([[100.0, 0, 160], [0, 100.0, 120], [0, 0, 1]], np.float32)
    # no crop: plain rescale
    _, _, K2 = compute_crop_and_intrinsics(K, (240, 320), (120, 160), False)
    np.testing.assert_allclose(K2[0, 0], 50.0)
    np.testing.assert_allclose(K2[1, 1], 50.0)
    # crop to a wider aspect: vertical crop
    cx, cy, K3 = compute_crop_and_intrinsics(K, (240, 320), (100, 200), True)
    assert cx == 0 and cy > 0
    np.testing.assert_allclose(K3[0, 0], K3[1, 1] * (320 / (240 - 2 * cy))
                               / (200 / 100) * (100 / 100), rtol=0.1)


def test_gt_mesh_exists_and_loads(scene_dir):
    from tdvnet.ops import ply

    info = json.load(open(os.path.join(scene_dir, "info.json")))
    verts, faces, _ = ply.read_ply(info["gt_mesh"])
    assert verts.shape[0] > 100 and faces is not None
