"""Reconstruction stack integration: fusion → TSDF → mesh → raster → metrics
on the synthetic box scene (analytic ground truth)."""
import numpy as np
import pytest

from tdvnet.data import synthetic
from tdvnet.ops import fusion, marching, ply, pointcloud, raster, tsdf
from tdvnet.eval import metrics3d


@pytest.fixture(scope="module")
def scene():
    return synthetic.make_scene(n_views=12, img_size=(60, 80), seed=3,
                                normalize=False)


def _projections(sc):
    P = np.einsum("nij,njk->nik", sc["K"],
                  np.concatenate([sc["rotmats"], sc["tvecs"][..., None]],
                                 axis=2))
    return P.astype(np.float32)


def test_pc_fusion_points_on_surface(scene):
    imgs = (scene["images"] * 255).astype(np.uint8)
    pts, rgb = fusion.fuse_point_cloud(scene["depth"], imgs,
                                       scene["rotmats"], scene["tvecs"],
                                       scene["K"], z_thresh=0.02,
                                       n_consistent=2, ref_chunk=6)
    assert pts.shape[0] > 1000, pts.shape
    assert rgb.shape == pts.shape
    # every fused point must be on the box surface (within a tolerance):
    # walls at +-2 in x/y, floor 0 / ceiling 2.6 in z
    d_wall = np.minimum.reduce([
        np.abs(pts[:, 0] - 2), np.abs(pts[:, 0] + 2),
        np.abs(pts[:, 1] - 2), np.abs(pts[:, 1] + 2),
        np.abs(pts[:, 2] - 0), np.abs(pts[:, 2] - 2.6)])
    assert np.quantile(d_wall, 0.95) < 0.02, np.quantile(d_wall, 0.95)


def test_tsdf_mesh_roundtrip(scene):
    P = _projections(scene)
    colors = (scene["images"] * 255).astype(np.float32)
    vol = tsdf.fuse_scene(scene["depth"], colors, P, voxel_size=0.05,
                          margin=0.3, frame_batch=6)
    verts, faces = marching.tsdf_to_mesh(vol)
    assert verts.shape[0] > 500 and faces.shape[0] > 500
    # mesh vertices lie near the box surface
    d_wall = np.minimum.reduce([
        np.abs(verts[:, 0] - 2), np.abs(verts[:, 0] + 2),
        np.abs(verts[:, 1] - 2), np.abs(verts[:, 1] + 2),
        np.abs(verts[:, 2] - 0), np.abs(verts[:, 2] - 2.6)])
    assert np.quantile(d_wall, 0.9) < 0.06, np.quantile(d_wall, 0.9)

    # render the mesh back into view 0: depth should match GT where defined
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = scene["rotmats"][0]
    pose[:3, 3] = scene["tvecs"][0]
    d = raster.render_depth(verts, faces, scene["K"][0], pose, (60, 80))
    gt = scene["depth"][0]
    both = (d > 0) & (gt > 0)
    assert both.mean() > 0.7, both.mean()
    err = np.abs(d[both] - gt[both])
    assert np.median(err) < 0.05, np.median(err)


def test_ply_roundtrip(tmp_path, scene):
    verts = np.random.default_rng(0).normal(size=(50, 3)).astype(np.float32)
    faces = np.random.default_rng(1).integers(0, 50, size=(30, 3)).astype(np.int32)
    cols = np.random.default_rng(2).integers(0, 255, size=(50, 3)).astype(np.uint8)
    p = str(tmp_path / "m.ply")
    ply.write_ply(p, verts, faces, cols)
    v2, f2, c2 = ply.read_ply(p)
    np.testing.assert_allclose(v2, verts, rtol=1e-6)
    np.testing.assert_array_equal(f2, faces)
    np.testing.assert_array_equal(c2, cols)


def test_voxel_downsample():
    pts = np.array([[0.01, 0.01, 0.01], [0.02, 0.02, 0.02],
                    [0.5, 0.5, 0.5]], np.float32)
    out = pointcloud.voxel_downsample(pts, 0.1)
    assert out.shape == (2, 3)
    np.testing.assert_allclose(out[0], [0.015, 0.015, 0.015], atol=1e-6)


def test_fscore_identical_clouds(scene):
    pts = np.random.default_rng(0).normal(size=(500, 3)).astype(np.float32)
    m = metrics3d.eval_point_clouds(pts, pts, 0.05)
    assert m["fscore"] == pytest.approx(1.0, abs=1e-6)
    assert m["acc"] == pytest.approx(0.0, abs=1e-7)
    # shifted cloud far beyond threshold → zero fscore
    m2 = metrics3d.eval_point_clouds(pts, pts + 100.0, 0.05)
    assert m2["fscore"] < 1e-6


def test_marching_tetrahedra_sphere():
    # implicit sphere radius 5 in a 16^3 grid
    g = np.stack(np.meshgrid(*[np.arange(16)] * 3, indexing="ij"), -1)
    vol = (np.linalg.norm(g - 7.5, axis=-1) - 5.0).astype(np.float32)
    verts, faces = marching.marching_tetrahedra(vol, 0.0)
    r = np.linalg.norm(verts - 7.5, axis=1)
    assert verts.shape[0] > 100
    np.testing.assert_allclose(r.mean(), 5.0, atol=0.1)
    assert np.abs(r - 5.0).max() < 0.35


def test_visualizer_contact_sheet(tmp_path, scene):
    """Turntable PNG comparison sheet from mesh artifacts."""
    from tdvnet.eval import visualizer
    from tdvnet.ops import marching, ply, tsdf

    P = _projections(scene)
    colors = (scene["images"] * 255).astype(np.float32)
    vol = tsdf.fuse_scene(scene["depth"], colors, P, voxel_size=0.08,
                          margin=0.3, frame_batch=6)
    verts, faces = marching.tsdf_to_mesh(vol)
    mesh_path = str(tmp_path / "mesh.ply")
    ply.write_ply(mesh_path, verts, faces)

    out = visualizer.compare_methods(
        "scene", {"methodA": mesh_path, "methodB": mesh_path},
        str(tmp_path / "sheet.png"), img_size=(120, 160))
    assert out is not None
    import os

    assert os.path.getsize(out) > 5000
