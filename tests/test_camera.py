"""Geometry round-trip identities (SURVEY §7.2 step 1 exit criterion)."""
import numpy as np
import jax.numpy as jnp
import pytest

from tdvnet.ops import camera


def random_pose(rng):
    """Random world→cam rotation + translation."""
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    t = rng.normal(size=3) * 0.5
    return Q.astype(np.float32), t.astype(np.float32)


def make_K(H=64, W=80):
    return np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]], np.float32)


def test_backproject_project_roundtrip(rng):
    H, W = 64, 80
    h, w = 16, 20
    K = make_K(H, W)
    R, t = random_pose(rng)
    depth = rng.uniform(1.0, 4.0, size=(1, h, w)).astype(np.float32)

    pts = camera.backproject_grid(jnp.array(depth), jnp.array(K)[None],
                                  jnp.array(R)[None], jnp.array(t)[None], (H, W))
    P = camera.projection_matrix(jnp.array(K)[None], jnp.array(R)[None],
                                 jnp.array(t)[None])
    xy, z = camera.project_points(pts, P)

    # reprojected depth equals input depth
    np.testing.assert_allclose(np.asarray(z).reshape(h, w), depth[0], rtol=1e-4)
    # reprojected pixels equal the source grid
    grid = np.asarray(camera.build_img_grid((H, W), (h, w)))[:, :2]
    np.testing.assert_allclose(np.asarray(xy)[0], grid, rtol=1e-3, atol=1e-2)


def test_plane_sweep_depths(rng):
    H, W = 64, 80
    K = make_K(H, W)
    R, t = random_pose(rng)
    d0, di, D = 0.5, 0.25, 8
    pts = camera.plane_sweep_points(d0, di, D, jnp.array(R)[None],
                                    jnp.array(t)[None], jnp.array(K)[None],
                                    (H, W), (4, 5))
    # project back into the same camera: z must equal the plane depths
    P = camera.projection_matrix(jnp.array(K)[None], jnp.array(R)[None],
                                 jnp.array(t)[None])
    _, z = camera.project_points(pts, P)
    z = np.asarray(z).reshape(D, 20)
    expect = d0 + di * np.arange(D)
    np.testing.assert_allclose(z, np.repeat(expect[:, None], 20, 1), rtol=1e-4)


def test_world_to_cam_inverts_pose(rng):
    R, t = random_pose(rng)
    # build cam→world pose from (R, t)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = R.T
    pose[:3, 3] = -R.T @ t
    R2, t2 = camera.world_to_cam(jnp.array(pose))
    np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t2), t, atol=1e-5)


def test_camera_center(rng):
    R, t = random_pose(rng)
    c = camera.camera_center(jnp.array(R), jnp.array(t))
    # projecting the center gives z=0; R c + t = 0
    np.testing.assert_allclose(np.asarray(R @ np.asarray(c) + t), np.zeros(3),
                               atol=1e-5)


def test_build_img_grid_corners():
    g = np.asarray(camera.build_img_grid((64, 80), (16, 20)))
    assert g.shape == (320, 3)
    np.testing.assert_allclose(g[0], [0, 0, 1])
    np.testing.assert_allclose(g[-1], [79, 63, 1])
