"""FastMVSNet Gauss-Newton parity vs the reference's own building blocks.

The reference's `gn_update` is a closure inside `FastMVSNet.forward`
(`mv3d/baselines/fastmvsnet/model.py:147-248`), so it cannot be imported
standalone; this test re-composes it OUT of the reference's own modules
(FeatureFetcher / FeatureGradFetcher / PointGrad / get_pixel_grids —
imported from /root/reference, pure torch) with the exact call pattern of
model.py, and compares the per-pixel GN depth updates with
`tdvnet.baselines.fastmvsnet.gauss_newton_step`.

Exact equality is impossible by construction: the reference computes
feature gradients by 1-pixel central differences of grid_sample
(align_corners=False, half-pixel `get_pixel_grids` centers), while ours
differentiates exact align-corners bilinear sampling with `jax.jvp`.  On
smooth low-frequency features the two agree closely; the test asserts
high correlation and small median deviation of the deltas, plus agreement
of the accept-gate decisions.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests._reference_loader import install_reference_path

torch = pytest.importorskip("torch")

install_reference_path()


def _plane_features(K, rotmats, tvecs, H, W, C, z_plane=3.0):
    """Render a smooth world texture on the plane z=z_plane into each view.

    Multi-view-consistent features give the GN step a real optimum, and
    low frequencies keep central differences close to exact gradients.
    """
    V = K.shape[0]
    rng = np.random.default_rng(7)
    coef = rng.uniform(-1, 1, (C, 4)).astype(np.float32)

    def tex(wx, wy):
        chans = []
        for c in range(C):
            a, b, ph, s = coef[c]
            chans.append(0.3 * a * wx + 0.3 * b * wy
                         + np.sin(0.7 * s * wx + 0.5 * a * wy + 3 * ph))
        return np.stack(chans, -1).astype(np.float32)

    yy, xx = np.meshgrid(np.arange(H, dtype=np.float32),
                         np.arange(W, dtype=np.float32), indexing="ij")
    pix = np.stack([xx, yy, np.ones_like(xx)], -1).reshape(-1, 3)
    feats = []
    for v in range(V):
        rays = pix @ np.linalg.inv(K[v]).T          # cam rays
        rays_w = rays @ rotmats[v]                  # R^T rays
        center = -rotmats[v].T @ tvecs[v]
        s = (z_plane - center[2]) / rays_w[:, 2]
        world = center[None] + s[:, None] * rays_w
        feats.append(tex(world[:, 0], world[:, 1]).reshape(H, W, C))
    return np.stack(feats)


def _reference_gn(features, depth, K, rotmats, tvecs):
    """One reference GN step, composed exactly as model.py:185-248."""
    from mv3d.baselines.fastmvsnet.functions.functions import get_pixel_grids
    from mv3d.baselines.fastmvsnet.utils.feature_fetcher import (
        FeatureFetcher, FeatureGradFetcher, PointGrad)

    V, H, W, C = features.shape
    h, w = depth.shape
    t = lambda x: torch.from_numpy(np.asarray(x, np.float32))
    fm = t(features.transpose(0, 3, 1, 2))[None]          # [1, V, C, H, W]
    Kt = t(K)[None]                                       # [1, V, 3, 3]
    E = t(np.concatenate([rotmats, tvecs[..., None]], 2))[None]

    fetch = FeatureFetcher()
    grad_fetch = FeatureGradFetcher()
    point_grad = PointGrad()

    with torch.no_grad():
        uv = torch.matmul(torch.inverse(Kt[:, 0:1]),
                          get_pixel_grids(h, w).view(1, 1, 3, -1))
        d = t(depth).view(1, 1, 1, -1)
        cam_pts = uv * d
        R_ref_inv = torch.inverse(t(rotmats[0]))[None, None]
        t_ref = t(tvecs[0]).view(1, 1, 3, 1)
        world = torch.matmul(R_ref_inv, cam_pts - t_ref) \
            .transpose(1, 2).contiguous().view(1, 3, -1)

        grad_pts = point_grad(world, Kt, E)               # [1, V, N, 2, 3]
        R = t(rotmats)                                    # [V, 3, 3]
        R_tar_ref = torch.matmul(R, torch.inverse(t(rotmats[0]))[None])
        d_pts_d_d = torch.matmul(
            R_tar_ref[None, :, None], uv.permute(0, 1, 3, 2)[..., None])
        d_uv_d_d = torch.matmul(grad_pts.view(-1, 2, 3),
                                d_pts_d_d.view(-1, 3, 1)) \
            .view(1, V, 1, -1, 2, 1)

        pf, pfg = grad_fetch(fm, world, Kt, E)
        d_uv_d_d_tmp = d_uv_d_d.repeat(1, 1, C, 1, 1, 1)
        J = pfg.view(-1, 1, 2) @ d_uv_d_d_tmp.view(-1, 2, 1)
        J = J.view(1, V, C, -1, 1)[:, 1:].contiguous() \
            .permute(0, 3, 1, 2, 4).contiguous().view(-1, C * (V - 1), 1)

        resid = pf[:, 1:] - pf[:, 0:1]
        first_resid = torch.sum(torch.abs(resid), dim=(1, 2))
        resid = resid.permute(0, 3, 1, 2).contiguous() \
            .view(-1, C * (V - 1), 1)
        J_t = torch.transpose(J, 1, 2)
        Hm = J_t @ J
        b = -J_t @ resid
        delta = (b / (Hm + 1e-6)).view(-1)

        d_new = t(depth).view(-1) + delta
        cam_pts2 = uv * d_new.view(1, 1, 1, -1)
        world2 = torch.matmul(R_ref_inv, cam_pts2 - t_ref) \
            .transpose(1, 2).contiguous().view(1, 3, -1)
        pf2 = fetch(fm, world2, Kt, E)
        second_resid = torch.sum(torch.abs(pf2[:, 1:] - pf2[:, 0:1]),
                                 dim=(1, 2))
        accept = (second_resid < first_resid).view(-1)
        d_final = torch.where(accept, d_new, t(depth).view(-1))
    return (delta.numpy().reshape(h, w),
            accept.numpy().reshape(h, w),
            d_final.numpy().reshape(h, w))


def test_gn_update_matches_reference_composition():
    from tdvnet.baselines.fastmvsnet import gauss_newton_step

    V, C = 3, 4
    H, W = 48, 64
    h, w = H, W                     # depth at feature resolution

    f = 0.8 * W
    K = np.tile(np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]],
                         np.float32), (V, 1, 1))
    rot, tv = [np.eye(3, dtype=np.float32)], [np.zeros(3, np.float32)]
    for i in range(1, V):
        ang = 0.04 * i
        Rz = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                       [-np.sin(ang), 0, np.cos(ang)]], np.float32)
        rot.append(Rz)
        tv.append(np.array([-0.25 * i, 0.02 * i, 0.0], np.float32))
    rotmats, tvecs = np.stack(rot), np.stack(tv)

    Z0 = 3.0
    features = _plane_features(K, rotmats, tvecs, H, W, C, Z0)
    rng = np.random.default_rng(0)
    depth = (Z0 + 0.15 * rng.standard_normal((h, w))).astype(np.float32)

    ref_delta, ref_accept, ref_final = _reference_gn(
        features, depth, K, rotmats, tvecs)

    ours_final = np.asarray(gauss_newton_step(
        jnp.asarray(depth), jnp.asarray(features[0]), jnp.asarray(features),
        jnp.asarray([1, 2]), jnp.asarray([True, True]),
        jnp.asarray(rotmats), jnp.asarray(tvecs), jnp.asarray(K), 0,
        (H, W)))
    ours_delta = ours_final - depth

    # interior pixels where both sides actually moved
    interior = np.zeros((h, w), bool)
    interior[4:-4, 4:-4] = True
    m = interior & (np.abs(ref_delta) > 1e-5) & (np.abs(ours_delta) > 1e-5) \
        & (np.abs(ref_delta) < 1.0) & (np.abs(ours_delta) < 1.0)
    assert m.sum() > 500, m.sum()

    corr = np.corrcoef(ref_delta[m], ours_delta[m])[0, 1]
    assert corr > 0.95, corr
    # measured ~0.28: dominated by the reference's half-pixel sampling
    # convention (get_pixel_grids centers + align_corners=False) vs our
    # align-corners grid — a fixed sub-pixel offset in where the residual
    # is evaluated, not a math difference (corr stays > 0.95 as textures
    # vary)
    med_rel = np.median(np.abs(ours_delta[m] - ref_delta[m])
                        / np.maximum(np.abs(ref_delta[m]), 1e-3))
    assert med_rel < 0.35, med_rel

    # the accept gate exists on both sides and mostly agrees
    ours_gated_off = np.isclose(ours_delta, 0.0, atol=1e-7)
    agree = (ours_gated_off == ~ref_accept)[interior].mean()
    assert agree > 0.8, agree
