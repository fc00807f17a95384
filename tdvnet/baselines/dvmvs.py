"""DVMVS baseline family: real-time MVS — `pairnet` (feedforward) and
`fusionnet` (ConvLSTM temporal fusion with pose-warped hidden state).

TPU-native counterpart of `mv3d/baselines/dvmvs/` (1,462 LoC torch):
- dot-product plane-sweep cost volume over 64 inverse-depth planes in
  [0.25, 20] m at half resolution on FPN features
  (`utils.calculate_cost_volume_by_warping`, `utils.py:45-115`) —
  vectorized over planes/sources instead of the reference's python loops;
- hourglass cost-volume encoder/decoder over 5 scales with sigmoid
  inverse-depth heads (`fusionnet/model.py:167-305`, hyper_channels=32);
- `MVSLayernormConvLSTMCell` with hidden-state warping into the current
  view and celu activations (`convlstm.py:7-71`);
- the keyframe recurrence runs as one `lax.scan` over the padded sequence
  (the reference loops frames in python, `eval-fusionnet.py:58-118`);
  previous-depth transfer uses a z-buffered forward splat (segment-min).

Shares the MnasMulti backbone + FPN modules with the flagship.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tdvnet.models.backbone import MnasMulti
from tdvnet.models.fpn import FPN
from tdvnet.ops import camera
from tdvnet.ops.sampling import bilinear_sample_batched, resize_nearest

MIN_DEPTH = 0.25
MAX_DEPTH = 20.0
N_PLANES = 64
HYPER = 32
FPN_CH = 32


def dot_cost_volume(ref_feat, src_feats, src_mask, ref_cam, src_cams):
    """Dot-product cost volume at feature (half) resolution.

    ref_feat: [h, w, C]; src_feats: [S, h, w, C]; ref_cam = (R, t, K_half);
    src_cams = (R [S,3,3], t [S,3], K_half [S,3,3]).  Returns [h, w, D].
    """
    R_r, t_r, K_r = ref_cam
    R_s, t_s, K_s = src_cams
    h, w, C = ref_feat.shape
    idepths = jnp.linspace(1.0 / MAX_DEPTH, 1.0 / MIN_DEPTH, N_PLANES)
    depths = 1.0 / idepths
    grid = camera.build_img_grid((h, w), (h, w))
    rays = jnp.einsum("ij,pj->pi", jnp.linalg.inv(K_r), grid,
                      precision=jax.lax.Precision.HIGHEST)
    rays_w = jnp.einsum("ji,pj->pi", R_r, rays,
                        precision=jax.lax.Precision.HIGHEST)
    center = camera.camera_center(R_r, t_r)
    pts = center[None, None] + rays_w[None] * depths[:, None, None]
    pts = pts.reshape(1, -1, 3)                              # [1, D*h*w, 3]

    P_src = camera.projection_matrix(K_s, R_s, t_s)
    S = P_src.shape[0]
    xy, _ = camera.project_points(jnp.broadcast_to(pts, (S, pts.shape[1], 3)),
                                  P_src)
    warped = bilinear_sample_batched(src_feats, xy)           # [S, DHW, C]
    ref_rep = jnp.tile(ref_feat.reshape(1, h * w, C), (1, N_PLANES, 1))
    corr = jnp.sum(warped * ref_rep, axis=-1) / C             # [S, DHW]
    m = src_mask.astype(jnp.float32)[:, None]
    cost = jnp.sum(corr * m, axis=0) / jnp.maximum(jnp.sum(m), 1.0)
    return cost.reshape(N_PLANES, h, w).transpose(1, 2, 0)


class _ConvBR(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    bn_relu: bool = True

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    (self.stride, self.stride), "SAME",
                    use_bias=not self.bn_relu)(x)
        if self.bn_relu:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
            x = nn.relu(x)
        return x


class _EncoderBlock(nn.Module):
    features: int
    kernel: int

    @nn.compact
    def __call__(self, x, train=False):
        x = _ConvBR(self.features, self.kernel, 2)(x, train)
        x = _ConvBR(self.features, self.kernel, 1)(x, train)
        return x


class CostVolumeEncoder(nn.Module):
    @nn.compact
    def __call__(self, half, quarter, eighth, sixteenth, cost, train=False):
        inp0 = _ConvBR(HYPER, 5)(jnp.concatenate([half, cost], -1), train)
        out0 = _EncoderBlock(HYPER * 2, 5)(inp0, train)
        inp1 = _ConvBR(HYPER * 2, 3)(jnp.concatenate([quarter, out0], -1),
                                     train)
        out1 = _EncoderBlock(HYPER * 4, 3)(inp1, train)
        inp2 = _ConvBR(HYPER * 4, 3)(jnp.concatenate([eighth, out1], -1),
                                     train)
        out2 = _EncoderBlock(HYPER * 8, 3)(inp2, train)
        inp3 = _ConvBR(HYPER * 8, 3)(jnp.concatenate([sixteenth, out2], -1),
                                     train)
        out3 = _EncoderBlock(HYPER * 16, 3)(inp3, train)
        return inp0, inp1, inp2, inp3, out3


class _DecoderBlock(nn.Module):
    features: int
    kernel: int
    plus_one: bool

    @nn.compact
    def __call__(self, x, skip, depth, train=False):
        x = resize_nearest(x.transpose(0, 3, 1, 2),
                           skip.shape[1:3]).transpose(0, 2, 3, 1)
        x = _ConvBR(self.features, self.kernel)(x, train)
        cats = [x, skip]
        if self.plus_one and depth is not None:
            cats.append(depth)
        x = _ConvBR(self.features, self.kernel)(jnp.concatenate(cats, -1),
                                                train)
        x = _ConvBR(self.features, self.kernel)(x, train)
        return x


class CostVolumeDecoder(nn.Module):
    @nn.compact
    def __call__(self, image, skip0, skip1, skip2, skip3, bottom,
                 train=False):
        inv_base = 1.0 / MAX_DEPTH
        inv_mult = 1.0 / MIN_DEPTH - 1.0 / MAX_DEPTH
        head = lambda f: nn.sigmoid(nn.Conv(1, (3, 3), padding="SAME")(f))

        d1 = _DecoderBlock(HYPER * 8, 3, False)(bottom, skip3, None, train)
        s16 = head(d1)
        d2 = _DecoderBlock(HYPER * 4, 3, True)(
            d1, skip2, resize_nearest(s16.transpose(0, 3, 1, 2),
                                      skip2.shape[1:3]).transpose(0, 2, 3, 1),
            train)
        s8 = head(d2)
        d3 = _DecoderBlock(HYPER * 2, 3, True)(
            d2, skip1, resize_nearest(s8.transpose(0, 3, 1, 2),
                                      skip1.shape[1:3]).transpose(0, 2, 3, 1),
            train)
        s4 = head(d3)
        d4 = _DecoderBlock(HYPER, 5, True)(
            d3, skip0, resize_nearest(s4.transpose(0, 3, 1, 2),
                                      skip0.shape[1:3]).transpose(0, 2, 3, 1),
            train)
        s2 = head(d4)

        full_hw = image.shape[1:3]
        up = lambda z: resize_nearest(z.transpose(0, 3, 1, 2),
                                      full_hw).transpose(0, 2, 3, 1)
        comb = jnp.concatenate([up(d4), up(s2), image], -1)
        comb = _ConvBR(HYPER, 5)(comb, train)
        comb = _ConvBR(HYPER, 5)(comb, train)
        s1 = head(comb)

        to_depth = lambda s: 1.0 / (inv_mult * s[..., 0] + inv_base)
        return (to_depth(s1), to_depth(s2), to_depth(s4), to_depth(s8),
                to_depth(s16))


class ConvLSTMCell(nn.Module):
    """Layernorm ConvLSTM with celu activation (`convlstm.py:7-71`)."""

    hidden: int = HYPER * 16

    @nn.compact
    def __call__(self, x, h, c):
        y = nn.Conv(4 * self.hidden, (3, 3), padding="SAME",
                    use_bias=False)(jnp.concatenate([x, h], -1))
        ci, cf, co, cg = jnp.split(y, 4, axis=-1)
        ln = lambda z: (z - z.mean((1, 2), keepdims=True)) \
            / jnp.sqrt(z.var((1, 2), keepdims=True) + 1e-5)
        i = nn.sigmoid(ci)
        f = nn.sigmoid(cf)
        o = nn.sigmoid(co)
        g = nn.celu(ln(cg))
        c_next = ln(f * c + i * g)
        h_next = o * nn.celu(c_next)
        return h_next, c_next


def warp_hidden_state(h, depth_est, K_small, R_cur, t_cur, R_prev, t_prev):
    """Inverse-warp the previous hidden state into the current view using the
    current depth estimate (kornia `warp_frame_depth` counterpart)."""
    hh, ww, C = h.shape
    pts = camera.backproject_grid(depth_est[None], K_small[None], R_cur[None],
                                  t_cur[None], (hh, ww))      # [1, P, 3]
    P_prev = camera.projection_matrix(K_small[None], R_prev[None],
                                      t_prev[None])
    xy, _ = camera.project_points(pts, P_prev)
    warped = bilinear_sample_batched(h[None], xy)[0]
    valid = (depth_est > 0.01).reshape(-1, 1)
    return jnp.where(valid, warped, 0.0).reshape(hh, ww, C)


def forward_splat_depth(prev_depth, R_prev, t_prev, R_cur, t_cur, K,
                        out_hw):
    """Z-buffered forward projection of a previous depth map into the
    current view (counterpart of DVMVS's non-differentiable rectangle depth
    estimation) via segment-min over target pixels."""
    h, w = prev_depth.shape
    H, W = out_hw
    pts = camera.backproject_grid(prev_depth[None], K[None], R_prev[None],
                                  t_prev[None], (h, w))[0]
    P_cur = camera.projection_matrix(K[None], R_cur[None], t_cur[None])[0]
    xyz = jnp.einsum("ij,pj->pi", P_cur[:, :3], pts,
                     precision=jax.lax.Precision.HIGHEST) + P_cur[:, 3]
    z = xyz[:, 2]
    xi = jnp.round(xyz[:, 0] / jnp.maximum(z, 1e-6)).astype(jnp.int32)
    yi = jnp.round(xyz[:, 1] / jnp.maximum(z, 1e-6)).astype(jnp.int32)
    ok = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H) & (z > 0.01) \
        & (prev_depth.reshape(-1) > 0)
    seg = jnp.where(ok, yi * W + xi, H * W)
    zbuf = jax.ops.segment_min(jnp.where(ok, z, jnp.inf), seg,
                               num_segments=H * W + 1)[:H * W]
    return jnp.where(jnp.isfinite(zbuf), zbuf, 0.0).reshape(H, W)


class PairNet(nn.Module):
    """Feedforward DVMVS variant (`baselines/dvmvs/pairnet`)."""

    def setup(self):
        self.backbone = MnasMulti()
        self.fpn = FPN(FPN_CH)
        self.encoder = CostVolumeEncoder()
        self.decoder = CostVolumeDecoder()

    def features(self, images, train=False):
        p = self.fpn(self.backbone(images, train))
        return p[0], p[1], p[2], p[3]

    def __call__(self, images, rotmats, tvecs, K, ref_idx, src_idx, src_mask,
                 train: bool = False):
        """images [N,H,W,3]; tables as in FrameBatch.  Returns depth pyramid
        (full..1/16) for the R ref views."""
        half, quarter, eighth, sixteenth = self.features(images, train)
        # K*0.5 for half-res matches the reference's own approximation
        # (dvmvs utils pose/K scaling); the exact half-res principal point
        # would be (c+0.5)*0.5-0.5, a -0.25 px offset kept for parity.
        K_half = K.at[:, 0:2, :].multiply(0.5)
        cost = jax.vmap(
            lambda r, s, m: dot_cost_volume(
                half[r], half[s], m, (rotmats[r], tvecs[r], K_half[r]),
                (rotmats[s], tvecs[s], K_half[s]))
        )(ref_idx, src_idx, src_mask)
        skips = self.encoder(half[ref_idx], quarter[ref_idx], eighth[ref_idx],
                             sixteenth[ref_idx], cost, train)
        return self.decoder(images[ref_idx], *skips, train)


class FusionNet(nn.Module):
    """ConvLSTM DVMVS variant (`baselines/dvmvs/fusionnet`)."""

    def setup(self):
        self.backbone = MnasMulti()
        self.fpn = FPN(FPN_CH)
        self.encoder = CostVolumeEncoder()
        self.lstm = ConvLSTMCell(HYPER * 16)
        self.decoder = CostVolumeDecoder()

    def features(self, images, train=False):
        p = self.fpn(self.backbone(images, train))
        return p[0], p[1], p[2], p[3]

    def step(self, carry, images, rotmats, tvecs, K, r_idx, s_idx, s_mask,
             valid, train: bool = False):
        """One keyframe of the recurrence.  carry = (h, c, prev_R, prev_t,
        prev_depth_full, has_prev)."""
        h_s, c_s, pR, pt, p_depth, has_prev = carry
        H, W = images.shape[1:3]
        half, quarter, eighth, sixteenth = self.features(
            images[jnp.concatenate([r_idx[None], s_idx])], train)
        ref_half = half[0]
        srcs = half[1:]
        K_half = K.at[:, 0:2, :].multiply(0.5)
        cost = dot_cost_volume(
            ref_half, srcs, s_mask,
            (rotmats[r_idx], tvecs[r_idx], K_half[r_idx]),
            (rotmats[s_idx], tvecs[s_idx], K_half[s_idx]))
        skips = self.encoder(ref_half[None], quarter[:1], eighth[:1],
                             sixteenth[:1], cost[None], train)
        bottom = skips[4][0]
        hh, ww = bottom.shape[:2]
        K32 = K[r_idx].at[0:2, :].multiply(1.0 / 32.0)

        # previous-depth transfer at 1/16 → down to 1/32
        d_est16 = forward_splat_depth(p_depth, pR, pt, rotmats[r_idx],
                                      tvecs[r_idx],
                                      K[r_idx].at[0:2, :].multiply(1.0 / 16.0),
                                      (H // 16, W // 16))
        d_est = resize_nearest(d_est16, (hh, ww))
        d_est = jnp.where(has_prev > 0, d_est, 0.0)

        h_warp = jax.lax.cond(
            has_prev > 0,
            lambda: warp_hidden_state(h_s, d_est, K32, rotmats[r_idx],
                                      tvecs[r_idx], pR, pt),
            lambda: h_s)
        h_n, c_n = self.lstm(bottom[None], h_warp[None], c_s[None])
        depths = self.decoder(images[r_idx][None], skips[0], skips[1],
                              skips[2], skips[3], h_n, train)
        depth_full = depths[0][0]
        new_carry = (h_n[0], c_n[0], rotmats[r_idx], tvecs[r_idx],
                     depth_full * valid, jnp.maximum(has_prev, valid))
        return new_carry, depth_full


# ------------------------------------------------------------- harness glue
def _local_tables(n_imgs: int, r0: int, r1: int, k: int, chunk: int):
    """Local-window index tables for refs [r0, r1) (images [r0, r1+2k))."""
    ref_idx = np.arange(chunk, dtype=np.int32) + k
    src = ref_idx[:, None] + np.arange(-k, k + 1, dtype=np.int32)[None]
    keep = np.arange(-k, k + 1) != 0
    src = src[:, keep]                       # exclude the ref itself
    valid_ref = np.arange(chunk) < (r1 - r0)
    src_global = src + r0 - k
    src_mask = valid_ref[:, None] & (src_global >= 0) \
        & (src_global < n_imgs)
    return (jnp.asarray(ref_idx), jnp.asarray(np.clip(src, 0, chunk + 2 * k - 1)),
            jnp.asarray(src_mask), valid_ref)


def init_pairnet(rng, img_size=(256, 320), chunk: int = 4, k: int = 2):
    model = PairNet()
    H, W = img_size
    n = chunk + 2 * k
    ri, si, sm, _ = _local_tables(n, 0, chunk, k, chunk)
    variables = jax.jit(lambda r: model.init(
        r, jnp.zeros((n, H, W, 3)), jnp.tile(jnp.eye(3), (n, 1, 1)),
        jnp.zeros((n, 3)), jnp.tile(jnp.eye(3), (n, 1, 1)), ri, si, sm,
        False))(rng)
    return model, variables


def make_pairnet_pred_fn(model: PairNet, variables, chunk: int = 8):
    @jax.jit
    def run(variables, images, rotmats, tvecs, K, ri, si, sm):
        depths = model.apply(variables, images, rotmats, tvecs, K, ri, si,
                             sm, False)
        return depths[0]

    def pred_fn(views, scene_dir, dset):
        k = dset.k
        n = views["images"].shape[0]
        R_total = n - 2 * k
        outs = []
        for r0 in range(0, R_total, chunk):
            r1 = min(r0 + chunk, R_total)
            ri, si, sm, valid = _local_tables(n, r0, r1, k, chunk)
            sl = slice(r0, r0 + chunk + 2 * k)

            def pad(a):
                x = a[sl]
                need = chunk + 2 * k - x.shape[0]
                if need:
                    x = np.concatenate([x, np.repeat(x[-1:], need, 0)], 0)
                return jnp.asarray(x)

            d = run(variables, pad(views["images"]), pad(views["rotmats"]),
                    pad(views["tvecs"]), pad(views["K"]), ri, si, sm)
            outs.append(np.asarray(d[:r1 - r0]))
        return np.concatenate(outs, axis=0)

    return pred_fn


def init_fusionnet(rng, img_size=(256, 320), k: int = 2):
    model = FusionNet()
    H, W = img_size
    n = 1 + 2 * k
    carry = _init_carry(img_size)
    variables = jax.jit(lambda r: model.init(
        r, carry, jnp.zeros((n, H, W, 3)), jnp.tile(jnp.eye(3), (n, 1, 1)),
        jnp.zeros((n, 3)), jnp.tile(jnp.eye(3), (n, 1, 1)),
        jnp.int32(k), jnp.asarray([0, 1, 3, 4] if k == 2 else
                                  list(range(k)) + list(range(k + 1, n)),
                     jnp.int32),
        jnp.ones(2 * k, bool), jnp.float32(1.0), False,
    method="step"))(rng)
    return model, variables


def _init_carry(img_size):
    H, W = img_size
    hh, ww = -(-H // 32), -(-W // 32)
    hid = HYPER * 16
    return (jnp.zeros((hh, ww, hid)), jnp.zeros((hh, ww, hid)),
            jnp.eye(3), jnp.zeros(3), jnp.zeros((H, W)), jnp.float32(0.0))


def make_fusionnet_pred_fn(model: FusionNet, variables, img_size=(256, 320)):
    """Sequential keyframe recurrence: one jitted step, python-looped (the
    step compiles once; dispatch per frame is sub-ms)."""

    @jax.jit
    def step(variables, carry, images, rotmats, tvecs, K, r_idx, s_idx,
             s_mask, valid):
        return model.apply(variables, carry, images, rotmats, tvecs, K,
                           r_idx, s_idx, s_mask, valid, False, method="step")

    def pred_fn(views, scene_dir, dset):
        k = dset.k
        n = views["images"].shape[0]
        R_total = n - 2 * k
        carry = _init_carry(img_size)
        win = 1 + 2 * k
        outs = []
        for r in range(k, n - k):
            idx = np.arange(r - k, r + k + 1)
            imgs = jnp.asarray(views["images"][idx])
            rot = jnp.asarray(views["rotmats"][idx])
            tv = jnp.asarray(views["tvecs"][idx])
            Km = jnp.asarray(views["K"][idx])
            s_local = np.asarray([j for j in range(win) if j != k],
                                 np.int32)
            carry, d = step(variables, carry, imgs, rot, tv, Km,
                            jnp.int32(k), jnp.asarray(s_local),
                            jnp.ones(2 * k, bool), jnp.float32(1.0))
            outs.append(np.asarray(d))
        return np.stack(outs, axis=0)

    return pred_fn
