"""Convert a full reference PyTorch-Lightning checkpoint to tdvnet weights.

Maps ALL SEVEN reference parameter groups (`mv3d/lightningmodel.py:284-296`:
mvsnet, pointnet, sparse_conv, decoder, refine_quarter/half/full) from a
`.ckpt` / state-dict file onto `ThreeDVNet`'s flax variables and writes the
single-file `.npz` format used by `tools/export_weights.py` /
`tdvnet.train.loop.restore_params`.  This makes restoring the published
3DVNet weights (`mv3d/config.py:44-46`, Google-Drive `.ckpt`) a one-step
job the moment the file is available.

Layout conventions
------------------
- torch Conv2d/3d `[out, in, kh, kw(, kd)]` → flax `[k..., in, out]`.
- torch Conv1d `[out, in, k]` → flax `[k, in, out]`.
- torch Linear `[out, in]` → flax `[in, out]`.
- torch (De)Conv3dTranspose `[in, out, k, k, k]` → flax input-dilated conv
  kernel, spatially FLIPPED (`ConvTransposeUp3d` computes the transpose
  conv as a dilated cross-correlation).
- MinkowskiEngine sparse conv kernels `[K^3, in, out]` → dense
  `[3, 3, 3, in, out]`, assuming ME's region iterator enumerates offsets
  with the FIRST coordinate fastest: index = (dx+1) + 3(dy+1) + 9(dz+1)
  (`--kernel-order zyx` flips this).  ME cannot be installed in this image,
  so the offset order and the stride-2 window alignment (ME windows are
  centered at 2o, XLA SAME windows start at 2o) are documented assumptions
  validated by key/shape-exactness, not by an ME forward — see PARITY.md.

Validation: `tests/test_ckpt_convert.py` builds state dicts from the
*actual reference modules* where they can instantiate on CPU (CostRegNet,
PointNet, HypothesisDecoder, PropagationNet) and checks forward parity of
the converted weights; MnasNet/FPN/SparseUNet keys are validated for
completeness and shape against synthesized reference-shaped state dicts.

Usage:
  python tools/convert_3dvnet_ckpt.py --ckpt epoch=100-step=60700.ckpt \
      --out weights/3dvnet_reference.npz
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.convert_torchvision_mnasnet import STACKS


def conv2d_w(t):
    return np.transpose(np.asarray(t), (2, 3, 1, 0))


def conv3d_w(t):
    return np.transpose(np.asarray(t), (2, 3, 4, 1, 0))


def deconv3d_w(t):
    """torch ConvTranspose3d [in, out, k, k, k] → flax dilated-conv kernel
    [k, k, k, in, out], spatially flipped."""
    w = np.transpose(np.asarray(t), (2, 3, 4, 0, 1))
    return w[::-1, ::-1, ::-1].copy()


def conv1d_w(t):
    return np.transpose(np.asarray(t), (2, 1, 0))


def linear_w(t):
    return np.transpose(np.asarray(t), (1, 0))


def me_kernel(t, out_shape, order: str = "xyz", flip: bool = False):
    """MinkowskiEngine kernel [K^3, in, out] (or [in, out] for K=1) →
    dense [3,3,3,in,out] / [1,1,1,in,out]."""
    w = np.asarray(t)
    if w.ndim == 2:                       # kernel_size=1
        return w[None, None, None]
    kv, cin, cout = w.shape
    k = round(kv ** (1.0 / 3.0))
    assert k ** 3 == kv, (w.shape, out_shape)
    if order == "xyz":                    # first coord fastest
        dense = w.reshape(k, k, k, cin, cout).transpose(2, 1, 0, 3, 4)
    else:                                 # last coord fastest
        dense = w.reshape(k, k, k, cin, cout)
    if flip:
        dense = dense[::-1, ::-1, ::-1]
    return np.ascontiguousarray(dense)


class Mapper:
    def __init__(self, sd, order="xyz"):
        self.sd = sd
        self.order = order
        self.params = {}
        self.stats = {}
        self.used = set()
        self.missing = []

    def get(self, key, optional=False):
        if key in self.sd:
            self.used.add(key)
            return self.sd[key]
        if not optional:
            self.missing.append(key)
        return None

    def put(self, path, val):
        if val is not None:
            self.params[path] = np.asarray(val, np.float32)

    def bn(self, flax_path, torch_prefix):
        self.put(f"{flax_path}/scale", self.get(f"{torch_prefix}.weight"))
        self.put(f"{flax_path}/bias", self.get(f"{torch_prefix}.bias"))
        m = self.get(f"{torch_prefix}.running_mean")
        v = self.get(f"{torch_prefix}.running_var")
        if m is not None:
            self.stats[f"{flax_path}/mean"] = np.asarray(m, np.float32)
        if v is not None:
            self.stats[f"{flax_path}/var"] = np.asarray(v, np.float32)

    def gn(self, flax_path, torch_prefix):
        self.put(f"{flax_path}/scale", self.get(f"{torch_prefix}.weight"))
        self.put(f"{flax_path}/bias", self.get(f"{torch_prefix}.bias"))

    # ----------------------------------------------------------- groups
    def map_backbone(self, tp="mvsnet.feat_extractor", fp="mvsnet/backbone"):
        stem = [("layer1.0", f"{fp}/Conv_0", conv2d_w),
                ("layer1.3", f"{fp}/Conv_1", conv2d_w),
                ("layer1.6", f"{fp}/Conv_2", conv2d_w)]
        for tk, fk, fn in stem:
            self.put(f"{fk}/kernel", _maybe(fn, self.get(f"{tp}.{tk}.weight")))
        for i, bn_i in enumerate([1, 4, 7]):
            self.bn(f"{fp}/BatchNorm_{i}", f"{tp}.layer1.{bn_i}")
        # stacks: layer2.0, layer3.0, layer4.0, layer4.1, layer5.0, layer5.1
        seqs = ["layer2.0", "layer3.0", "layer4.0", "layer4.1",
                "layer5.0", "layer5.1"]
        for si, ((_, n_blocks), seq) in enumerate(zip(STACKS, seqs)):
            for b in range(n_blocks):
                t = f"{tp}.{seq}.{b}.layers"
                f = f"{fp}/_Stack_{si}/_MBConv_{b}"
                for ci, li in enumerate([0, 3, 6]):
                    self.put(f"{f}/Conv_{ci}/kernel",
                             _maybe(conv2d_w, self.get(f"{t}.{li}.weight")))
                for bi, li in enumerate([1, 4, 7]):
                    self.bn(f"{f}/BatchNorm_{bi}", f"{t}.{li}")

    def map_fpn(self, tp="mvsnet.feat_shrinker.fpn", fp="mvsnet/fpn"):
        for i in range(5):
            for blocks, name in [("inner_blocks", "lateral"),
                                 ("layer_blocks", "smooth")]:
                w = self.get(f"{tp}.{blocks}.{i}.weight", optional=True)
                b = self.get(f"{tp}.{blocks}.{i}.bias", optional=True)
                if w is None:             # torchvision >= 0.12 layout
                    w = self.get(f"{tp}.{blocks}.{i}.0.weight")
                    b = self.get(f"{tp}.{blocks}.{i}.0.bias")
                self.put(f"{fp}/{name}{i}/kernel", _maybe(conv2d_w, w))
                self.put(f"{fp}/{name}{i}/bias", b)

    def map_costreg(self, tp="mvsnet.cnn_3d", fp="mvsnet/cost_reg"):
        # flax auto-numbering (models/mvsnet.py CostRegNet.__call__):
        # ConvBnRelu_{0..6} = ref conv0, conv2, conv1, conv4, conv3,
        # conv6, conv5; ConvTransposeUp3d_{0,1,2} = conv7/8/9; Conv_0 = prob
        order = [("conv0", 0), ("conv2", 1), ("conv1", 2), ("conv4", 3),
                 ("conv3", 4), ("conv6", 5), ("conv5", 6)]
        for tname, fi in order:
            self.put(f"{fp}/ConvBnRelu_{fi}/Conv_0/kernel",
                     _maybe(conv3d_w, self.get(f"{tp}.{tname}.conv.weight")))
            self.bn(f"{fp}/ConvBnRelu_{fi}/BatchNorm_0", f"{tp}.{tname}.bn")
        for i, tname in enumerate(["conv7", "conv8", "conv9"]):
            self.put(f"{fp}/ConvTransposeUp3d_{i}/Conv_0/kernel",
                     _maybe(deconv3d_w,
                            self.get(f"{tp}.{tname}.deconv.weight")))
            self.bn(f"{fp}/ConvTransposeUp3d_{i}/BatchNorm_0",
                    f"{tp}.{tname}.bn")
        self.put(f"{fp}/Conv_0/kernel",
                 _maybe(conv3d_w, self.get(f"{tp}.prob.weight")))
        self.put(f"{fp}/Conv_0/bias", self.get(f"{tp}.prob.bias"))

    def map_pointnet(self, tp="pointnet", fp="pointnet"):
        for name in ["fc_pos", "fc1", "fc2", "fc3", "fc4", "fc_out"]:
            self.put(f"{fp}/{name}/kernel",
                     _maybe(linear_w, self.get(f"{tp}.{name}.weight")))
            self.put(f"{fp}/{name}/bias", self.get(f"{tp}.{name}.bias"))

    def map_decoder(self, tp="decoder.net", fp="decoder"):
        for i in range(3):
            self.put(f"{fp}/Conv_{i}/kernel",
                     _maybe(conv1d_w, self.get(f"{tp}.{i}.0.weight")))
            self.bn(f"{fp}/BatchNorm_{i}", f"{tp}.{i}.1")
        self.put(f"{fp}/Conv_3/kernel",
                 _maybe(conv1d_w, self.get(f"{tp}.3.weight")))
        self.put(f"{fp}/Conv_3/bias", self.get(f"{tp}.3.bias"))

    def map_propagation(self, tp, fp):
        for i in range(4):
            self.put(f"{fp}/ConvBnRelu_{i}/Conv_0/kernel",
                     _maybe(conv2d_w,
                            self.get(f"{tp}.conv{i + 1}.0.weight")))
            self.bn(f"{fp}/ConvBnRelu_{i}/BatchNorm_0", f"{tp}.conv{i + 1}.1")

    def map_scene_unet(self, tp="sparse_conv", fp="scene_unet"):
        mk = lambda key, flip=False: _maybe(
            lambda t: me_kernel(t, None, self.order, flip), self.get(key))

        def residual(t, f):
            self.put(f"{f}/MaskedConv3d_0/Conv_0/kernel",
                     mk(f"{t}.conv1.kernel"))
            self.put(f"{f}/MaskedConv3d_1/Conv_0/kernel",
                     mk(f"{t}.conv2.kernel"))
            self.gn(f"{f}/MaskedGroupNorm_0", f"{t}.n1.gn")
            self.gn(f"{f}/MaskedGroupNorm_1", f"{t}.n2.gn")

        # residual blocks in flax creation order (scene_unet.py __call__)
        res = [("res_down.0.0", 0), ("res_down.1.0", 1), ("res_down.1.1", 2),
               ("res_down.2.0", 3), ("res_down.2.1", 4), ("res_down.2.2", 5),
               ("res_up.0.0", 6), ("res_up.0.1", 7), ("res_up.1.0", 8)]
        for t, i in res:
            residual(f"{tp}.{t}", f"{fp}/SparseResidual3d_{i}")
        # down convs + their GN (flax MaskedConv3d_0/1, MaskedGroupNorm_0/1)
        for i in range(2):
            k = mk(f"{tp}.down.{i}.0.kernel")
            self.put(f"{fp}/MaskedConv3d_{i}/Conv_0/kernel", k)
            b = self.get(f"{tp}.down.{i}.0.bias", optional=True)
            if b is None and k is not None:  # ME conv default bias=False
                b = np.zeros((k.shape[-1],), np.float32)
            self.put(f"{fp}/MaskedConv3d_{i}/Conv_0/bias", b)
            self.gn(f"{fp}/MaskedGroupNorm_{i}", f"{tp}.down.{i}.1.gn")
        # up transpose convs (flax MaskedUpConv3d_0/1, GN_2/GN_4)
        for i, gn_i in [(0, 2), (1, 4)]:
            self.put(f"{fp}/MaskedUpConv3d_{i}/Conv_0/kernel",
                     mk(f"{tp}.up.{i}.0.kernel", flip=True))
            self.gn(f"{fp}/MaskedGroupNorm_{gn_i}", f"{tp}.up.{i}.1.gn")
        # feat-adjust 1x1x1 convs (flax MaskedConv3d_2/3, GN_3/GN_5)
        for i, (conv_i, gn_i) in enumerate([(2, 3), (3, 5)]):
            k = mk(f"{tp}.feat_adj.{i}.0.kernel")
            self.put(f"{fp}/MaskedConv3d_{conv_i}/Conv_0/kernel", k)
            b = self.get(f"{tp}.feat_adj.{i}.0.bias", optional=True)
            if b is None and k is not None:
                b = np.zeros((k.shape[-1],), np.float32)
            self.put(f"{fp}/MaskedConv3d_{conv_i}/Conv_0/bias", b)
            self.gn(f"{fp}/MaskedGroupNorm_{gn_i}", f"{tp}.feat_adj.{i}.1.gn")

    def map_all(self):
        self.map_backbone()
        self.map_fpn()
        self.map_costreg()
        self.map_pointnet()
        self.map_scene_unet()
        self.map_decoder()
        self.map_propagation("refine_quarter", "refine_quarter")
        self.map_propagation("refine_half", "refine_half")
        self.map_propagation("refine_full", "refine_full")
        return self.params, self.stats


def _maybe(fn, t):
    return None if t is None else fn(t)


def unflatten(flat):
    out = {}
    for k, v in flat.items():
        cur = out
        parts = k.split("/")
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = v
    return out


def convert_state_dict(sd, order="xyz"):
    """Full reference state dict → (params tree, batch_stats tree,
    missing-key list, unused-key list)."""
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
          for k, v in sd.items()}
    m = Mapper(sd, order=order)
    params, stats = m.map_all()
    unused = sorted(k for k in sd if k not in m.used
                    and "num_batches_tracked" not in k)
    return unflatten(params), unflatten(stats), m.missing, unused


def merge_into_variables(variables, params_tree, stats_tree):
    """Overlay converted trees onto model variables; shape-checks every
    leaf and returns (variables, n_merged, unmatched_paths)."""
    import jax

    variables = jax.tree_util.tree_map(lambda x: x, variables)
    stats = {"n": 0}
    unmatched = []

    def merge(dst, src, path):
        for k, v in src.items():
            if k not in dst:
                unmatched.append("/".join(path + (k,)))
                continue
            if isinstance(v, dict):
                merge(dst[k], v, path + (k,))
            else:
                assert tuple(dst[k].shape) == tuple(v.shape), \
                    ("/".join(path + (k,)), dst[k].shape, v.shape)
                dst[k] = v.astype(np.asarray(dst[k]).dtype)
                stats["n"] += 1

    merge(variables["params"], params_tree, ())
    merge(variables["batch_stats"], stats_tree, ())
    return variables, stats["n"], unmatched


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True,
                    help=".ckpt (PL) or raw state-dict .pth")
    ap.add_argument("--out", required=True, help="output .npz")
    ap.add_argument("--kernel-order", choices=["xyz", "zyx"], default="xyz",
                    help="MinkowskiEngine kernel-offset enumeration order")
    ap.add_argument("--strict", action="store_true",
                    help="fail on any missing source key")
    args = ap.parse_args()

    import torch

    sd = torch.load(args.ckpt, map_location="cpu", weights_only=False)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    params_tree, stats_tree, missing, unused = convert_state_dict(
        sd, order=args.kernel_order)
    if missing:
        print(f"WARNING: {len(missing)} reference keys missing "
              f"(first 10): {missing[:10]}")
        if args.strict:
            sys.exit(1)
    if unused:
        print(f"note: {len(unused)} source keys unused "
              f"(first 10): {unused[:10]}")

    # instantiate the model to shape-check, then export flat npz
    import jax

    from tdvnet.config import load_config
    from tdvnet.data import batch as B, synthetic
    from tdvnet.models.threedvnet import ThreeDVNet

    cfg = load_config({"batch": {"n_scenes": 1, "n_ref": 3}})
    model = ThreeDVNet(cfg.model)
    bc = cfg.batch
    fb = B.collate_scenes(
        [synthetic.make_batch_scene(bc.n_views, bc.img_size,
                                    bc.depth_img_size, seed=0)],
        bc.n_views, bc.n_ref, bc.n_src_on_either_side)
    variables = model.init(jax.random.PRNGKey(0), fb, offsets=[0.05],
                           n_iters=1, lam=0.0, train=False)
    variables, n, unmatched = merge_into_variables(variables, params_tree,
                                                   stats_tree)
    if unmatched:
        print(f"WARNING: {len(unmatched)} converted paths not in model: "
              f"{unmatched[:10]}")

    flat = {}
    for coll, tree in (("params", variables["params"]),
                       ("batch_stats", variables["batch_stats"])):
        for path, x in jax.tree_util.tree_flatten_with_path(tree)[0]:
            key = "/".join(str(p.key) for p in path)
            flat[f"{coll}/{key}"] = np.asarray(x)
    np.savez(args.out, **flat)
    print(f"wrote {args.out}: merged {n} tensors "
          f"({len(missing)} missing, {len(unused)} unused source keys)")


if __name__ == "__main__":
    main()
