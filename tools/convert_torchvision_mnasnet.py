"""Convert torchvision MnasNet1.0 ImageNet weights into MnasMulti params.

The reference backbone is pretrained torchvision mnasnet1_0
(`mv3d/subnetworks/mvsnet.py:58`); this zero-egress image cannot download
it, but when a `mnasnet1.0_*.pth` state-dict file is provided (copied in
out-of-band) this tool maps it onto `tdvnet.models.backbone.MnasMulti`
(params + batch_stats) and saves an npz the trainer can warm-start from.

Usage:
  python tools/convert_torchvision_mnasnet.py --pth mnasnet1.0.pth \
      --out mnasnet_flax.npz
  # later: tdvnet.models.backbone_weights.load_into_variables(...)
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# torchvision stack index → (n_blocks) matching MnasMulti's _Stack_0.._Stack_5
STACKS = [(8, 3), (9, 3), (10, 3), (11, 2), (12, 4), (13, 1)]


def conv_w(t):
    """torch [out, in/groups, kh, kw] → flax [kh, kw, in/groups, out]."""
    return np.transpose(np.asarray(t), (2, 3, 1, 0))


def convert(state_dict):
    params = {}
    stats = {}

    def put_conv(flax_path, torch_key):
        params[flax_path + "/kernel"] = conv_w(state_dict[torch_key])

    def put_bn(flax_path, torch_prefix):
        params[flax_path + "/scale"] = np.asarray(
            state_dict[torch_prefix + ".weight"])
        params[flax_path + "/bias"] = np.asarray(
            state_dict[torch_prefix + ".bias"])
        stats[flax_path + "/mean"] = np.asarray(
            state_dict[torch_prefix + ".running_mean"])
        stats[flax_path + "/var"] = np.asarray(
            state_dict[torch_prefix + ".running_var"])

    # stem: layers.0 conv / .1 bn / .3 dw conv / .4 bn / .6 project / .7 bn
    put_conv("Conv_0", "layers.0.weight")
    put_bn("BatchNorm_0", "layers.1")
    put_conv("Conv_1", "layers.3.weight")
    put_bn("BatchNorm_1", "layers.4")
    put_conv("Conv_2", "layers.6.weight")
    put_bn("BatchNorm_2", "layers.7")

    for si, (tidx, n_blocks) in enumerate(STACKS):
        for b in range(n_blocks):
            tp = f"layers.{tidx}.{b}.layers"
            fp = f"_Stack_{si}/_MBConv_{b}"
            put_conv(f"{fp}/Conv_0", f"{tp}.0.weight")
            put_bn(f"{fp}/BatchNorm_0", f"{tp}.1")
            put_conv(f"{fp}/Conv_1", f"{tp}.3.weight")
            put_bn(f"{fp}/BatchNorm_1", f"{tp}.4")
            put_conv(f"{fp}/Conv_2", f"{tp}.6.weight")
            put_bn(f"{fp}/BatchNorm_2", f"{tp}.7")
    return params, stats


def unflatten(flat):
    out = {}
    for k, v in flat.items():
        cur = out
        parts = k.split("/")
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = v
    return out


def load_into_variables(npz_path, variables, backbone_path=("mvsnet",
                                                            "backbone")):
    """Merge a converted npz into a model's variables dict (pure python)."""
    data = np.load(npz_path)
    params = unflatten({k[len("params/"):]: data[k] for k in data.files
                        if k.startswith("params/")})
    stats = unflatten({k[len("stats/"):]: data[k] for k in data.files
                       if k.startswith("stats/")})

    import jax

    variables = jax.tree_util.tree_map(lambda x: x, variables)  # shallow copy

    def merge(dst, src, path):
        for k, v in src.items():
            if isinstance(v, dict):
                merge(dst[k], v, path + (k,))
            else:
                assert dst[k].shape == v.shape, (path + (k,), dst[k].shape,
                                                 v.shape)
                dst[k] = v

    node_p = variables["params"]
    node_s = variables["batch_stats"]
    for p in backbone_path:
        node_p = node_p[p]
        node_s = node_s[p]
    merge(node_p, params, ())
    merge(node_s, stats, ())
    return variables


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pth", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import torch

    sd = torch.load(args.pth, map_location="cpu")
    if "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    params, stats = convert(sd)
    np.savez(args.out,
             **{f"params/{k}": v for k, v in params.items()},
             **{f"stats/{k}": v for k, v in stats.items()})
    print(f"wrote {args.out}: {len(params)} param tensors, "
          f"{len(stats)} stat tensors")


if __name__ == "__main__":
    main()
