"""MnasNet weight-converter validation (VERDICT r1 #10).

torchvision is not installed, so a faithful torch replica of torchvision
mnasnet1_0 is built here with the EXACT state-dict key layout
("layers.{0..13}...", blocks as "layers.{8+}.{b}.layers.{0,1,3,4,6,7}"),
random weights AND random BN running stats are exported, converted with
`tools/convert_torchvision_mnasnet.convert`, loaded into `MnasMulti`, and
the 5 staged outputs are compared against the torch replica staged like
the reference `FeatureExtractor` (`mv3d/subnetworks/mvsnet.py:55-73`).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from tdvnet.models.backbone import MnasMulti  # noqa: E402
from tools.convert_torchvision_mnasnet import convert, unflatten  # noqa: E402

# mnasnet1_0 stacks: (out, kernel, stride, expansion, n_blocks)
_STACKS = [(24, 3, 2, 3, 3), (40, 5, 2, 3, 3), (80, 5, 2, 6, 3),
           (96, 3, 1, 6, 2), (192, 5, 2, 6, 4), (320, 3, 1, 6, 1)]


class _Block(tnn.Module):
    """torchvision _InvertedResidual with identical child names."""

    def __init__(self, cin, cout, k, s, exp):
        super().__init__()
        mid = cin * exp
        self.layers = tnn.Sequential(
            tnn.Conv2d(cin, mid, 1, bias=False),
            tnn.BatchNorm2d(mid),
            tnn.ReLU(inplace=True),
            tnn.Conv2d(mid, mid, k, s, padding=k // 2, groups=mid,
                       bias=False),
            tnn.BatchNorm2d(mid),
            tnn.ReLU(inplace=True),
            tnn.Conv2d(mid, cout, 1, bias=False),
            tnn.BatchNorm2d(cout),
        )
        self.apply_residual = cin == cout and s == 1

    def forward(self, x):
        y = self.layers(x)
        return x + y if self.apply_residual else y


def _make_torch_mnasnet():
    mods = [
        tnn.Conv2d(3, 32, 3, 2, padding=1, bias=False),
        tnn.BatchNorm2d(32),
        tnn.ReLU(inplace=True),
        tnn.Conv2d(32, 32, 3, 1, padding=1, groups=32, bias=False),
        tnn.BatchNorm2d(32),
        tnn.ReLU(inplace=True),
        tnn.Conv2d(32, 16, 1, bias=False),
        tnn.BatchNorm2d(16),
    ]
    cin = 16
    for out, k, s, exp, n in _STACKS:
        blocks = []
        for b in range(n):
            blocks.append(_Block(cin, out, k, s if b == 0 else 1, exp))
            cin = out
        mods.append(tnn.Sequential(*blocks))

    class _Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.layers = tnn.Sequential(*mods)

        def staged(self, x):
            c1 = self.layers[0:8](x)
            c2 = self.layers[8](c1)
            c3 = self.layers[9](c2)
            c4 = self.layers[10:12](c3)
            c5 = self.layers[12:14](c4)
            return c1, c2, c3, c4, c5

    return _Net()


def test_converter_key_exact_and_forward_parity(rng):
    net = _make_torch_mnasnet().eval()
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.1, 0.1)
            elif isinstance(m, tnn.Conv2d):
                m.weight.normal_(0.0, 0.05)

    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    # the key set the converter consumes must exist exactly as in
    # torchvision (spot-check the layout)
    assert "layers.0.weight" in sd
    assert "layers.8.0.layers.3.weight" in sd
    assert "layers.13.0.layers.7.running_var" in sd

    params_flat, stats_flat = convert(sd)
    params = unflatten(params_flat)
    stats = unflatten(stats_flat)

    model = MnasMulti()
    x_np = rng.standard_normal((1, 64, 96, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x_np))

    # key-exactness both ways: every converted tensor lands on an existing
    # leaf of the same shape, and every backbone leaf is covered
    def leaves(tree, path=()):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out.update(leaves(v, path + (k,)))
            else:
                out["/".join(path + (k,))] = v
        return out

    init_p = leaves(jax.tree_util.tree_map(np.asarray,
                                           dict(variables["params"])))
    init_s = leaves(jax.tree_util.tree_map(np.asarray,
                                           dict(variables["batch_stats"])))
    conv_p = leaves(params)
    conv_s = leaves(stats)
    assert set(conv_p) == set(init_p), (
        set(conv_p) ^ set(init_p))
    assert set(conv_s) == set(init_s)
    for k in conv_p:
        assert conv_p[k].shape == init_p[k].shape, k

    merged = {"params": params, "batch_stats": stats}
    c = model.apply(merged, jnp.asarray(x_np), train=False)

    with torch.no_grad():
        ref = net.staged(torch.from_numpy(x_np.transpose(0, 3, 1, 2)))

    for ours, theirs in zip(c, ref):
        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy().transpose(0, 2, 3, 1),
            rtol=1e-3, atol=1e-3)
