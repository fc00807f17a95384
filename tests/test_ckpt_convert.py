"""Full reference-checkpoint converter (tools/convert_3dvnet_ckpt.py).

Two validation layers (VERDICT r2 "Next round" #8):
1. *Forward parity* against the ACTUAL reference torch modules that can
   instantiate on CPU (CostRegNet, PointNet, HypothesisDecoder's conv
   stack, PropagationNet): random-init reference module -> convert its
   state dict -> our flax module must reproduce its outputs.
2. *Key/shape completeness* for the groups whose native deps are absent
   (MnasNet backbone needs torchvision, SparseUNet needs MinkowskiEngine):
   a full reference-shaped synthetic state dict must convert with zero
   missing keys and cover EVERY leaf of the model's param/batch_stats
   trees.
"""
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from _reference_loader import install_reference_path


def _install_me_stub():
    """MinkowskiEngine stub rich enough to *instantiate* the reference
    refinement/scenemodeling modules (their torch-only parts)."""
    if "MinkowskiEngine" in sys.modules:
        return
    me = types.ModuleType("MinkowskiEngine")

    class _Interp(torch.nn.Module):
        pass

    class _Conv(torch.nn.Module):
        def __init__(self, in_ch, out_ch, kernel_size=3, stride=1,
                     dimension=3, bias=False):
            super().__init__()
            kv = kernel_size ** dimension if kernel_size > 1 else None
            shape = (kv, in_ch, out_ch) if kv else (in_ch, out_ch)
            self.kernel = torch.nn.Parameter(torch.randn(*shape) * 0.05)
            if bias:
                self.bias = torch.nn.Parameter(torch.zeros(out_ch))

    class _BN(torch.nn.Module):
        def __init__(self, ch):
            super().__init__()
            self.bn = torch.nn.BatchNorm1d(ch)

    class _ReLU(torch.nn.Module):
        def __init__(self, inplace=False):
            super().__init__()

    me.MinkowskiInterpolation = _Interp
    me.MinkowskiConvolution = _Conv
    me.MinkowskiConvolutionTranspose = _Conv
    me.MinkowskiBatchNorm = _BN
    me.MinkowskiReLU = _ReLU
    me.SparseTensor = object
    me.cat = None
    sys.modules["MinkowskiEngine"] = me


def _install_scatter_stub():
    """Working pure-torch torch_scatter.scatter (max/mean) for PointNet."""
    mod = sys.modules.get("torch_scatter")
    if mod is not None and getattr(mod, "scatter", None) is not None:
        return

    def scatter(src, idx, dim=0, reduce="max", dim_size=None):
        assert dim == 0
        n = dim_size if dim_size is not None else int(idx.max()) + 1
        out_shape = (n,) + tuple(src.shape[1:])
        if reduce == "max":
            out = torch.full(out_shape, float("-inf"), dtype=src.dtype)
            idx_e = idx.view(-1, *([1] * (src.dim() - 1))).expand_as(src)
            out.scatter_reduce_(0, idx_e, src, reduce="amax",
                                include_self=True)
            out[out == float("-inf")] = 0.0
            return out
        raise NotImplementedError(reduce)

    if mod is None:
        mod = types.ModuleType("torch_scatter")
        sys.modules["torch_scatter"] = mod
    mod.scatter = scatter


def _install_torchvision_stub():
    """Rich-enough torchvision stub: `mv3d/utils.py` builds a transform
    pipeline at import time; the tested modules never run it."""
    if "torchvision" in sys.modules:
        tv = sys.modules["torchvision"]
    else:
        tv = types.ModuleType("torchvision")
        sys.modules["torchvision"] = tv
    tf = types.ModuleType("torchvision.transforms")
    for name in ["ToPILImage", "Resize", "ToTensor", "Normalize"]:
        setattr(tf, name, lambda *a, **k: None)
    tf.Compose = lambda *a, **k: None
    tv.transforms = tf
    sys.modules["torchvision.transforms"] = tf


def _setup_reference():
    _install_me_stub()
    _install_scatter_stub()
    _install_torchvision_stub()
    install_reference_path()
    _install_scatter_stub()          # loader stub sets scatter=None


def _flax_apply(module, variables, *args, **kwargs):
    import jax

    return jax.device_get(module.apply(variables, *args, **kwargs))


def _convert(sd_prefixed):
    sys.path.insert(0, "/root/repo")
    from tools.convert_3dvnet_ckpt import convert_state_dict

    return convert_state_dict(sd_prefixed)


def test_costreg_forward_parity():
    _setup_reference()
    from mv3d.subnetworks.mvsnet import CostRegNet as RefCostReg

    torch.manual_seed(0)
    ref = RefCostReg(32, 8).eval()
    # randomize BN stats so parity exercises them too
    for m in ref.modules():
        if isinstance(m, (torch.nn.BatchNorm3d,)):
            m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
            m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)
    sd = {f"mvsnet.cnn_3d.{k}": v for k, v in ref.state_dict().items()}
    params_tree, stats_tree, missing, _ = _convert(sd)
    assert not [k for k in missing if k.startswith("mvsnet.cnn_3d")]

    x = torch.randn(2, 32, 16, 16, 16)
    with torch.no_grad():
        want = ref(x).squeeze(1).numpy()                # [2, D, h, w]

    from tdvnet.models.mvsnet import CostRegNet

    mod = CostRegNet(8)
    variables = {"params": params_tree["mvsnet"]["cost_reg"],
                 "batch_stats": stats_tree["mvsnet"]["cost_reg"]}
    got = _flax_apply(mod, variables,
                      np.transpose(x.numpy(), (0, 2, 3, 4, 1)))[..., 0]
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-4)


def test_pointnet_forward_parity():
    _setup_reference()
    from mv3d.subnetworks.scenemodeling import PointNet as RefPointNet

    torch.manual_seed(1)
    ref = RefPointNet(128, 64, 35).eval()
    sd = {f"pointnet.{k}": v for k, v in ref.state_dict().items()}
    params_tree, _, missing, _ = _convert(sd)
    assert not [k for k in missing if k.startswith("pointnet")]

    P, A = 60, 7
    pts = torch.randn(P, 35)
    idx = torch.randint(0, A, (P,))
    with torch.no_grad():
        want = ref(pts, idx, A).numpy()                 # [A, 64]

    from tdvnet.models.pointnet import PointNet

    mod = PointNet(128, 64)
    got = _flax_apply(mod, {"params": params_tree["pointnet"]},
                      pts.numpy(), np.asarray(idx), np.ones(P, bool), A)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)


def test_decoder_forward_parity():
    _setup_reference()
    from mv3d.subnetworks.refinement import HypothesisDecoder as RefDec

    torch.manual_seed(2)
    ref = RefDec(352, 128, 3, 1).eval()
    sd = {f"decoder.{k}": v for k, v in ref.state_dict().items()
          if k.startswith("net.")}
    params_tree, stats_tree, missing, _ = _convert(sd)
    assert not [k for k in missing if k.startswith("decoder")]

    M, H = 40, 7
    feats = torch.randn(M, H, 352)
    with torch.no_grad():
        logits = ref.net(feats.transpose(2, 1)).squeeze(1)   # [M, H]
        want = torch.softmax(logits, dim=1).numpy()

    from tdvnet.models.hypothesis import HypothesisDecoder

    mod = HypothesisDecoder(128, 3)
    variables = {"params": params_tree["decoder"],
                 "batch_stats": stats_tree["decoder"]}
    got = _flax_apply(mod, variables, feats.numpy())
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_propagation_forward_parity():
    _setup_reference()
    from mv3d.subnetworks.upsampling import PropagationNet as RefProp

    torch.manual_seed(3)
    ref = RefProp(in_dim=33, h_dim=32).eval()
    sd = {f"refine_half.{k}": v for k, v in ref.state_dict().items()}
    params_tree, stats_tree, missing, _ = _convert(sd)
    assert not [k for k in missing if k.startswith("refine_half")]

    feats = torch.randn(2, 32, 24, 24)
    depth = torch.rand(2, 1, 24, 24) * 3 + 0.5
    with torch.no_grad():
        want = ref(feats, depth).numpy()                # [2, h, w]

    from tdvnet.models.upsampling import PropagationNet

    mod = PropagationNet(32)
    variables = {"params": params_tree["refine_half"],
                 "batch_stats": stats_tree["refine_half"]}
    got = _flax_apply(mod, variables,
                      np.transpose(feats.numpy(), (0, 2, 3, 1)),
                      depth.numpy()[:, 0])
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)


# ---------------------------------------------------------------- synth sd
_MBCONV = {  # stack -> (n_blocks, ksize, [(in, exp, out)] per block)
    0: (3, 3, [(16, 48, 24), (24, 72, 24), (24, 72, 24)]),
    1: (3, 5, [(24, 72, 40), (40, 120, 40), (40, 120, 40)]),
    2: (3, 5, [(40, 240, 80), (80, 480, 80), (80, 480, 80)]),
    3: (2, 3, [(80, 480, 96), (96, 576, 96)]),
    4: (4, 5, [(96, 576, 192), (192, 1152, 192), (192, 1152, 192),
               (192, 1152, 192)]),
    5: (1, 3, [(192, 1152, 320)]),
}
_SEQS = ["layer2.0", "layer3.0", "layer4.0", "layer4.1",
         "layer5.0", "layer5.1"]


def _r(*shape):
    """Fan-in-scaled random conv weight — synthetic state dicts must stay
    numerically sane through ~50 stacked layers for the end-to-end check."""
    fan_in = 1
    for s in shape[1:]:
        fan_in *= s
    return torch.randn(*shape) / (fan_in ** 0.5)


def _synth_backbone(sd):
    def bn(prefix, c):
        sd[f"{prefix}.weight"] = torch.rand(c) * 0.5 + 0.75
        sd[f"{prefix}.bias"] = torch.randn(c) * 0.1
        sd[f"{prefix}.running_mean"] = torch.randn(c) * 0.1
        sd[f"{prefix}.running_var"] = torch.rand(c) + 0.5

    p = "mvsnet.feat_extractor"
    sd[f"{p}.layer1.0.weight"] = _r(32, 3, 3, 3)
    bn(f"{p}.layer1.1", 32)
    sd[f"{p}.layer1.3.weight"] = _r(32, 1, 3, 3)
    bn(f"{p}.layer1.4", 32)
    sd[f"{p}.layer1.6.weight"] = _r(16, 32, 1, 1)
    bn(f"{p}.layer1.7", 16)
    for si, seq in enumerate(_SEQS):
        n, k, blocks = _MBCONV[si]
        for b, (cin, exp, cout) in enumerate(blocks):
            t = f"{p}.{seq}.{b}.layers"
            sd[f"{t}.0.weight"] = _r(exp, cin, 1, 1)
            bn(f"{t}.1", exp)
            sd[f"{t}.3.weight"] = _r(exp, 1, k, k)
            bn(f"{t}.4", exp)
            sd[f"{t}.6.weight"] = _r(cout, exp, 1, 1)
            bn(f"{t}.7", cout)


def _synth_fpn(sd):
    p = "mvsnet.feat_shrinker.fpn"
    for i, c in enumerate([16, 24, 40, 96, 320]):
        sd[f"{p}.inner_blocks.{i}.weight"] = _r(32, c, 1, 1)
        sd[f"{p}.inner_blocks.{i}.bias"] = torch.randn(32) * 0.1
        sd[f"{p}.layer_blocks.{i}.weight"] = _r(32, 32, 3, 3)
        sd[f"{p}.layer_blocks.{i}.bias"] = torch.randn(32) * 0.1


def _synth_sparse_unet(sd):
    p = "sparse_conv"

    def gn(prefix, c):
        sd[f"{prefix}.gn.weight"] = torch.rand(c) * 0.5 + 0.75
        sd[f"{prefix}.gn.bias"] = torch.randn(c) * 0.1

    res = [("res_down.0.0", 64), ("res_down.1.0", 128), ("res_down.1.1", 128),
           ("res_down.2.0", 128), ("res_down.2.1", 128), ("res_down.2.2", 128),
           ("res_up.0.0", 128), ("res_up.0.1", 128), ("res_up.1.0", 64)]
    for t, c in res:
        sd[f"{p}.{t}.conv1.kernel"] = _r(27, c, c)
        sd[f"{p}.{t}.conv2.kernel"] = _r(27, c, c)
        gn(f"{p}.{t}.n1", c)
        gn(f"{p}.{t}.n2", c)
    for i, (cin, cout) in enumerate([(64, 128), (128, 128)]):
        sd[f"{p}.down.{i}.0.kernel"] = _r(27, cin, cout)
        gn(f"{p}.down.{i}.1", cout)
    for i, (cin, cout) in enumerate([(128, 128), (128, 64)]):
        sd[f"{p}.up.{i}.0.kernel"] = _r(27, cin, cout)
        gn(f"{p}.up.{i}.1", cout)
    for i, (cin, cout) in enumerate([(256, 128), (128, 64)]):
        sd[f"{p}.feat_adj.{i}.0.kernel"] = _r(cin, cout)
        gn(f"{p}.feat_adj.{i}.1", cout)


@pytest.mark.slow
def test_full_checkpoint_key_and_shape_coverage():
    """A complete reference-shaped state dict must convert with zero
    missing keys and populate every model leaf."""
    _setup_reference()
    from mv3d.subnetworks.mvsnet import CostRegNet as RefCostReg
    from mv3d.subnetworks.scenemodeling import PointNet as RefPointNet
    from mv3d.subnetworks.refinement import HypothesisDecoder as RefDec
    from mv3d.subnetworks.upsampling import PropagationNet as RefProp

    torch.manual_seed(4)
    sd = {}
    _synth_backbone(sd)
    _synth_fpn(sd)
    _synth_sparse_unet(sd)
    for k, v in RefCostReg(32, 8).state_dict().items():
        sd[f"mvsnet.cnn_3d.{k}"] = v
    for k, v in RefPointNet(128, 64, 35).state_dict().items():
        sd[f"pointnet.{k}"] = v
    for k, v in RefDec(352, 128, 3, 1).state_dict().items():
        if k.startswith("net."):
            sd[f"decoder.{k}"] = v
    for name, in_dim in [("refine_quarter", 33), ("refine_half", 33),
                         ("refine_full", 4)]:
        for k, v in RefProp(in_dim=in_dim, h_dim=32).state_dict().items():
            sd[f"{name}.{k}"] = v

    from tools.convert_3dvnet_ckpt import (convert_state_dict,
                                           merge_into_variables)

    params_tree, stats_tree, missing, unused = convert_state_dict(sd)
    assert missing == [], missing[:20]
    assert unused == [], unused[:20]

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
    n_leaves = (len(jax.tree_util.tree_leaves(variables["params"]))
                + len(jax.tree_util.tree_leaves(variables["batch_stats"])))
    variables, n_merged, unmatched = merge_into_variables(
        variables, params_tree, stats_tree)
    assert unmatched == [], unmatched[:20]
    assert n_merged == n_leaves, (n_merged, n_leaves)

    # converted weights must run end-to-end
    out = model.apply(variables, fb, offsets=[0.05], n_iters=1, lam=1.0,
                      train=False, with_metrics=False)
    assert np.isfinite(np.asarray(out["depth_pred"])).all()
