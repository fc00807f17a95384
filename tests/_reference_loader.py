"""Import helpers for running the *actual reference* torch modules on CPU.

The reference at /root/reference is pure torch for several components
(PropagationNet, MAELoss, custom point-cloud fusion, the Atlas TSDF
integrator, FastMVSNet, GPMVS) and torch 2.x CPU is installed, so parity
tests can pin tdvnet numerics to the reference itself instead of
self-generated goldens (VERDICT r1 "Next round" #3).

The reference's import graph pulls CUDA-era packages that are absent here
(torch_scatter, torch_geometric, torchvision, open3d, skimage, path); the
tested code paths never touch them, so they are stubbed.  `.cuda()` calls
inside the tested functions are made no-ops via `cpu_patch`.
"""
from __future__ import annotations

import contextlib
import pathlib
import sys
import types

REF_ROOT = "/root/reference"


def _stub(name: str, **attrs) -> None:
    if name in sys.modules:
        return
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m


_installed = False


def install_reference_path() -> None:
    """Make `import mv3d...` resolve to /root/reference with stubs for the
    native deps the tested code never calls."""
    global _installed
    if _installed:
        return
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    _stub("torch_scatter", scatter=None)
    _stub("torch_geometric")
    _stub("torch_geometric.nn", voxel_grid=None)
    sys.modules["torch_geometric"].nn = sys.modules["torch_geometric.nn"]
    _stub("torchvision", transforms=types.SimpleNamespace())
    _stub("torchvision.transforms")
    _stub("open3d")
    _stub("skimage", measure=types.SimpleNamespace(marching_cubes=None))
    _stub("skimage.measure", marching_cubes=None)
    _stub("path", Path=pathlib.Path)
    _stub("kornia")
    _installed = True


def load_tsdf_atlas():
    """Import the reference `mv3d.eval.tsdf_atlas` with a torch-2.x compat
    shim: `valid[valid] *= x` writes a tensor through a mask aliasing the
    same storage, which modern torch rejects at runtime; cloning the mask
    preserves the exact semantics the reference had under torch 1.x."""
    import importlib.util

    install_reference_path()
    path = pathlib.Path(REF_ROOT) / "mv3d" / "eval" / "tsdf_atlas.py"
    src = path.read_text().replace("valid[valid] *=",
                                   "valid[valid.clone()] *=")
    spec = importlib.util.spec_from_loader("ref_tsdf_atlas", loader=None)
    mod = importlib.util.module_from_spec(spec)
    exec(compile(src, str(path), "exec"), mod.__dict__)
    return mod


@contextlib.contextmanager
def cpu_patch():
    """Make `.cuda()` on tensors/modules a no-op so reference code written
    for GPUs runs on CPU unchanged."""
    import torch

    orig_t = torch.Tensor.cuda
    orig_m = torch.nn.Module.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    try:
        yield
    finally:
        torch.Tensor.cuda = orig_t
        torch.nn.Module.cuda = orig_m
