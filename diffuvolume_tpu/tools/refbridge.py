"""Import bridge for running the reference PyTorch models on host CPU.

Used by the whole-model activation-parity harness
(tests/test_reference_parity.py): instantiate the reference networks
(`/root/reference/{SceneFlow,KITTI12,KITTI15}`) with random weights on CPU
torch, convert the state dict with tools.convert_torch*, and assert forward
parity against our flax models.

Three obstacles this module clears:

* The three sub-projects all use clashing top-level package names
  (``models``, ``datasets``, ``utils``, ``core``) — ``reference_imports``
  swaps ``sys.path`` and purges ``sys.modules`` around each use.
* The model code calls ``.cuda()`` on tensors inline
  (e.g. SceneFlow/models/acv_ddim.py:278) — ``patch_cuda_noop`` makes
  ``Tensor.cuda`` a no-op on CPU-only torch.
* KITTI15's extractor imports ``timm`` (core/extractor.py:5), absent here —
  ``install_timm_stub`` registers a minimal ``mobilenetv2_100``
  (features_only) replica with timm's exact module tree
  (conv_stem/bn1/act1/blocks, InvertedResidual conv_pw/bn1/conv_dw/bn2/
  conv_pwl/bn3) so state-dict keys match tools.convert_torch_igev.
"""

from __future__ import annotations

import contextlib
import sys
import types


_REF_ROOT = "/root/reference"
_CLASH_PKGS = ("models", "datasets", "utils", "core", "head", "submodule", "loss")


@contextlib.contextmanager
def reference_imports(subproject: str):
    """Make ``/root/reference/<subproject>`` importable, isolated from siblings."""
    root = f"{_REF_ROOT}/{subproject}"
    saved = {
        k: sys.modules.pop(k)
        for k in list(sys.modules)
        if k.split(".")[0] in _CLASH_PKGS
    }
    sys.path.insert(0, root)
    try:
        yield
    finally:
        sys.path.remove(root)
        for k in list(sys.modules):
            if k.split(".")[0] in _CLASH_PKGS:
                del sys.modules[k]
        sys.modules.update(saved)


@contextlib.contextmanager
def patch_cuda_noop():
    """Tensor.cuda()/Module.cuda() → identity (reference code calls them
    inline), and Tensor.get_device() → the tensor's real device (returns -1 on
    CPU tensors, which KITTI12/models/submodule.py:145-148 then feeds to
    ``torch.arange(..., device=-1)``)."""
    import torch

    t_saved, m_saved = torch.Tensor.cuda, torch.nn.Module.cuda
    g_saved = torch.Tensor.get_device
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.Tensor.get_device = lambda self: self.device
    try:
        yield
    finally:
        torch.Tensor.cuda, torch.nn.Module.cuda = t_saved, m_saved
        torch.Tensor.get_device = g_saved


def randomize_bn_stats(module, seed: int = 0):
    """Give BatchNorms non-trivial running stats so converter mapping bugs
    (mean↔var swaps, missed keys) can't hide behind the 0/1 defaults."""
    import torch

    g = torch.Generator().manual_seed(seed)
    bn_types = (
        torch.nn.BatchNorm1d, torch.nn.BatchNorm2d, torch.nn.BatchNorm3d,
        torch.nn.SyncBatchNorm,
    )
    for m in module.modules():
        if isinstance(m, bn_types) and m.running_mean is not None:
            m.running_mean.normal_(0.0, 0.5, generator=g)
            m.running_var.uniform_(0.5, 1.5, generator=g)


# ---------------------------------------------------------------------------
# timm stub: mobilenetv2_100(features_only=True) with timm's module tree.
# Architecture per the MobileNetV2 paper / timm efficientnet builder
# (width 1.0): stem 3→32 s2; stages (t, c, n, s) =
# (1,16,1,1) (6,24,2,2) (6,32,3,2) (6,64,4,2) (6,96,3,1) (6,160,3,2)
# (6,320,1,1); ReLU6; linear bottleneck; residual iff s==1 and cin==cout.
# ---------------------------------------------------------------------------


def _build_timm_stub_module():
    import torch
    import torch.nn as nn

    class DepthwiseSeparableConv(nn.Module):
        def __init__(self, cin, cout, stride):
            super().__init__()
            self.conv_dw = nn.Conv2d(cin, cin, 3, stride, 1, groups=cin, bias=False)
            self.bn1 = nn.BatchNorm2d(cin)
            self.conv_pw = nn.Conv2d(cin, cout, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(cout)
            self.act = nn.ReLU6(inplace=True)
            self.has_skip = stride == 1 and cin == cout

        def forward(self, x):
            y = self.act(self.bn1(self.conv_dw(x)))
            y = self.bn2(self.conv_pw(y))  # linear bottleneck
            return x + y if self.has_skip else y

    class InvertedResidual(nn.Module):
        def __init__(self, cin, cout, stride, expand=6):
            super().__init__()
            mid = cin * expand
            self.conv_pw = nn.Conv2d(cin, mid, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(mid)
            self.conv_dw = nn.Conv2d(mid, mid, 3, stride, 1, groups=mid, bias=False)
            self.bn2 = nn.BatchNorm2d(mid)
            self.conv_pwl = nn.Conv2d(mid, cout, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(cout)
            self.act = nn.ReLU6(inplace=True)
            self.has_skip = stride == 1 and cin == cout

        def forward(self, x):
            y = self.act(self.bn1(self.conv_pw(x)))
            y = self.act(self.bn2(self.conv_dw(y)))
            y = self.bn3(self.conv_pwl(y))
            return x + y if self.has_skip else y

    class MobileNetV2Features(nn.Module):
        _STAGES = [  # (expand, cout, n, stride)
            (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
            (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
        ]

        def __init__(self):
            super().__init__()
            self.conv_stem = nn.Conv2d(3, 32, 3, 2, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(32)
            self.act1 = nn.ReLU6(inplace=True)
            blocks = []
            cin = 32
            for t, c, n, s in self._STAGES:
                stage = []
                for i in range(n):
                    stride = s if i == 0 else 1
                    if t == 1:
                        stage.append(DepthwiseSeparableConv(cin, c, stride))
                    else:
                        stage.append(InvertedResidual(cin, c, stride, t))
                    cin = c
                blocks.append(nn.Sequential(*stage))
            self.blocks = nn.Sequential(*blocks)

        def forward(self, x):  # features_only: per-stage outputs
            x = self.act1(self.bn1(self.conv_stem(x)))
            outs = []
            for b in self.blocks:
                x = b(x)
                outs.append(x)
            return outs

    stub = types.ModuleType("timm")

    def create_model(name, pretrained=False, features_only=False, **kw):
        assert name == "mobilenetv2_100", name
        return MobileNetV2Features()

    stub.create_model = create_model
    stub.__stub__ = True
    return stub


def install_timm_stub():
    """Register the stub if real timm is unavailable. Returns the module."""
    try:
        import timm  # noqa: F401

        return sys.modules["timm"]
    except ImportError:
        pass
    if "timm" not in sys.modules or not getattr(sys.modules["timm"], "__stub__", False):
        sys.modules["timm"] = _build_timm_stub_module()
    return sys.modules["timm"]
