"""Load the reference PyTorch model definitions read-only for parity tests.

The reference models (``/root/reference/ros2_ws/src/...``) import compiled
CUDA/CuPy correlation extensions that don't exist here; this helper loads each
model file via importlib inside a synthetic package whose correlation
submodule is replaced with a pure-torch CPU emulation of the exact kernel
semantics (verified against the kernel sources):

- FlowNet2 ``correlation_cuda`` (reference correlation_cuda_kernel.cu:73-147):
  zero-padded in2, displacement grid stepped by stride2, channel = row-major
  (dy, dx), normalized by kernel_size^2 * C.
- sniklaus 7x7/49-ch strided (reference optical_flow/correlation/
  correlation.py:35-103): centers at (y*stride, x*stride), displacements
  (+-3)*stride, /C, output ceil(H/stride) x ceil(W/stride).
- sniklaus 9x9/81-ch (reference pwc_net/correlation/correlation.py): fixed
  d=4, stride 1, /C.

No reference code is copied — the files are executed from their read-only
location with fakes injected for their native deps.
"""
from __future__ import annotations

import contextlib
import importlib.util
import sys
import types

import torch
import torch.nn.functional as F

_REF = "/root/reference/ros2_ws/src"


@contextlib.contextmanager
def cpu_cuda_shim():
    """Make ``Tensor.cuda()`` a no-op: the reference backwarp caches its grid
    with ``.cuda()`` (liteflownet.py:14, liteflownet3.py:17) which CPU torch
    rejects."""
    real = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        yield
    finally:
        torch.Tensor.cuda = real


# ------------------------------------------------------ correlation oracles

def corr_flownet2(in1, in2, pad_size, kernel_size, max_displacement,
                  stride1, stride2):
    assert kernel_size == 1 and stride1 == 1 and pad_size == max_displacement
    B, C, H, W = in1.shape
    p2 = F.pad(in2, (pad_size,) * 4)
    R = max_displacement // stride2
    outs = []
    for tj in range(-R, R + 1):
        for ti in range(-R, R + 1):
            dy, dx = tj * stride2, ti * stride2
            sl = p2[:, :, pad_size + dy : pad_size + dy + H,
                    pad_size + dx : pad_size + dx + W]
            outs.append((in1 * sl).sum(1) / (kernel_size * kernel_size * C))
    return torch.stack(outs, 1)


def corr_sniklaus(one, two, window_radius, stride):
    """sniklaus CuPy correlation: (2r+1)^2 channels, centers subsampled by
    ``stride``, displacements in multiples of ``stride``."""
    B, C, H, W = one.shape
    pad = window_radius * stride
    p2 = F.pad(two, (pad,) * 4)
    one_s = one[:, :, ::stride, ::stride]
    outs = []
    for tj in range(-window_radius, window_radius + 1):
        for ti in range(-window_radius, window_radius + 1):
            dy, dx = tj * stride, ti * stride
            sl = p2[:, :, pad + dy : pad + dy + H : stride,
                    pad + dx : pad + dx + W : stride]
            outs.append((one_s * sl).sum(1) / C)
    return torch.stack(outs, 1)


class _FakeCorrelationModule(torch.nn.Module):
    """Stands in for correlation_package.correlation.Correlation."""

    def __init__(self, pad_size=0, kernel_size=0, max_displacement=0,
                 stride1=1, stride2=2, corr_multiply=1):
        super().__init__()
        self.args = (pad_size, kernel_size, max_displacement, stride1, stride2)

    def forward(self, input1, input2):
        return corr_flownet2(input1, input2, *self.args)


def _fake_sniklaus_fn(window_radius):
    def FunctionCorrelation(tenOne=None, tenTwo=None, intStride=1, **kw):
        if tenOne is None:  # positional call styles
            raise TypeError("tenOne required")
        return corr_sniklaus(tenOne, tenTwo, window_radius, intStride)

    return FunctionCorrelation


# ------------------------------------------------------------ module loader

def _module(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def _load_file(alias_pkg: str, file_path: str, submodule: str):
    pkg = _module(alias_pkg)
    pkg.__path__ = []
    full = f"{alias_pkg}.{submodule}"
    spec = importlib.util.spec_from_file_location(full, file_path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[full] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference_pwcnet():
    """Reference pwc_net.py Network with the CuPy 81-ch correlation emulated
    and the ctor's torch.hub download bypassed (random init is the test
    weight source)."""
    corr_pkg = _module("refpwc.correlation")
    corr_pkg.correlation = _module("refpwc.correlation.correlation",
                                   FunctionCorrelation=_fake_sniklaus_fn(4))
    real_hub = torch.hub.load_state_dict_from_url
    real_load = torch.nn.Module.load_state_dict
    torch.hub.load_state_dict_from_url = lambda *a, **k: {}
    torch.nn.Module.load_state_dict = lambda self, sd, strict=True: None
    try:
        mod = _load_file("refpwc", f"{_REF}/pwc_net/pwc_net/pwc_net.py", "pwc_net")
        net = mod.Network()
    finally:
        torch.hub.load_state_dict_from_url = real_hub
        torch.nn.Module.load_state_dict = real_load
    return net.eval()


def load_reference_liteflownet():
    """Reference optical_flow/liteflownet.py Network (49-ch strided CuPy
    correlation emulated)."""
    corr_pkg = _module("reflfn.correlation")
    _module("reflfn.correlation.correlation",
            FunctionCorrelation=_fake_sniklaus_fn(3))
    corr_pkg.correlation = sys.modules["reflfn.correlation.correlation"]
    mod = _load_file("reflfn", f"{_REF}/optical_flow/optical_flow/liteflownet.py",
                     "liteflownet")
    return mod.Network().eval()


def load_reference_liteflownet3():
    """Reference liteflownet3.py Network (correlation_cuda ext emulated;
    its weight load is already commented out in the reference ctor)."""
    cp = _module("refl3.correlation_package")
    cp.correlation = _module("refl3.correlation_package.correlation",
                             Correlation=_FakeCorrelationModule)
    if "ament_index_python" not in sys.modules:
        _module("ament_index_python")
        _module("ament_index_python.packages",
                get_package_share_directory=lambda *a: "/tmp")
        sys.modules["ament_index_python"].packages = sys.modules[
            "ament_index_python.packages"]
    mod = _load_file("refl3", f"{_REF}/liteflownet3/liteflownet3/liteflownet3.py",
                     "liteflownet3")
    return mod.Network().eval()
