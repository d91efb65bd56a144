"""Full-model numeric parity against the reference PyTorch networks.

The reference model files are imported READ-ONLY from /root/reference (their
CUDA/CuPy correlation replaced by pure-torch emulations of the exact kernel
semantics — see _refload.py), constructed with torch's default random init,
exported through our torch->flax converters, and both forwards are run on the
same inputs.  Flow EPE must be ~float32-roundoff, proving the entire
architecture transcription: layer wiring, warp conventions (incl. LFN3's
W/(W-1) deformation scale), correlation channel ordering, flow-scale tables
and the x20 output scaling.

RAFT-vs-torchvision parity is not directly testable here (torchvision is not
installed), so the RAFT check uses tests/_torch_raft.py: the same
architecture in PyTorch primitives whose semantics we don't control
(F.grid_sample lookup, F.avg_pool2d pyramid, F.interpolate upsample,
InstanceNorm2d) — an independent op-semantics oracle plus a converter
(convert.convert_raft_small) exercised end to end.

Reference forwards: pwc_net.py:221-231, liteflownet.py:210-241,
liteflownet3.py:258-285.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402  (conftest forces the CPU backend)

from opticalflowcontainer_tpu.models import convert  # noqa: E402


def _run_pair(seed, H, W):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0.0, 1.0, (H + 8, W + 8, 3)).astype(np.float32)
    i1 = base[4 : 4 + H, 4 : 4 + W]
    i2 = base[4 : 4 + H, 2 : 2 + W]  # coherent 2-px shift + noise
    i2 = np.clip(i2 + rng.normal(0, 0.02, i2.shape).astype(np.float32), 0, 1)
    return i1, i2


def _torch_in(img):
    return torch.from_numpy(np.ascontiguousarray(img.transpose(2, 0, 1)))[None]


def _compare(tflow, jflow, tag):
    tf = tflow[0].detach().numpy().transpose(1, 2, 0)
    jf = np.asarray(jflow)
    assert tf.shape == jf.shape, (tag, tf.shape, jf.shape)
    assert float(np.std(tf)) > 1e-4, f"{tag}: reference flow degenerate"
    epe = np.sqrt(((tf - jf) ** 2).sum(-1))
    assert float(epe.mean()) < 1e-3, (tag, epe.mean(), np.abs(tf).mean())
    assert float(epe.max()) < 2e-2, (tag, epe.max())


def test_pwcnet_matches_reference_forward():
    from _refload import load_reference_pwcnet
    from opticalflowcontainer_tpu.models.pwcnet import PWCNet

    torch.manual_seed(0)
    net = load_reference_pwcnet()
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    params = convert.convert_pwcnet(sd)

    i1, i2 = _run_pair(1, 64, 128)
    with torch.no_grad():
        tflow = net(_torch_in(i1).clone(), _torch_in(i2).clone())
    jflow = PWCNet().apply(params, jnp.asarray(i1), jnp.asarray(i2))
    _compare(tflow, jflow, "pwcnet")


def test_liteflownet_matches_reference_forward():
    from _refload import load_reference_liteflownet
    from opticalflowcontainer_tpu.models.liteflownet import LiteFlowNet

    torch.manual_seed(1)
    net = load_reference_liteflownet()
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    params = convert.convert_liteflownet(sd)

    i1, i2 = _run_pair(2, 64, 96)
    from _refload import cpu_cuda_shim
    with torch.no_grad(), cpu_cuda_shim():
        # the reference forward subtracts means IN PLACE: pass clones
        tflow = net(_torch_in(i1).clone(), _torch_in(i2).clone())
    jflow = LiteFlowNet().apply(params, jnp.asarray(i1), jnp.asarray(i2))
    _compare(tflow, jflow, "liteflownet")


def test_liteflownet3_matches_reference_forward():
    from _refload import load_reference_liteflownet3
    from opticalflowcontainer_tpu.models.liteflownet3 import LiteFlowNet3

    torch.manual_seed(2)
    net = load_reference_liteflownet3()
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    params = convert.convert_liteflownet3(sd)

    i1, i2 = _run_pair(3, 64, 96)
    from _refload import cpu_cuda_shim
    with torch.no_grad(), cpu_cuda_shim():
        tflow = net(_torch_in(i1).clone(), _torch_in(i2).clone())
    jflow = LiteFlowNet3().apply(params, jnp.asarray(i1), jnp.asarray(i2))
    _compare(tflow, jflow, "liteflownet3")


def test_raft_small_matches_torch_oracle():
    from _torch_raft import TorchRAFTSmall
    from opticalflowcontainer_tpu.models.raft import RAFTSmall

    torch.manual_seed(3)
    net = TorchRAFTSmall()
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    params = convert.convert_raft_small(sd)

    i1, i2 = _run_pair(4, 64, 96)
    with torch.no_grad():
        tflow = net(_torch_in(i1), _torch_in(i2), iters=3)
    jflow = RAFTSmall().apply(params, jnp.asarray(i1), jnp.asarray(i2), 3)[-1]
    _compare(tflow, jflow, "raft_small")
