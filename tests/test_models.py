"""Model zoo tests: forward shapes/finiteness, torch layer parity
(Conv/Deconv), and converter-table completeness against model.init trees."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from flax.traverse_util import flatten_dict

from opticalflowcontainer_tpu.models import (
    PWCNet,
    LiteFlowNet,
    LiteFlowNet3,
    RAFTSmall,
    NeuFlowLite,
)
from opticalflowcontainer_tpu.models import convert as C


def _imgs(rng, H, W):
    return (
        rng.uniform(0, 1, (H, W, 3)).astype(np.float32),
        rng.uniform(0, 1, (H, W, 3)).astype(np.float32),
    )


def test_pwcnet_forward(rng):
    i1, i2 = _imgs(rng, 64, 64)
    model = PWCNet()
    params = model.init(jax.random.PRNGKey(0), i1, i2)
    flow = model.apply(params, i1, i2)
    assert flow.shape == (16, 16, 2)
    assert np.isfinite(np.asarray(flow)).all()


def test_liteflownet_forward(rng):
    i1, i2 = _imgs(rng, 64, 96)
    model = LiteFlowNet()
    params = model.init(jax.random.PRNGKey(0), i1, i2)
    flow = model.apply(params, i1, i2)
    assert flow.shape == (32, 48, 2)
    assert np.isfinite(np.asarray(flow)).all()
    # training supervision path: per-level raw flows, final level == output/20
    flow2, pyr = model.apply(params, i1, i2, return_pyramid=True)
    assert set(pyr) == {2, 3, 4, 5, 6}
    assert pyr[6].shape == (2, 3, 2) and pyr[2].shape == (32, 48, 2)
    np.testing.assert_allclose(np.asarray(flow2), np.asarray(flow), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(pyr[2]) * 20.0, np.asarray(flow), rtol=1e-5, atol=1e-5
    )


def test_liteflownet3_forward(rng):
    i1, i2 = _imgs(rng, 64, 96)
    model = LiteFlowNet3()
    params = model.init(jax.random.PRNGKey(0), i1, i2)
    flow = model.apply(params, i1, i2)
    assert flow.shape == (16, 24, 2)
    assert np.isfinite(np.asarray(flow)).all()
    # training supervision path: per-level raw flows, final level == output/20
    flow2, pyr = model.apply(params, i1, i2, return_pyramid=True)
    assert set(pyr) == {3, 4, 5, 6}
    assert pyr[6].shape == (2, 3, 2) and pyr[3].shape == (16, 24, 2)
    np.testing.assert_allclose(np.asarray(flow2), np.asarray(flow), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(pyr[3]) * 20.0, np.asarray(flow), rtol=1e-5, atol=1e-5
    )


def test_raft_small_forward(rng):
    i1, i2 = _imgs(rng, 48, 64)
    model = RAFTSmall()
    params = model.init(jax.random.PRNGKey(0), i1, i2, 2)
    flows = model.apply(params, i1, i2, 2)
    assert flows.shape == (2, 48, 64, 2)
    assert np.isfinite(np.asarray(flows)).all()
    # inference contract: final_only returns exactly the stacked [-1] flow
    last = model.apply(params, i1, i2, 2, final_only=True)
    np.testing.assert_array_equal(np.asarray(last), np.asarray(flows[-1]))
    # final_only with iters=0 returns the upsampled zero-init flow instead
    # of an IndexError at trace time (ADVICE r4)
    zero = model.apply(params, i1, i2, 0, final_only=True)
    np.testing.assert_array_equal(np.asarray(zero), 0.0)


def test_neuflow_forward(rng):
    i1, i2 = _imgs(rng, 64, 96)
    model = NeuFlowLite()
    params = model.init(jax.random.PRNGKey(0), i1, i2)
    flow = model.apply(params, i1, i2)
    assert flow.shape == (64, 96, 2)
    assert np.isfinite(np.asarray(flow)).all()


def test_conv_matches_torch(rng):
    import torch

    from opticalflowcontainer_tpu.models.common import Conv, convert_torch_conv

    x = rng.standard_normal((1, 10, 12, 6)).astype(np.float32)
    tconv = torch.nn.Conv2d(6, 8, 3, stride=2, padding=1)
    ref = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
    k, b = convert_torch_conv(
        tconv.weight.detach().numpy(), tconv.bias.detach().numpy()
    )
    model = Conv(8, kernel=3, stride=2)
    params = {"params": {"Conv_0": {"kernel": k, "bias": b}}}
    ours = np.asarray(model.apply(params, x)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("groups", [1, 2])
def test_deconv_matches_torch(rng, groups):
    import torch

    from opticalflowcontainer_tpu.models.common import Deconv, convert_torch_deconv

    cin, cout = 4, 4
    x = rng.standard_normal((1, 7, 9, cin)).astype(np.float32)
    tdeconv = torch.nn.ConvTranspose2d(cin, cout, 4, stride=2, padding=1, groups=groups)
    ref = tdeconv(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
    k, b = convert_torch_deconv(
        tdeconv.weight.detach().numpy(), tdeconv.bias.detach().numpy(), groups
    )
    model = Deconv(cout, groups=groups)
    params = {"params": {"kernel": k, "bias": b}}
    ours = np.asarray(model.apply(params, x)).transpose(0, 3, 1, 2)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize(
    "model_fn,table_fn,size",
    [
        (PWCNet, C.pwcnet_table, (64, 64)),
        (LiteFlowNet, C.liteflownet_table, (64, 64)),
        (LiteFlowNet3, C.liteflownet3_table, (64, 64)),
    ],
)
def test_converter_roundtrip(rng, model_fn, table_fn, size):
    """Fabricate a torch state dict from model.init via the inverse transform,
    convert it back, and require exact tree + value equality: proves the
    converter covers every param with correct shapes and is lossless."""
    i1, i2 = _imgs(rng, *size)
    model = model_fn()
    params = model.init(jax.random.PRNGKey(0), i1, i2)
    flat = flatten_dict(params["params"])
    table = table_fn()

    # build synthetic torch sd
    sd = {}
    covered = set()
    for e in table:
        path = e.flax_path + (("Conv_0",) if e.kind == "conv" else ())
        kernel = np.asarray(flat[path + ("kernel",)])
        bias_key = path + ("bias",)
        bias = np.asarray(flat[bias_key]) if bias_key in flat else None
        sd.update(C.invert_entry(e, kernel, bias))
        covered.add(path)

    # every init param must be covered by the table
    param_paths = {k[:-1] for k in flat}
    assert param_paths == covered, (
        f"uncovered: {sorted(param_paths - covered)[:5]} "
        f"extra: {sorted(covered - param_paths)[:5]}"
    )

    restored = C.apply_table(sd, table)
    rflat = flatten_dict(restored["params"])
    assert set(rflat) == set(flat)
    for k in flat:
        np.testing.assert_allclose(
            np.asarray(rflat[k]), np.asarray(flat[k]), atol=1e-6, err_msg=str(k)
        )

    # real sniklaus checkpoints use NESTED module* names
    # (moduleExtractor.moduleOne.0.weight): the rename must replace every
    # occurrence, not just the first (reference pwc_net.py:219 is a global
    # str.replace) — regression for the first-occurrence-only bug
    sd_module = {k.replace("net", "module"): v for k, v in sd.items()}
    rflat2 = flatten_dict(C.apply_table(sd_module, table)["params"])
    assert set(rflat2) == set(flat)
    for k in flat:
        np.testing.assert_allclose(
            np.asarray(rflat2[k]), np.asarray(flat[k]), atol=1e-6,
            err_msg=str(k)
        )


def test_conv_bn_fusion(rng):
    import torch

    from opticalflowcontainer_tpu.models.common import fuse_conv_bn, convert_torch_conv

    conv = torch.nn.Conv2d(3, 8, 3, padding=1)
    bn = torch.nn.BatchNorm2d(8)
    bn.eval()
    bn.running_mean.data = torch.randn(8)
    bn.running_var.data = torch.rand(8) + 0.5
    bn.weight.data = torch.randn(8)
    bn.bias.data = torch.randn(8)
    x = torch.randn(1, 3, 9, 9)
    ref = bn(conv(x)).detach().numpy()

    k, b = convert_torch_conv(conv.weight.detach().numpy(), conv.bias.detach().numpy())
    kf, bf = fuse_conv_bn(
        k, b,
        bn.weight.detach().numpy(), bn.bias.detach().numpy(),
        bn.running_mean.numpy(), bn.running_var.numpy(), bn.eps,
    )
    from opticalflowcontainer_tpu.models.common import Conv

    ours = Conv(8).apply(
        {"params": {"Conv_0": {"kernel": kf, "bias": bf}}},
        x.numpy().transpose(0, 2, 3, 1),
    )
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-4
    )


def test_pwcnet_estimate_contract(rng):
    """estimate(): odd input size -> full-res flow with u,v rescaled."""
    from opticalflowcontainer_tpu.models.pwcnet import estimate

    i1, i2 = _imgs(rng, 50, 70)
    model = PWCNet()
    params = model.init(jax.random.PRNGKey(0), np.zeros((64, 64, 3), np.float32),
                        np.zeros((64, 64, 3), np.float32))
    flow = np.asarray(estimate(model, params, i1, i2))
    assert flow.shape == (50, 70, 2)
    assert np.isfinite(flow).all()


def test_packaged_raft_weights_load_and_run(rng):
    from opticalflowcontainer_tpu.models.raft import load_raft_small_synth

    loaded = load_raft_small_synth()
    if loaded is None:
        pytest.skip("packaged weights not present")
    model, params = loaded
    i1, i2 = _imgs(rng, 48, 64)
    flows = model.apply(params, i1, i2, 2)
    assert flows.shape == (2, 48, 64, 2)
    assert np.isfinite(np.asarray(flows)).all()


def test_cast_params_bf16_conv(rng):
    from opticalflowcontainer_tpu.models.common import Conv, cast_params

    x = rng.standard_normal((1, 16, 16, 8)).astype(np.float32)
    model = Conv(16)
    params = model.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(model.apply(params, x))
    pb = cast_params(params, jnp.bfloat16)
    out = np.asarray(
        model.apply(pb, jnp.asarray(x, jnp.bfloat16)).astype(jnp.float32)
    )
    assert out.dtype == np.float32
    assert np.abs(out - ref).max() < 0.1  # bf16 rounding only


@pytest.mark.parametrize("mod_name,loader_name,tol", [
    ("raft", "load_raft_small_synth", 1.0),
    ("raft", "load_raft_synth", 1.0),
    ("neuflow", "load_neuflow_lite_synth", 1.2),
    ("liteflownet3", "load_liteflownet3_synth", 1.2),
    ("liteflownet", "load_liteflownet_synth", 1.2),
    ("neuflow_v2", "load_neuflow_v2_synth", 1.2),
    # PWC's bootstrap weights are the weakest in the zoo (direct-regression
    # pyramid, decoder-only training): u err ~1.0 px on this probe.
    ("pwcnet", "load_pwcnet_synth", 2.0),
])
def test_packaged_weights_recover_translation(mod_name, loader_name, tol, rng):
    """The shipped TPU-trained checkpoints must load against the current
    architectures and recover a known translation — guards weight/arch drift
    (the reference's equivalent risk is a checkpoint/model mismatch at node
    start, reference lfn3_node.py:54-56)."""
    import importlib

    import cv2

    mod = importlib.import_module(
        f"opticalflowcontainer_tpu.models.{mod_name}")
    loaded = getattr(mod, loader_name)()
    if loaded is None and mod_name == "liteflownet":
        pytest.skip("liteflownet synth npz not packaged yet")
    assert loaded is not None, f"{loader_name}: packaged npz missing"
    model, params = loaded
    base = cv2.GaussianBlur(
        rng.uniform(0, 1, (112, 144)).astype(np.float32), (0, 0), 2.0
    )
    i1 = np.repeat(base[:96, 8 : 8 + 128, None], 3, -1)
    i2 = np.repeat(base[:96, 4 : 4 + 128, None], 3, -1)  # shift +4 px
    est = mod.estimate
    kw = {"iters": 8} if mod_name == "raft" else {}
    flow = np.asarray(est(model, params, jnp.asarray(i1), jnp.asarray(i2), **kw))
    assert abs(float(flow[..., 0].mean()) - 4.0) < tol, flow[..., 0].mean()
    assert abs(float(flow[..., 1].mean())) < tol
