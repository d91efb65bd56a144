"""NeuFlow-v2 paper architecture: forward shapes + converter machinery.

The real pretrained checkpoint is unreachable (no egress; the reference
loads it from HuggingFace at runtime, reference neuflow_node.py:38), so
these tests pin the architecture's contract and prove the shape-signature
converter roundtrips — the weight-arrival readiness VERDICT r3 item 9 asks
for.  NeuFlowLite remains the serving default.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from opticalflowcontainer_tpu.models.neuflow_v2 import (
    NeuFlowV2,
    convert_neuflow_v2,
    estimate,
)


@pytest.fixture(scope="module")
def model_and_params():
    rng = np.random.default_rng(0)
    m = NeuFlowV2()
    i1 = jnp.asarray(rng.uniform(0, 1, (64, 96, 3)), jnp.float32)
    i2 = jnp.asarray(rng.uniform(0, 1, (64, 96, 3)), jnp.float32)
    p = m.init(jax.random.PRNGKey(0), i1, i2, 1)
    return m, p, i1, i2


def test_forward_shape_and_finite(model_and_params):
    m, p, i1, i2 = model_and_params
    flow = estimate(m, p, i1, i2, iters_s8=2)
    assert flow.shape == (64, 96, 2)
    assert np.isfinite(np.asarray(flow)).all()


def test_non_multiple_of_16_pads(model_and_params):
    m, p, i1, i2 = model_and_params
    flow = estimate(m, p, i1[:60, :90], i2[:60, :90], iters_s8=1)
    assert flow.shape == (60, 90, 2)


def test_global_matching_recovers_shift():
    """The parameter-free global-matching stage must recover an integer
    translation exactly on distinctive features: f2 = roll(f1, +3 in x)
    => flow_x ~ +3 in the interior (softmax peaks on the matched token)."""
    from opticalflowcontainer_tpu.models.neuflow_v2 import global_matching_flow

    rng = np.random.default_rng(0)
    f1 = jnp.asarray(rng.normal(0, 2.0, (12, 16, 64)), jnp.float32)
    f2 = jnp.roll(f1, 3, axis=1)
    flow = np.asarray(global_matching_flow(f1, f2))
    interior = flow[2:-2, 2:-10]  # away from the wrap seam
    assert np.allclose(interior[..., 0], 3.0, atol=0.05), interior[..., 0]
    assert np.allclose(interior[..., 1], 0.0, atol=0.05)


def _to_state_dict(p, torch, scramble=False, anonymous=False):
    """Build a torch-style state_dict from flax params.  Keys carry the flax
    module path (the way a real checkpoint carries ITS module names) unless
    ``anonymous``; ``scramble`` reverses iteration order to prove matching is
    name-driven, not positional."""
    flat = jax.tree_util.tree_flatten_with_path(p)[0]
    if scramble:
        flat = flat[::-1]
    sd = {}
    for i, (path, a) in enumerate(flat):
        toks = [t for t in jax.tree_util.keystr(path).replace("'", ".")
                .replace("[", ".").replace("]", ".").split(".")
                if t and t != "params"]
        a = np.asarray(a)
        if a.ndim == 4:
            t = torch.tensor(np.transpose(a, (3, 2, 0, 1)))
        elif a.ndim == 2:
            t = torch.tensor(a.T)
        else:
            t = torch.tensor(a)
        key = (f"{toks[0]}.m{i}.w" if anonymous else ".".join(toks))
        sd[key] = t
    return sd


def test_converter_roundtrip(model_and_params):
    """Scrambled (reverse-order) state_dict roundtrips exactly: same-shape
    tensors within a group are matched by NAME, never by position — a real
    torch state_dict iterates in module-definition order, not flax's
    alphabetical flatten order (ADVICE r4)."""
    torch = pytest.importorskip("torch")
    m, p, _, _ = model_and_params
    sd = _to_state_dict(p, torch, scramble=True)
    m2, p2 = convert_neuflow_v2(sd, m)
    mx = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda x, y: float(jnp.abs(x - y).max()), p, p2)))
    assert mx == 0.0


def test_converter_rejects_ambiguous_same_shape(model_and_params):
    """Anonymous keys (no usable module names) over a group whose leaves
    share shapes (cross_attn q/k/v/proj are all [C,C]) must raise, not
    silently match positionally."""
    torch = pytest.importorskip("torch")
    m, p, _, _ = model_and_params
    sd = _to_state_dict(p, torch, anonymous=True)
    with pytest.raises(ValueError, match="refusing to match positionally"):
        convert_neuflow_v2(sd, m)


def test_converter_rejects_unknown_module(model_and_params):
    torch = pytest.importorskip("torch")
    m, _, _, _ = model_and_params
    with pytest.raises(KeyError, match="unmapped checkpoint module"):
        convert_neuflow_v2({"bogus.w": torch.zeros(3, 3)}, m)


def test_converter_rejects_shape_mismatch(model_and_params):
    torch = pytest.importorskip("torch")
    m, _, _, _ = model_and_params
    with pytest.raises((ValueError, KeyError)):
        convert_neuflow_v2({"up.mask1.weight": torch.zeros(1, 2, 3, 4)}, m)
