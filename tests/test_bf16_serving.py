"""Reduced-precision (bf16) serving: every model family runs end-to-end with
bf16 params + bf16 inputs (the TPU analogue of the reference NeuFlow node's
fp16 tactic, reference neuflow_node.py:50-51), with flow staying close to the
fp32 forward.  Coordinate-carrying values (flow fields, warp grids) stay fp32
by design — see core/warp.py and the models' flow updates."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from opticalflowcontainer_tpu.models.common import cast_params


def _pair(rng, H, W):
    base = rng.uniform(0, 1, (H + 8, W + 8, 3)).astype(np.float32)
    return base[4 : 4 + H, 4 : 4 + W], base[4 : 4 + H, 2 : 2 + W]


def test_neuflow_lite_bf16_close_to_f32(rng):
    from opticalflowcontainer_tpu.models.neuflow import NeuFlowLite

    i1, i2 = _pair(rng, 48, 64)
    model = NeuFlowLite()
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(i1), jnp.asarray(i2))
    f32 = np.asarray(model.apply(params, jnp.asarray(i1), jnp.asarray(i2)))
    bf = np.asarray(
        model.apply(
            cast_params(params, jnp.bfloat16),
            jnp.asarray(i1, jnp.bfloat16),
            jnp.asarray(i2, jnp.bfloat16),
        )
    )
    assert bf.dtype == np.float32  # flow contract: fp32 out
    assert np.abs(bf - f32).max() < 0.5


def test_lfn3_bf16_close_to_f32(rng):
    from opticalflowcontainer_tpu.models.liteflownet3 import LiteFlowNet3

    i1, i2 = _pair(rng, 64, 96)
    model = LiteFlowNet3()
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(i1), jnp.asarray(i2))
    f32 = np.asarray(model.apply(params, jnp.asarray(i1), jnp.asarray(i2)))
    bf = np.asarray(
        model.apply(
            cast_params(params, jnp.bfloat16),
            jnp.asarray(i1, jnp.bfloat16),
            jnp.asarray(i2, jnp.bfloat16),
        )
    )
    assert bf.dtype == np.float32
    assert np.abs(bf - f32).max() < 0.1


def test_run_eval_bf16_wiring(rng):
    """`run_eval --bf16` must actually cast: params land in bf16 after the
    first call and the flow contract stays fp32 out (wiring-level check —
    the bench-crash lesson: an untested flag path is how a broken leg
    ships)."""
    from opticalflowcontainer_tpu.eval.run_eval import _make_method

    run = _make_method("neuflow", None, quick=True, bf16=True)
    i1, i2 = _pair(rng, 48, 64)
    flow = run(i1, i2)
    assert flow.dtype == np.float32 and flow.shape == (48, 64, 2)
    leaves = jax.tree_util.tree_leaves(run.params)
    assert all(p.dtype == jnp.bfloat16 for p in leaves)


def test_liteflownet_bf16_with_trained_weights(rng):
    from opticalflowcontainer_tpu.models.liteflownet import load_liteflownet_synth

    loaded = load_liteflownet_synth()
    if loaded is None:
        pytest.skip("packaged synth weights absent")
    model, params = loaded
    i1, i2 = _pair(rng, 64, 96)
    f32 = np.asarray(model.apply(params, jnp.asarray(i1), jnp.asarray(i2)))
    bf = np.asarray(
        model.apply(
            cast_params(params, jnp.bfloat16),
            jnp.asarray(i1, jnp.bfloat16),
            jnp.asarray(i2, jnp.bfloat16),
        )
    )
    assert bf.dtype == np.float32
    d = np.abs(bf - f32)
    assert d.mean() < 0.05 and d.max() < 0.3, (d.mean(), d.max())


def test_neuflow_v2_bf16_with_trained_weights(rng):
    from opticalflowcontainer_tpu.models.neuflow_v2 import load_neuflow_v2_synth

    loaded = load_neuflow_v2_synth()
    if loaded is None:
        pytest.skip("packaged synth weights absent")
    model, params = loaded
    i1, i2 = _pair(rng, 64, 96)
    f32 = np.asarray(model.apply(params, jnp.asarray(i1), jnp.asarray(i2)))
    bf = np.asarray(
        model.apply(
            cast_params(params, jnp.bfloat16),
            jnp.asarray(i1, jnp.bfloat16),
            jnp.asarray(i2, jnp.bfloat16),
        )
    )
    assert bf.dtype == np.float32
    d = np.abs(bf - f32)
    assert d.mean() < 0.05 and d.max() < 0.3, (d.mean(), d.max())


def test_pwcnet_bf16_with_trained_weights(rng):
    """PWC is a direct-regression pyramid with a x20 output scaling (no
    zero-anchored correlation argmax like RAFT/NeuFlow/LFN3), so bf16
    mantissa noise is amplified ~an order of magnitude more than in the
    other families (measured on the packaged bootstrap weights: mean 0.82 px
    / max 3.0 px on noise images whose own easy-suite EPE is 1.52).  The
    test locks 'runs end-to-end, fp32 flow out, error bounded', not
    sub-pixel agreement."""
    from opticalflowcontainer_tpu.models.pwcnet import load_pwcnet_synth

    loaded = load_pwcnet_synth()
    if loaded is None:
        pytest.skip("packaged synth weights absent")
    model, params = loaded
    i1, i2 = _pair(rng, 64, 128)  # W must be a multiple of 64
    f32 = np.asarray(model.apply(params, jnp.asarray(i1), jnp.asarray(i2)))
    bf = np.asarray(
        model.apply(
            cast_params(params, jnp.bfloat16),
            jnp.asarray(i1, jnp.bfloat16),
            jnp.asarray(i2, jnp.bfloat16),
        )
    )
    assert bf.dtype == np.float32
    d = np.abs(bf - f32)
    assert d.mean() < 2.5 and d.max() < 9.0, (d.mean(), d.max())


def test_raft_small_bf16_with_trained_weights(rng):
    """RAFT's iterative GRU amplifies precision noise on random weights; with
    the trained synthetic checkpoint the bf16 flow must stay within 0.5 px of
    fp32 (the VERDICT acceptance bar)."""
    from opticalflowcontainer_tpu.models.raft import load_raft_small_synth

    loaded = load_raft_small_synth()
    if loaded is None:
        pytest.skip("packaged synth weights absent")
    model, params = loaded
    i1, i2 = _pair(rng, 64, 96)
    f32 = np.asarray(model.apply(params, jnp.asarray(i1), jnp.asarray(i2), 8)[-1])
    bf = np.asarray(
        model.apply(
            cast_params(params, jnp.bfloat16),
            jnp.asarray(i1, jnp.bfloat16),
            jnp.asarray(i2, jnp.bfloat16),
            8,
        )[-1]
    )
    d = np.abs(bf - f32)
    assert d.mean() < 0.1 and d.max() < 0.5, (d.mean(), d.max())
