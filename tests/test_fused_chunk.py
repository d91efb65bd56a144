"""Chunked fused streaming (runtime/fused.py step_many): the K-frames-per-
device-program mode that amortizes the axon tunnel's ~80-90 ms
per-execution cost (one program execution per frame cannot hold 30 fps
through a degraded tunnel regardless of kernel speed — measured 2026-08-19).
Chunked velocities must equal the per-frame step exactly (same program body
under lax.scan)."""
import numpy as np
import pytest

from opticalflowcontainer_tpu.classical import farneback as fb
from opticalflowcontainer_tpu.runtime import fused as fz


@pytest.fixture()
def force_planes_path(monkeypatch):
    import opticalflowcontainer_tpu.core.filters as cf

    monkeypatch.setattr(fb, "BLOCK_WARP_INTERPRET", True)
    monkeypatch.setattr(cf, "_on_tpu", lambda: True)
    monkeypatch.setattr(fb, "_on_tpu", lambda: True)


def test_step_many_matches_sequential(force_planes_path):
    rng = np.random.default_rng(0)
    H, W = 64, 128
    base = rng.uniform(0, 255, (H, W + 12, 3)).astype(np.uint8)
    frames = [np.ascontiguousarray(base[:, i : i + W]) for i in range(9)]
    kw = dict(levels=2, winsize=9, iterations=1)

    s1 = fz.FusedFarnebackStream(aggregate="mean", **kw)
    s1.step(frames[0])
    seq = [float(s1.step(f)) for f in frames[1:9]]

    s2 = fz.FusedFarnebackStream(aggregate="mean", **kw)
    s2.step(frames[0])
    chunked = list(np.asarray(s2.step_many(np.stack(frames[1:5])))) + list(
        np.asarray(s2.step_many(np.stack(frames[5:9]))))
    assert np.allclose(seq, chunked, atol=1e-6)


def test_step_many_requires_seed(force_planes_path):
    s = fz.FusedFarnebackStream(levels=2, winsize=9, iterations=1)
    with pytest.raises(AssertionError, match="seed the stream"):
        s.step_many(np.zeros((2, 64, 128, 3), np.uint8))


def test_measure_stream_latency_chunk_mode(force_planes_path):
    lat = fz.measure_stream_latency(height=64, width=128, fps=200.0,
                                    n_frames=10, chunk=4, drain_async=True,
                                    levels=2, winsize=9, iterations=1)
    assert lat["chunk"] == 4
    assert lat["n_measured"] == 8  # two full chunks; the 9th frame is tail


def test_model_stream_step_many_matches_sequential():
    """FusedModelStream.step_many (the LFN3 chunk escalation in bench.py's
    stream leg) must equal the per-frame step exactly — same program body
    under lax.scan, carrying the previous normalized frame."""
    import jax.numpy as jnp

    from opticalflowcontainer_tpu.models.liteflownet3 import (
        LiteFlowNet3,
        estimate,
    )

    rng = np.random.default_rng(1)
    H, W = 64, 96
    model = LiteFlowNet3()
    params = model.init(
        __import__("jax").random.PRNGKey(0),
        jnp.zeros((H, W, 3)), jnp.zeros((H, W, 3)))
    base = rng.uniform(0, 255, (H, W + 10, 3)).astype(np.uint8)
    frames = [np.ascontiguousarray(base[:, i : i + W]) for i in range(6)]

    s1 = fz.FusedModelStream(model, params, estimate, bgr_to_rgb=True)
    s1.step(frames[0])
    seq = [float(s1.step(f)) for f in frames[1:6]]

    s2 = fz.FusedModelStream(model, params, estimate, bgr_to_rgb=True)
    s2.step(frames[0])
    with pytest.raises(AssertionError, match="seed the stream"):
        fz.FusedModelStream(model, params, estimate).step_many(
            np.stack(frames[1:3]))
    chunked = list(np.asarray(s2.step_many(np.stack(frames[1:4])))) + list(
        np.asarray(s2.step_many(np.stack(frames[4:6]))))
    assert np.allclose(seq, chunked, atol=1e-5)


def test_model_stream_bf16_close_to_f32():
    """bf16 fused serving (the reference NeuFlow node's fp16 tactic,
    reference neuflow_node.py:50-51): params + frames cast to bf16, the
    displacement scalar stays fp32 and close to the fp32 stream — and
    step_many must agree with per-frame step in bf16 too."""
    import jax.numpy as jnp

    from opticalflowcontainer_tpu.models.neuflow import (
        NeuFlowLite,
        estimate,
    )

    rng = np.random.default_rng(2)
    H, W = 48, 64
    model = NeuFlowLite()
    params = model.init(
        __import__("jax").random.PRNGKey(0),
        jnp.zeros((H, W, 3)), jnp.zeros((H, W, 3)))
    base = rng.uniform(0, 255, (H, W + 10, 3)).astype(np.uint8)
    frames = [np.ascontiguousarray(base[:, i : i + W]) for i in range(5)]

    s32 = fz.FusedModelStream(model, params, estimate)
    s32.step(frames[0])
    f32 = [float(s32.step(f)) for f in frames[1:]]

    sb = fz.FusedModelStream(model, params, estimate, bf16=True)
    sb.step(frames[0])
    bf = [float(sb.step(f)) for f in frames[1:]]
    assert sb._rgb.dtype == jnp.bfloat16  # frames carried in bf16
    assert np.max(np.abs(np.asarray(bf) - np.asarray(f32))) < 0.25, (bf, f32)

    sb2 = fz.FusedModelStream(model, params, estimate, bf16=True)
    sb2.step(frames[0])
    chunked = np.asarray(sb2.step_many(np.stack(frames[1:])))
    # in bf16 the scan-fused chunk program and the single-step program may
    # round differently (XLA fuses the cast into different neighbors), so
    # chunk-vs-step is close, not bit-equal like the fp32 assertion above
    assert np.allclose(chunked, bf, atol=1e-2)
