"""Fused per-frame device program (runtime.fused): the single-program
ingest->flow->aggregate path must reproduce the unfused FlowNode pipeline
(cf. reference per-frame hot loop, lfn3_node.py:145-210, which round-trips
the full field to the host)."""
import numpy as np
import pytest

from opticalflowcontainer_tpu.runtime import (
    Bus,
    FlowNode,
    NodeParams,
    SyntheticCamera,
    make_farneback_backend,
    make_fused_farneback_backend,
)
from opticalflowcontainer_tpu.runtime.fused import (
    FusedFarnebackStream,
    measure_stream_latency,
)
from opticalflowcontainer_tpu.runtime.messages import Header, ImageMsg

FB = dict(levels=2, winsize=13, iterations=2)


def _frames(n=4, h=64, w=96, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 255, (h, w + 2 * n, 3)).astype(np.uint8)
    return [np.ascontiguousarray(base[:, 2 * i : 2 * i + w]) for i in range(n)]


def test_fused_matches_unfused_mean():
    import jax.numpy as jnp

    from opticalflowcontainer_tpu.classical import calc_optical_flow_farneback
    from opticalflowcontainer_tpu.core.color import bgr_to_gray

    f = _frames()
    stream = FusedFarnebackStream(aggregate="mean", **FB)
    stream.step(f[0])
    for a, b in zip(f, f[1:]):
        du = float(stream.step(b))
        ga = np.asarray(bgr_to_gray(jnp.asarray(a, jnp.float32)))
        gb = np.asarray(bgr_to_gray(jnp.asarray(b, jnp.float32)))
        flow = np.asarray(calc_optical_flow_farneback(ga, gb, **FB))
        assert du == pytest.approx(float(flow[..., 0].mean()), abs=1e-4)


def test_fused_masked_median():
    import jax.numpy as jnp

    from opticalflowcontainer_tpu.classical import calc_optical_flow_farneback
    from opticalflowcontainer_tpu.core.color import bgr_to_gray

    f = _frames(n=2)
    h, w = f[0].shape[:2]
    mask = np.zeros((h, w), bool)
    mask[10:40, 20:70] = True
    stream = FusedFarnebackStream(aggregate="median", **FB)
    stream.step(f[0], mask)
    du = float(stream.step(f[1], mask))
    ga = np.asarray(bgr_to_gray(jnp.asarray(f[0], jnp.float32)))
    gb = np.asarray(bgr_to_gray(jnp.asarray(f[1], jnp.float32)))
    flow = np.asarray(calc_optical_flow_farneback(ga, gb, **FB))
    assert du == pytest.approx(float(np.median(flow[..., 0][mask])), abs=1e-4)


def test_fused_flownode_matches_regular_node():
    """Same frames through a fused-backend node and a regular node publish
    the same velocities (scalar leaves the device, not the field)."""
    f = _frames(n=5)
    got = {}
    for kind in ("regular", "fused"):
        bus = Bus()
        backend = (
            make_fused_farneback_backend(**FB)
            if kind == "fused"
            else make_farneback_backend(**FB)
        )
        node = FlowNode(backend, NodeParams(name="T"), bus)
        vals = []
        bus.subscribe("/optical_flow/T_velocity", lambda m, v=vals: v.append(m.x))
        for i, frame in enumerate(f):
            node._image_callback(ImageMsg(Header(i / 15.0), frame, "bgr8"))
        got[kind] = vals
    assert len(got["fused"]) == len(got["regular"]) == len(f) - 1
    np.testing.assert_allclose(got["fused"], got["regular"], atol=1e-4)


def test_fused_node_recovers_velocity():
    """Fused path on the self-checking synthetic scene: callbacks are driven
    directly (no paced threads — the demo's thread form is load-sensitive in
    CI), so the velocity must converge to the scene's ground truth."""
    fps, p2m, gt = 30.0, 0.000857, 0.05
    bus = Bus()
    cam = SyntheticCamera(width=320, height=240, fps=fps, n_frames=10,
                          velocity_mps=gt, pixel_to_meter=p2m)
    node = FlowNode(
        make_fused_farneback_backend(**FB),
        NodeParams(width=320, height=240, pixel_to_meter=p2m, name="F"),
        bus,
    )
    vals = []
    bus.subscribe("/optical_flow/F_velocity", lambda m: vals.append(m.x))
    for i in range(10):
        node._image_callback(ImageMsg(Header(i / fps), cam.frame_at(i), "bgr8"))
    assert len(vals) == 9
    assert abs(np.mean(vals[2:]) - gt) < 0.01


def test_measure_stream_latency_smoke():
    out = measure_stream_latency(
        height=48, width=64, fps=200.0, n_frames=6, paced=False, **FB
    )
    assert out["p50_ms"] > 0 and out["p99_ms"] >= out["p50_ms"]
    assert out["n_frames"] == 5


def test_measure_stream_latency_drain_async_smoke():
    """drain_async moves host syncs to a drainer thread (the reference's
    capture/inference thread shape); every frame must still be measured and
    the divergence-based held_rate must be a bool."""
    out = measure_stream_latency(
        height=48, width=64, fps=200.0, n_frames=8, paced=False,
        sync_every=2, drain_async=True, **FB
    )
    assert out["n_frames"] == 7
    assert out["p50_ms"] > 0 and out["p99_ms"] >= out["p50_ms"]
    assert isinstance(out["held_rate"], bool)


def test_measure_stream_latency_drainer_death_fails_held():
    """A drainer-thread exception mid-run (transient sync error through the
    tunnel) must fail held_rate and surface drainer_error — not silently
    compute held from the few frames drained before the death."""

    class _Bomb:
        def __init__(self, k):
            self.k = k

        def __float__(self):
            if self.k >= 2:
                raise RuntimeError("synthetic sync failure")
            return 0.0

    class _FakeStream:
        def __init__(self):
            self.k = 0

        def warmup(self, frame, mask=None):
            pass

        def reset(self):
            self.k = 0

        def step(self, frame, mask=None):
            self.k += 1
            return _Bomb(self.k)

    out = measure_stream_latency(
        height=16, width=16, fps=500.0, n_frames=10, paced=False,
        sync_every=1, drain_async=True, stream=_FakeStream()
    )
    assert out["held_rate"] is False
    assert out["drainer_error"] is not None
    assert out["n_measured"] < out["n_frames"]


def test_fused_model_stream_matches_unfused_backend():
    """Learned-model fused path (model estimate + aggregation on device)
    publishes the same velocities as make_model_backend + host aggregation."""
    import jax

    from opticalflowcontainer_tpu.models import NeuFlowLite
    from opticalflowcontainer_tpu.models.neuflow import estimate
    from opticalflowcontainer_tpu.runtime import (
        make_fused_model_backend,
        make_model_backend,
    )
    from opticalflowcontainer_tpu.runtime.nodes import FlowNode as FN

    model = NeuFlowLite()
    f = _frames(n=4, h=64, w=96, seed=3)
    i0 = np.zeros((64, 96, 3), np.float32)
    params = model.init(jax.random.PRNGKey(0), i0, i0)

    fused = make_fused_model_backend(model, params, estimate)
    plain = make_model_backend(
        lambda a, b: estimate(model, params, a, b)
    )
    mask = np.zeros((64, 96), bool)
    mask[8:40, 16:80] = True
    for a, b in zip(f, f[1:]):
        du = fused(a, b, 1.0)
        flow = plain(a, b, 1.0)
        assert du == pytest.approx(float(flow[..., 0].mean()), abs=1e-4)
    # masked aggregation on device
    fused2 = make_fused_model_backend(model, params, estimate)
    du_m = fused2(f[0], f[1], 1.0, mask)
    flow01 = plain(f[0], f[1], 1.0)
    assert du_m == pytest.approx(float(flow01[..., 0][mask].mean()), abs=1e-4)


def test_fused_planes_mode_matches_gray_path(monkeypatch):
    """The planes-carrying stream state (TPU block-warp path: each frame's
    polynomial expansion computed once, previous frame's planes reused from
    device state) must produce the same per-frame displacement as the
    gray-carrying path that re-expands both frames every step."""
    import opticalflowcontainer_tpu.classical.farneback as fb
    import opticalflowcontainer_tpu.runtime.fused as fused

    f = _frames(n=4, h=96, w=128)
    ref = fused.FusedFarnebackStream(aggregate="mean", **FB)
    refs = [ref.step(fr) for fr in f]

    monkeypatch.setattr(fb, "BLOCK_WARP_INTERPRET", True)
    monkeypatch.setattr(fb, "_on_tpu", lambda: True)
    st = fused.FusedFarnebackStream(aggregate="mean", **FB)
    assert st._planes_mode
    outs = [st.step(fr) for fr in f]
    assert refs[0] is None and outs[0] is None
    for r, o in zip(refs[1:], outs[1:]):
        # gray path = exact lax gather fp32; planes path = block-warp kernel
        # with bf16 patches — same tolerance as the kernel-vs-exact guard
        assert abs(float(r) - float(o)) < 0.05, (float(r), float(o))


def test_fused_finest_share_matches_all_share(monkeypatch):
    """Above the share gate the stream state is (gray, finest planes): the
    coarse levels re-expand pairwise, only the finest level reuses stored
    planes.  Same math, different sharing — the per-frame displacements must
    match the all-levels planes path bit-closely (both run the block-warp
    kernel; the finest R0 slice is exact placement)."""
    import opticalflowcontainer_tpu.classical.farneback as fb
    import opticalflowcontainer_tpu.runtime.fused as fused

    monkeypatch.setattr(fb, "BLOCK_WARP_INTERPRET", True)
    monkeypatch.setattr(fb, "_on_tpu", lambda: True)

    f = _frames(n=4, h=96, w=128)
    ref = fused.FusedFarnebackStream(aggregate="mean", **FB)
    refs = [ref.step(fr) for fr in f]
    assert ref._share == "all"

    monkeypatch.setattr(fb, "CLIP_SHARE_ALL_MAX_PIXELS", 1000)
    st = fused.FusedFarnebackStream(aggregate="mean", **FB)
    outs = [st.step(fr) for fr in f]
    assert st._share == "finest" and st._planes_active
    assert refs[0] is None and outs[0] is None
    for r, o in zip(refs[1:], outs[1:]):
        assert abs(float(r) - float(o)) < 1e-3, (float(r), float(o))


def test_farneback_stream_step_finest_matches_pairwise(monkeypatch):
    """farneback_stream_step(share='finest') must reproduce the pairwise
    block-warp flow field exactly-ish: the coarse levels ARE the pair
    program and the finest stored-planes R0 is the same exact core slice
    the all-levels state uses."""
    import jax.numpy as jnp

    import opticalflowcontainer_tpu.classical.farneback as fb

    monkeypatch.setattr(fb, "BLOCK_WARP_INTERPRET", True)
    monkeypatch.setattr(fb, "_on_tpu", lambda: True)

    rng = np.random.default_rng(7)
    base = rng.uniform(0, 255, (96, 128 + 6)).astype(np.float32)
    f0, f1, f2 = (base[:, 2 * t : 2 * t + 128] for t in range(3))
    kw = dict(levels=2, winsize=13, iterations=2)

    want01 = np.asarray(fb.calc_optical_flow_farneback(
        jnp.asarray(f0), jnp.asarray(f1), **kw))
    want12 = np.asarray(fb.calc_optical_flow_farneback(
        jnp.asarray(f1), jnp.asarray(f2), **kw))

    state = fb.farneback_stream_planes(jnp.asarray(f0), share="finest", **kw)
    flow01, state = fb.farneback_stream_step(
        state, jnp.asarray(f1), share="finest", **kw)
    flow12, state = fb.farneback_stream_step(
        state, jnp.asarray(f2), share="finest", **kw)
    # the padded-operator slice is exact placement, but f32 accumulation
    # order differs between the padded and unpadded banded matmuls; isolated
    # pixels at solve near-degeneracies amplify that, so bound mean + max
    for flow, want in ((flow01, want01), (flow12, want12)):
        d = np.linalg.norm(np.asarray(flow) - want, axis=-1)
        assert d.mean() < 1e-3, d.mean()
        assert d.max() < 0.1, d.max()
