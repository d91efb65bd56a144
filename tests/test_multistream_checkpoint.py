"""Multi-stream batched inference + checkpoint/resume tests."""
import time

import numpy as np
import pytest


def test_multistream_batched_velocities():
    from opticalflowcontainer_tpu.runtime import Bus
    from opticalflowcontainer_tpu.runtime.multistream import (
        MultiStreamFlow,
        make_batched_farneback,
    )

    bus = Bus()
    n = 3
    ms = MultiStreamFlow(
        bus,
        make_batched_farneback(n, levels=1, winsize=11, iterations=1),
        n_streams=n,
        pixel_to_meter=1.0,
    )
    got = {i: [] for i in range(n)}
    for i in range(n):
        bus.subscribe(
            f"/optical_flow/STREAM{i}_velocity",
            lambda m, _i=i: got[_i].append(m.x),
        )

    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, (80, 120)).astype(np.float32)
    import cv2

    base = cv2.GaussianBlur(base, (0, 0), 2)
    shifts = [1.0, 2.0, -1.0]  # px/frame per stream

    # warm the jit (full batch and a partial batch) before streaming
    ms.backend(np.stack([base] * n), np.stack([base] * n))
    ms.backend(base[None], base[None])

    ms.start()
    try:
        for f in range(5):
            for i in range(n):
                frame = np.roll(base, int(round(f * shifts[i])), axis=1)
                ms.push_frame(i, frame, stamp=float(f))  # dt = 1s
            time.sleep(0.5)
    finally:
        ms.stop()

    for i in range(n):
        assert len(got[i]) >= 2, f"stream {i} published too few velocities"
        # dt=1, p2m=1 => velocity == px/frame shift
        assert abs(np.mean(got[i][1:]) - shifts[i]) < 0.3, (i, got[i])
    assert ms.fields >= 6


def test_multistream_fused_matches_unfused():
    """Device-aggregated multistream backend (one [N]-scalar transfer per
    batch) publishes the same velocities as the flow-returning one."""
    from opticalflowcontainer_tpu.runtime import Bus
    from opticalflowcontainer_tpu.runtime.multistream import (
        MultiStreamFlow,
        make_batched_farneback,
        make_batched_fused_farneback,
    )

    rng = np.random.default_rng(1)
    base = rng.uniform(0, 255, (64, 96)).astype(np.float32)
    prev = np.stack([base, np.roll(base, 1, axis=1)])
    cur = np.stack([np.roll(base, 2, axis=1), base])

    kw = dict(levels=1, winsize=11, iterations=1)
    plain = make_batched_farneback(2, **kw)
    fused = make_batched_fused_farneback(2, **kw)
    assert fused.returns_displacement
    flows = plain(prev, cur)
    dus = fused(prev, cur)
    np.testing.assert_allclose(dus, flows[..., 0].mean(axis=(1, 2)), atol=1e-4)
    # partial batch (padded) path
    np.testing.assert_allclose(
        fused(prev[:1], cur[:1]),
        flows[:1, ..., 0].mean(axis=(1, 2)), atol=1e-4,
    )

    # end-to-end through MultiStreamFlow: fused backend drives
    # update_from_displacement and publishes identical velocities
    bus = Bus(namespace="")
    ms = MultiStreamFlow(bus, fused, n_streams=2, pixel_to_meter=1.0)
    got = []
    bus.subscribe("/optical_flow/STREAM0_velocity", lambda m: got.append(m.x))
    ms.slots[0].push(prev[0], 0.0)
    ms.slots[0].push(cur[0], 1.0)
    ms.start()
    time.sleep(0.8)
    ms.stop()
    assert got and abs(got[0] - float(flows[0, ..., 0].mean())) < 1e-3


def test_checkpoint_roundtrip(tmp_path):
    import jax

    from opticalflowcontainer_tpu.models import RAFTSmall
    from opticalflowcontainer_tpu.parallel import make_train_state
    from opticalflowcontainer_tpu.parallel.checkpoint import (
        latest_checkpoint,
        restore_checkpoint,
        save_checkpoint,
    )

    model = RAFTSmall()
    state, _ = make_train_state(model, jax.random.PRNGKey(0), img_shape=(32, 32))
    d = str(tmp_path / "ckpts")
    assert latest_checkpoint(d) is None
    save_checkpoint(d, state, step=3)
    save_checkpoint(d, state._replace(step=state.step + 7), step=7)
    assert latest_checkpoint(d).endswith("step_00000007")
    # an interrupted orbax save leaves an uncommitted tmp dir that sorts
    # after the committed one — it must never be selected for restore
    (tmp_path / "ckpts" / "step_00000007.orbax-checkpoint-tmp-1234").mkdir()
    (tmp_path / "ckpts" / "step_00000009.orbax-checkpoint-tmp-9").mkdir()
    assert latest_checkpoint(d).endswith("step_00000007")
    restored = restore_checkpoint(d, state)
    leaves0 = jax.tree_util.tree_leaves(state.params)
    leaves1 = jax.tree_util.tree_leaves(restored.params)
    assert len(leaves0) == len(leaves1)
    np.testing.assert_allclose(np.asarray(leaves0[0]), np.asarray(leaves1[0]))


def test_multistream_stateful_matches_stateless(monkeypatch):
    """The planes-carrying stateful batched backend (each stream's previous
    expansion held as device state, scratch-slot padding, lazy seeding) must
    reproduce the stateless fused backend's displacements across consecutive
    batches, late-joining streams, and padded partial batches."""
    import opticalflowcontainer_tpu.classical.farneback as fb
    from opticalflowcontainer_tpu.runtime.multistream import (
        make_batched_fused_farneback,
        make_stateful_batched_fused_farneback,
    )

    monkeypatch.setattr(fb, "BLOCK_WARP_INTERPRET", True)
    monkeypatch.setattr(fb, "_on_tpu", lambda: True)

    rng = np.random.default_rng(2)
    kw = dict(levels=1, winsize=11, iterations=1)
    n = 3
    frames = rng.uniform(0, 255, (4, n, 96, 128)).astype(np.float32)

    ref = make_batched_fused_farneback(n, **kw)
    st = make_stateful_batched_fused_farneback(n, **kw)
    assert st.stateful and st.returns_displacement

    # batch 1: streams 0 and 1 only (stream 2 joins late); padded row
    idxs = [0, 1]
    want = ref(frames[0][idxs], frames[1][idxs])
    got = st(frames[0][idxs], frames[1][idxs], idxs)
    np.testing.assert_allclose(got, want, atol=5e-3)

    # batch 2: all three streams; 0/1 hit the steady path (state reuse),
    # 2 is freshly seeded from its prev row
    idxs = [0, 1, 2]
    want = ref(frames[1][idxs], frames[2][idxs])
    got = st(frames[1][idxs], frames[2][idxs], idxs)
    np.testing.assert_allclose(got, want, atol=5e-3)

    # batch 3: steady state for everyone
    want = ref(frames[2][idxs], frames[3][idxs])
    got = st(frames[2][idxs], frames[3][idxs], idxs)
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_multistream_stateful_reseeds_after_drop(monkeypatch):
    """Under load _StreamSlot overwrites untaken pairs; the stateful backend's
    stored planes then belong to an older frame than the delivered pair's
    prev.  Dropped rows must be reseeded from the pair's actual prev frame so
    the flow matches the stateless backend on that exact pair (not flow over
    the multi-frame gap)."""
    import opticalflowcontainer_tpu.classical.farneback as fb
    from opticalflowcontainer_tpu.runtime.multistream import (
        _StreamSlot,
        make_batched_fused_farneback,
        make_stateful_batched_fused_farneback,
    )

    monkeypatch.setattr(fb, "BLOCK_WARP_INTERPRET", True)
    monkeypatch.setattr(fb, "_on_tpu", lambda: True)

    rng = np.random.default_rng(5)
    kw = dict(levels=1, winsize=11, iterations=1)
    # frames drift so that flow(f0->f3) differs measurably from flow(f2->f3)
    base = rng.uniform(0, 255, (96, 128 + 12)).astype(np.float32)
    frames = [np.ascontiguousarray(base[:, 3 * t : 3 * t + 128])
              for t in range(4)]

    # slot semantics: pushes 0..3 with takes only after 1 and 3
    slot = _StreamSlot()
    slot.push(frames[0], 0.0)
    slot.push(frames[1], 1.0)
    (pair, dropped) = slot.take()
    assert not dropped and pair[1] is frames[1]
    slot.push(frames[2], 2.0)  # pair (1,2) lands
    slot.push(frames[3], 3.0)  # overwrites untaken (1,2) -> dropped
    (pair, dropped) = slot.take()
    assert dropped and pair[0] is frames[2] and pair[1] is frames[3]
    # after a take the flag clears
    slot.push(frames[0], 4.0)
    (pair, dropped) = slot.take()
    assert not dropped and pair[0] is frames[3] and pair[1] is frames[0]

    # backend semantics: process (f0,f1), then deliver (f2,f3) flagged
    # dropped — result must equal the stateless backend on (f2,f3)
    ref = make_batched_fused_farneback(1, **kw)
    st = make_stateful_batched_fused_farneback(1, **kw)
    st(frames[0][None], frames[1][None], [0])
    want = ref(frames[2][None], frames[3][None])
    got = st(frames[2][None], frames[3][None], [0], dropped=[True])
    np.testing.assert_allclose(got, want, atol=5e-3)
    # sanity: WITHOUT the flag the stale-planes path gives a different
    # answer (the bug this guards against)
    st2 = make_stateful_batched_fused_farneback(1, **kw)
    st2(frames[0][None], frames[1][None], [0])
    stale = st2(frames[2][None], frames[3][None], [0], dropped=[False])
    assert abs(float(stale[0]) - float(want[0])) > 1e-3


def test_multistream_stateful_finest_share_large_frames(monkeypatch):
    """Above the share gate the stateful backend carries (gray, finest
    planes) instead of falling back to the stateless pair program: seeding,
    steady reuse, late joins, and dropped-pair reseeds must all match the
    stateless backend's displacements."""
    import opticalflowcontainer_tpu.classical.farneback as fb
    from opticalflowcontainer_tpu.runtime.multistream import (
        make_batched_fused_farneback,
        make_stateful_batched_fused_farneback,
    )

    monkeypatch.setattr(fb, "BLOCK_WARP_INTERPRET", True)
    monkeypatch.setattr(fb, "_on_tpu", lambda: True)
    monkeypatch.setattr(fb, "CLIP_SHARE_ALL_MAX_PIXELS", 1000)

    rng = np.random.default_rng(11)
    kw = dict(levels=1, winsize=11, iterations=1)
    n = 2
    frames = rng.uniform(0, 255, (4, n, 96, 128)).astype(np.float32)

    ref = make_batched_fused_farneback(n, **kw)
    st = make_stateful_batched_fused_farneback(n, **kw)

    idxs = [0]
    want = ref(frames[0][idxs], frames[1][idxs])
    got = st(frames[0][idxs], frames[1][idxs], idxs)
    np.testing.assert_allclose(got, want, atol=5e-3)

    idxs = [0, 1]  # stream 1 joins late (seed) while 0 runs steady
    want = ref(frames[1][idxs], frames[2][idxs])
    got = st(frames[1][idxs], frames[2][idxs], idxs)
    np.testing.assert_allclose(got, want, atol=5e-3)

    # dropped pair: stored state predates the prev frame -> reseed row 0
    want = ref(frames[2][idxs], frames[3][idxs])
    got = st(frames[2][idxs], frames[3][idxs], idxs, dropped=[True, False])
    np.testing.assert_allclose(got, want, atol=5e-3)
