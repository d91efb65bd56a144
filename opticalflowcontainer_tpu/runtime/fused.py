"""Fused per-frame streaming step: ingest -> flow -> velocity aggregate as
ONE device program.

The reference's hot loop round-trips the full flow field to the host every
frame (`.cpu().numpy()`, lfn3_node.py:189) and aggregates there; at TPU
streaming rates the field transfer + host math dominate.  Here the whole
per-frame pipeline — uint8 BGR frame -> BT.601 gray -> Farneback flow against
the device-resident previous gray -> mean/median horizontal displacement —
compiles into a single XLA program.  Per frame the host sends one uint8 frame
(~0.9 MB at 640x480) and receives one f32 scalar.

:class:`FusedFarnebackStream` owns the device-resident previous-gray state;
``step()`` returns the aggregated pixel displacement as an unsynced device
scalar so callers can overlap dispatch with the next frame's capture
(``pipeline_depth=1`` in the demo), or sync immediately for per-frame latency
measurement (bench.py's p50/p99 leg).
"""
from __future__ import annotations

import functools
import time
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp

from ..classical import calc_optical_flow_farneback
from ..classical import farneback as _fb
from ..core.color import bgr_to_gray


def _aggregate_u(u, mask, aggregate: str, masked: bool):
    u = u.astype(jnp.float32)
    if masked:
        # all-False mask falls back to the full frame, matching
        # VelocityEstimator.update's `mask.any()` branch (velocity.py) —
        # without it an empty junction mask yields NaN (median) / 0 (mean)
        # and poisons the smoothing deque
        any_m = jnp.any(mask)
        if aggregate == "mean":
            m = mask.astype(jnp.float32)
            masked_val = jnp.sum(u * m) / jnp.maximum(jnp.sum(m), 1.0)
            full_val = jnp.mean(u)
        else:
            masked_val = jnp.nanmedian(jnp.where(mask, u, jnp.nan))
            full_val = jnp.median(u)
        return jnp.nan_to_num(jnp.where(any_m, masked_val, full_val))
    du = jnp.mean(u) if aggregate == "mean" else jnp.median(u)
    return jnp.nan_to_num(du)


@functools.partial(
    jax.jit, static_argnames=("aggregate", "masked", "fb_kwargs")
)
def _fused_step(prev_gray, frame, mask, aggregate: str, masked: bool,
                fb_kwargs: tuple):
    """(prev_gray [H,W] f32, frame [H,W,3]|[H,W] u8, mask [H,W] bool|None)
    -> (gray [H,W] f32, du scalar f32): one compiled program per frame."""
    f = frame.astype(jnp.float32)
    gray = bgr_to_gray(f) if f.ndim == 3 else f
    flow = calc_optical_flow_farneback(prev_gray, gray, **dict(fb_kwargs))
    return gray, _aggregate_u(flow[..., 0], mask, aggregate, masked)


@functools.partial(
    jax.jit, static_argnames=("aggregate", "masked", "fb_kwargs", "share")
)
def _fused_step_planes(prev_planes, frame, mask, aggregate: str, masked: bool,
                       fb_kwargs: tuple, share: str = "all"):
    """Planes-carrying fused step (TPU block-warp path): the device state is
    the previous frame's polynomial-expansion planes — every pyramid level
    below the share gate, ``(gray, finest planes)`` above it — so each
    streamed frame's shared levels are expanded exactly once
    (:func:`classical.farneback.farneback_stream_step`)."""
    f = frame.astype(jnp.float32)
    gray = bgr_to_gray(f) if f.ndim == 3 else f
    flow, planes = _fb.farneback_stream_step(
        prev_planes, gray, share=share, **dict(fb_kwargs))
    return planes, _aggregate_u(flow[..., 0], mask, aggregate, masked)


def _planes_mode() -> bool:
    return _fb._on_tpu() and _fb.BLOCK_WARP


def _share_mode(height: int, width: int) -> str:
    """Share every level below the measured gate; above it the composed
    all-levels program hits the coarse-level R0-slice fusion blowup, so only
    the finest level's expansion is carried (classical/farneback.py owns the
    gate expression)."""
    return _fb.share_mode(height, width)


@functools.partial(jax.jit, static_argnames=("fb_kwargs", "share"))
def _stream_planes(gray, fb_kwargs: tuple, share: str = "all"):
    return _fb.farneback_stream_planes(gray, share=share, **dict(fb_kwargs))


@functools.partial(
    jax.jit, static_argnames=("aggregate", "masked", "fb_kwargs", "share")
)
def _fused_chunk_planes(prev_planes, frames, mask, aggregate: str,
                        masked: bool, fb_kwargs: tuple, share: str = "all"):
    """Chunked fused step: ONE device program processes ``frames`` [K, ...]
    as a ``lax.scan`` carrying the planes state, returning [K] velocity
    scalars.  Through the axon tunnel every separate program EXECUTION costs
    ~80-90 ms regardless of its ~2 ms device time (measured 2026-08-19:
    paced no-sync run held 30 fps but the final drain ran at 10.99 s / 119
    frames; an 8-frame sync took 661 ms; the r3 LFN3 control that once held
    29.8 fps ran at 6.2 fps in the same window) — so at one execution per
    frame, 30 fps cannot hold through a degraded tunnel for ANY kernel.
    Chunking amortizes the per-execution cost K-fold; on a directly-attached
    TPU (sub-ms execution launch) K=1 is the right setting."""
    def body(planes, frame):
        f = frame.astype(jnp.float32)
        gray = bgr_to_gray(f) if f.ndim == 3 else f
        flow, planes2 = _fb.farneback_stream_step(
            planes, gray, share=share, **dict(fb_kwargs))
        return planes2, _aggregate_u(flow[..., 0], mask, aggregate, masked)

    planes, dus = jax.lax.scan(body, prev_planes, frames)
    return planes, dus


class FusedFarnebackStream:
    """Stateful fused streaming step.  ``step(frame)`` dispatches the fused
    program and returns the (unsynced) device scalar du in pixels; call
    ``float(du)`` to sync.  ``flow(frame_a, frame_b)`` is the off-hot-path
    debug field."""

    def __init__(self, aggregate: str = "mean", **fb_kwargs):
        assert aggregate in ("mean", "median")
        self.aggregate = aggregate
        self.fb_kwargs = tuple(sorted(fb_kwargs.items()))
        self._state = None  # prev gray (lax path) or prev planes (block path)
        self._planes_mode = _planes_mode()
        self._planes_active = self._planes_mode
        self._share = "all"

    def reset(self):
        self._state = None

    def warmup(self, frame: np.ndarray, mask: np.ndarray | None = None):
        """Compile both the first-frame and steady-state programs."""
        s0 = self._state
        self.step(frame, mask)
        self.step(frame, mask)
        self._state = s0

    def step(self, frame: np.ndarray, mask: np.ndarray | None = None):
        """Returns du (device f32 scalar, pixels) or None on the first frame."""
        frame = jnp.asarray(frame)
        if self._state is None:
            f = frame.astype(jnp.float32)
            gray = bgr_to_gray(f) if f.ndim == 3 else f
            # decided per stream start (reset() + a new first frame
            # re-evaluates — the gate must not latch across resolution
            # changes): below the measured gate the planes state shares
            # every pyramid level; above it only the finest level is shared
            # (classical/farneback.py share="finest")
            self._planes_active = self._planes_mode
            self._share = _share_mode(gray.shape[-2], gray.shape[-1])
            self._state = (
                _stream_planes(gray, self.fb_kwargs, self._share)
                if self._planes_active else gray)
            return None
        m = jnp.zeros((), bool) if mask is None else jnp.asarray(mask, bool)
        if self._planes_active:
            self._state, du = _fused_step_planes(
                self._state, frame, m, self.aggregate, mask is not None,
                self.fb_kwargs, self._share,
            )
        else:
            self._state, du = _fused_step(
                self._state, frame, m, self.aggregate, mask is not None,
                self.fb_kwargs,
            )
        return du

    def step_many(self, frames: np.ndarray, mask: np.ndarray | None = None):
        """Chunked step: ``frames`` [K, H, W(, 3)] -> [K] velocity scalars as
        ONE device program (lax.scan carrying the planes state) — the
        tunnel-degradation countermeasure (one ~90 ms per-execution cost
        amortized over K frames; see :func:`_fused_chunk_planes`).  Requires
        the planes path; the first call compiles the chunk-size program."""
        assert self._state is not None, (
            "seed the stream with step(first_frame) before step_many")
        if not self._planes_active:
            # lax/CPU path: no chunked device program exists — run the
            # per-frame step (same numbers, no amortization; the chunk
            # countermeasure targets the TPU tunnel's per-execution cost)
            return jnp.stack([self.step(f, mask) for f in frames])
        frames = jnp.asarray(frames)
        m = jnp.zeros((), bool) if mask is None else jnp.asarray(mask, bool)
        self._state, dus = _fused_chunk_planes(
            self._state, frames, m, self.aggregate, mask is not None,
            self.fb_kwargs, self._share)
        return dus


class FusedModelStream:
    """Fused learned-model streaming step: uint8 BGR frame in, aggregated
    pixel-displacement scalar out — model ``estimate`` + velocity aggregation
    as one device program per frame (the reference's lfn3/neuflow node hot
    loop, reference lfn3_node.py:145-210, without its per-frame
    ``.cpu().numpy()`` flow-field round trip).

    ``estimate_fn(model, params, img1, img2) -> flow`` is any of the model
    ``estimate`` contracts (models/*.py); frames are normalized to [0, 1]
    float (BGR kept by default — the sniklaus-checkpoint convention — pass
    ``bgr_to_rgb=True`` for RGB-trained nets).

    ``bf16=True`` serves the model in bfloat16 (params + frames cast; flow
    and the displacement scalar stay fp32) — the node-level analogue of the
    reference NeuFlow node's fp16 tactic (reference neuflow_node.py:50-51).
    Measured round 5: NeuFlow-v2 768x432 8.14 -> 5.37 ms/frame (-34%, its
    attention matmuls are MXU-bound); conv-bound families gain ~3-8%."""

    def __init__(self, model, params, estimate_fn, aggregate: str = "mean",
                 bgr_to_rgb: bool = False, bf16: bool = False):
        assert aggregate in ("mean", "median")
        self._rgb: jax.Array | None = None
        if bf16:
            from ..models.common import cast_params

            params = cast_params(params, jnp.bfloat16)
        comp = jnp.bfloat16 if bf16 else jnp.float32

        @functools.partial(jax.jit, static_argnames=("masked",))
        def _step(params, prev_rgb, frame, mask, masked):
            # params as a jit ARG like _chunk below — closure-captured numpy
            # weights would serialize into the HLO as literals and inflate
            # every axon remote-compile upload (round-2 session-5 lesson)
            f = frame.astype(jnp.float32) * (1.0 / 255.0)
            if bgr_to_rgb:
                f = f[..., ::-1]
            f = f.astype(comp)
            flow = estimate_fn(model, params, prev_rgb, f)
            # shared helper: masked mean/median with all-False fallback +
            # nan_to_num scrub (reference neuflow_node.py:145)
            du = _aggregate_u(flow[..., 0], mask, aggregate, masked)
            return f, du

        self._step_fn = _step

        # chunked program: K frames -> [K] displacement scalars as ONE
        # device program (lax.scan carrying the previous normalized frame)
        # — the same tunnel-degradation countermeasure as
        # FusedFarnebackStream.step_many.  params ride as a jit ARG (not a
        # closure constant) so the serialized HLO stays small for the
        # remote compiler (round-2 session-5 lesson).
        @functools.partial(jax.jit, static_argnames=("masked",))
        def _chunk(params, prev_rgb, frames, mask, masked):
            def body(prev, frame):
                f = frame.astype(jnp.float32) * (1.0 / 255.0)
                if bgr_to_rgb:
                    f = f[..., ::-1]
                f = f.astype(comp)
                flow = estimate_fn(model, params, prev, f)
                return f, _aggregate_u(flow[..., 0], mask, aggregate, masked)

            return jax.lax.scan(body, prev_rgb, frames)

        self._params = params
        self._chunk_fn = _chunk
        self._prep = jax.jit(
            lambda frame: ((frame.astype(jnp.float32) * (1.0 / 255.0))[..., ::-1]
                           if bgr_to_rgb
                           else frame.astype(jnp.float32) * (1.0 / 255.0)
                           ).astype(comp)
        )

    def reset(self):
        self._rgb = None

    def warmup(self, frame: np.ndarray, mask: np.ndarray | None = None):
        r = self._rgb
        self.step(frame, mask)
        self.step(frame, mask)
        self._rgb = r

    def step(self, frame: np.ndarray, mask: np.ndarray | None = None):
        frame = jnp.asarray(frame)
        if self._rgb is None:
            self._rgb = self._prep(frame)
            return None
        m = jnp.zeros((), bool) if mask is None else jnp.asarray(mask, bool)
        self._rgb, du = self._step_fn(
            self._params, self._rgb, frame, m, mask is not None)
        return du

    def step_many(self, frames: np.ndarray, mask: np.ndarray | None = None):
        """Chunked step: ``frames`` [K, H, W, 3] -> [K] displacement scalars
        as ONE device program (see :meth:`FusedFarnebackStream.step_many`)."""
        assert self._rgb is not None, (
            "seed the stream with step(first_frame) before step_many")
        frames = jnp.asarray(frames)
        m = jnp.zeros((), bool) if mask is None else jnp.asarray(mask, bool)
        self._rgb, dus = self._chunk_fn(
            self._params, self._rgb, frames, m, mask is not None)
        return dus


def make_fused_model_backend(model, params, estimate_fn,
                             aggregate: str = "mean",
                             bgr_to_rgb: bool = False,
                             bf16: bool = False) -> Callable:
    """FlowNode backend wrapping :class:`FusedModelStream` (stateful: the
    previous normalized frame lives on device; ``returns_displacement``).
    ``bf16=True`` serves in bfloat16 (see :class:`FusedModelStream`)."""
    stream = FusedModelStream(model, params, estimate_fn, aggregate,
                              bgr_to_rgb, bf16=bf16)

    def backend(prev, cur, dt, mask=None):
        if stream._rgb is None:
            stream.step(prev, mask)
        return float(stream.step(cur, mask))

    backend.wants_color = True
    backend.returns_displacement = True
    backend.stream = stream
    return backend


def make_fused_farneback_backend(aggregate: str = "mean", **fb_kwargs) -> Callable:
    """FlowNode backend wrapping :class:`FusedFarnebackStream`.

    Stateful: the previous gray frame lives on device, so the ``prev``
    argument FlowNode passes is ignored after the first frame.  The backend
    returns the aggregated pixel displacement (``returns_displacement``
    marker), which FlowNode feeds to
    ``VelocityEstimator.update_from_displacement``.
    """
    stream = FusedFarnebackStream(aggregate=aggregate, **fb_kwargs)

    def backend(prev, cur, dt, mask=None):
        if stream._state is None:
            stream.step(prev, mask)
        du = stream.step(cur, mask)
        return float(du)

    backend.wants_color = True
    backend.returns_displacement = True
    backend.stream = stream
    return backend


def measure_stream_latency(
    height: int = 480,
    width: int = 640,
    fps: float = 15.0,
    n_frames: int = 40,
    aggregate: str = "mean",
    paced: bool = True,
    sync_every: int = 1,
    drain_async: bool = False,
    stream=None,
    chunk: int = 1,
    **fb_kwargs,
) -> dict:
    """Drive the fused step at camera pace and measure per-frame latency
    (frame available -> velocity scalar synced on host).  Returns p50/p99
    latency (ms) and the sustained rate — the BASELINE "p50 frame latency"
    metric (BASELINE.md targets table).

    ``sync_every=K>1`` micro-batches the host syncs: pending velocity scalars
    are stacked ON DEVICE and fetched in one transfer every K frames.  On the
    axon dev slice a host sync costs ~90 ms RTT regardless of payload (the
    fused program itself is ~4 ms at 640x480), so K=2-3 is what holds camera
    rate through the tunnel; on a directly-attached TPU a ready-scalar fetch
    is ~0.1 ms and K=1 is right.

    ``stream`` overrides the default :class:`FusedFarnebackStream` with any
    object exposing ``step(frame) -> du | None`` / ``warmup`` / ``reset``
    (e.g. a :class:`FusedModelStream` over LFN3 — the reference's learned
    streaming node, lfn3_node.py:29-31 640x480@30).

    ``drain_async=True`` moves the host syncs to a drainer thread (the
    reference's own shape: capture thread + inference thread,
    lfn3_node.py:84-89) so a tunnel RTT longer than the camera period
    cannot stall the dispatch loop; dispatches stay in order, latency is
    still measured frame-arrival -> velocity-on-host.

    ``chunk=K>1`` buffers K frames and runs them as ONE device program
    (:meth:`FusedFarnebackStream.step_many`).  Through the axon tunnel every
    separate program EXECUTION costs ~80-90 ms regardless of its ~2 ms
    device time (measured 2026-08-19 — at one execution per frame NO kernel
    can hold 30 fps through a degraded tunnel), so chunking amortizes the
    per-execution cost K-fold at the price of up to K camera periods of
    buffering latency.  On a directly-attached TPU keep chunk=1.  Chunk mode
    forces synchronous drains: fetching the [K] device vector from a drainer
    THREAD aborts the axon client in C++ (``terminate called`` /
    ``FATAL: exception not rethrown``, measured 2026-08-19 — the plugin's
    transfer path is not thread-safe for array fetches, only for the scalar
    ``float()`` path).  A synchronous chunk drain (~110 ms) fits inside the
    K-frame camera budget (chunk=4 @ 30 fps = 133 ms), so nothing is lost."""
    import jax.numpy as jnp

    if chunk > 1:
        drain_async = False

    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, (height, width + 4 + n_frames, 3)).astype(np.uint8)
    frames = [np.ascontiguousarray(base[:, i : i + width]) for i in range(n_frames)]

    if stream is None:
        stream = FusedFarnebackStream(aggregate=aggregate, **fb_kwargs)
    stream.warmup(frames[0])
    stream.reset()
    stream.step(frames[0])
    if chunk > 1:
        # compile the chunk-size program outside the measurement window
        stream.step_many(np.stack(frames[1 : 1 + chunk]))
        stream.reset()
        stream.step(frames[0])

    period = 1.0 / fps
    lat = []
    pending: list[tuple] = []

    def drain(batch):
        if not batch:
            return
        if chunk > 1:
            # entries are (arrival-times list, [K] device vector): one fetch
            # per chunk entry
            for t_list, dus in batch:
                vals = np.asarray(dus)
                t_done = time.perf_counter()
                lat.extend(t_done - ta for ta in t_list)
            return
        if len(batch) == 1:
            vals = [float(batch[0][1])]
        else:
            vals = np.asarray(jnp.stack([du for _, du in batch]))
        t_done = time.perf_counter()
        for (t_arrive, _), _v in zip(batch, vals):
            lat.append(t_done - t_arrive)

    worker = None
    drain_err: list = []
    if drain_async:
        import queue as _queue
        import threading

        q: _queue.Queue = _queue.Queue()

        def _drainer():
            # a sync error (transient FAILED_PRECONDITION, tunnel
            # XlaRuntimeError) must not kill the thread SILENTLY: record it
            # so held_rate fails instead of being computed from the few
            # frames drained before the death
            batch = []
            try:
                while True:
                    item = q.get()
                    if item is None:
                        drain(batch)
                        return
                    batch.append(item)
                    if len(batch) >= sync_every:
                        drain(batch)
                        batch = []
            except Exception as e:
                drain_err.append(repr(e))

        worker = threading.Thread(target=_drainer, daemon=True)
        worker.start()

    t_start = time.perf_counter()
    t_next = t_start
    buf: list = []
    buf_t: list = []
    for i, frame in enumerate(frames[1:]):
        if paced:
            delay = t_next - time.perf_counter()
            if delay > 0:
                time.sleep(delay)
            t_arrive = max(t_next, time.perf_counter())
            t_next += period
        else:
            t_arrive = time.perf_counter()
        if chunk > 1:
            buf.append(frame)
            buf_t.append(t_arrive)
            if len(buf) < chunk:
                continue
            entry = (list(buf_t), stream.step_many(np.stack(buf)))
            buf, buf_t = [], []
        else:
            entry = (t_arrive, stream.step(frame))
        if drain_async:
            q.put(entry)
        else:
            pending.append(entry)
            if len(pending) >= sync_every:
                drain(pending)
                pending = []
    drainer_hung = False
    if drain_async:
        q.put(None)
        worker.join(timeout=30.0)
        drainer_hung = worker.is_alive()  # a host sync is stuck (tunnel)
    else:
        drain(pending)
    elapsed = time.perf_counter() - t_start
    # snapshot: a hung drainer may still append to lat concurrently
    raw = np.array(list(lat)) * 1000.0
    lat_ms = np.sort(raw)
    sustained = (len(frames) - 1) / elapsed
    n_expected = (((len(frames) - 1) // chunk) * chunk if chunk > 1
                  else len(frames) - 1)
    if raw.size == 0:
        # nothing drained (e.g. the first sync hung for the whole run):
        # report the failure instead of crashing on empty percentiles
        return {
            "p50_ms": float("nan"), "p99_ms": float("nan"),
            "mean_ms": float("nan"), "sustained_fps": sustained,
            "target_fps": fps, "held_rate": False, "sync_every": sync_every,
            "chunk": chunk,
            "drain_async": drain_async, "drainer_hung": drainer_hung,
            "drainer_error": drain_err[0] if drain_err else None,
            "n_frames": len(frames) - 1, "n_measured": 0,
        }
    if drain_async:
        # held: throughput kept camera pace (elapsed includes every sync)
        # AND latency did not diverge across the run (a device or sync
        # throughput below fps shows up as linearly growing latency)
        q4 = max(len(raw) // 4, 1)
        diverged = (raw[-q4:].mean()
                    > raw[:q4].mean() + 2.0 * 1000.0 / fps)
        # every frame must actually have been measured: a drainer that died
        # mid-run leaves lat short, and the producer self-paces so
        # `sustained` alone would still look healthy (chunk mode: the tail
        # remainder short of a full chunk is never dispatched)
        complete = raw.size == n_expected and not drain_err
        held = bool(sustained >= 0.97 * fps and not diverged and complete)
    else:
        # synchronous drains: the typical frame's velocity must land within
        # its sync_every camera periods; occasional p99 spikes are
        # tunnel-RTT jitter, not a falling-behind pipeline.  Chunk mode adds
        # up to `chunk` periods of deliberate buffering latency (a frame
        # waits for its chunk to fill before dispatch), so the budget is
        # (chunk + sync_every) periods there.
        budget_ms = 1000.0 / fps * (max(sync_every, 1)
                                    + (chunk if chunk > 1 else 0))
        held = bool(sustained >= 0.98 * fps
                    and float(np.percentile(lat_ms, 50)) < budget_ms)
    return {
        "p50_ms": float(np.percentile(lat_ms, 50)),
        "p99_ms": float(np.percentile(lat_ms, 99)),
        "mean_ms": float(lat_ms.mean()),
        "sustained_fps": sustained,
        "target_fps": fps,
        "held_rate": held and not drainer_hung,
        "sync_every": sync_every,
        "chunk": chunk,
        "drain_async": drain_async,
        "drainer_hung": drainer_hung,
        "drainer_error": drain_err[0] if drain_err else None,
        "n_frames": len(frames) - 1,
        "n_measured": int(raw.size),
    }


def measure_device_stream_ms(
    height: int = 480,
    width: int = 640,
    n_steps: int = 30,
    aggregate: str = "mean",
    **fb_kwargs,
) -> float:
    """Pure device time of the fused per-frame program (ms/frame): the steps
    run as one in-jit ``lax.scan`` chain (each step consumes the previous
    gray), one sync at the end — the honest-timing recipe for the axon slice
    where per-dispatch/per-sync tunnel RTT would otherwise dominate."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    base = rng.uniform(
        0, 255, (height, width + n_steps + 4, 3)
    ).astype(np.uint8)
    frames = np.stack(
        [base[:, i : i + width] for i in range(n_steps)]
    )
    kw = tuple(sorted(fb_kwargs.items()))
    planes = _planes_mode()
    share = _share_mode(height, width)

    def chained(stack, s0):
        def body(s, fr):
            if planes:
                s2, du = _fused_step_planes(
                    s, fr, jnp.zeros((), bool), aggregate, False, kw, share)
            else:
                s2, du = _fused_step(
                    s, fr, jnp.zeros((), bool), aggregate, False, kw)
            return s2, du
        s_end, dus = jax.lax.scan(body, s0, stack)
        return dus.sum() + jax.tree_util.tree_reduce(
            lambda a, leaf: a + leaf.astype(jnp.float32).sum(),
            s_end, jnp.float32(0))

    fn = jax.jit(chained)
    stack = jnp.asarray(frames)
    g0 = bgr_to_gray(jnp.asarray(frames[0], jnp.float32))
    s0 = _stream_planes(g0, kw, share) if planes else g0
    float(fn(stack, s0))  # compile
    t0 = time.perf_counter()
    float(fn(stack, s0))
    return (time.perf_counter() - t0) / n_steps * 1000.0
