"""Multi-stream batched inference: N camera streams saturating one chip
(BASELINE config 5: 2x1080p@60fps decode->pyramid->flow->velocity).

Architecture (TPU-first redesign of the reference's one-process-per-model
concurrency): each stream keeps a latest-frame-pair slot; a single batcher
thread snapshots all ready pairs, stacks them into one [N, H, W] batch and
runs ONE vmapped jitted flow call — the device sees a single large program
instead of N small ones, and per-stream velocities are published from the
batched result.  Streams must share a resolution (static shapes; one compile).
"""
from __future__ import annotations

import functools
import threading
import time
from typing import Callable, Sequence

import numpy as np

from .bus import Bus
from .messages import Header, Vector3StampedMsg
from .velocity import VelocityEstimator


class _StreamSlot:
    """Latest-pair slot.  Under load the batcher may not take a pair before
    the next push overwrites it; ``take`` therefore also reports whether any
    pair was dropped since the last take, so stateful backends (whose device
    state holds the planes of the last *processed* frame) can reseed from the
    pair's actual prev frame instead of silently warping across the dropped
    interval (flow over a multi-frame gap divided by a single-pair dt)."""

    def __init__(self):
        self.lock = threading.Lock()
        self.prev: tuple[np.ndarray, float] | None = None
        self.pair: tuple[np.ndarray, np.ndarray, float, float] | None = None
        self._dropped = False

    def push(self, gray: np.ndarray, stamp: float):
        with self.lock:
            if self.prev is not None:
                if self.pair is not None:
                    self._dropped = True  # untaken pair overwritten
                self.pair = (self.prev[0], gray, self.prev[1], stamp)
            self.prev = (gray, stamp)

    def take(self):
        """Returns (pair, dropped_since_last_take) or None."""
        with self.lock:
            pair, self.pair = self.pair, None
            dropped, self._dropped = self._dropped, False
            return None if pair is None else (pair, dropped)


class MultiStreamFlow:
    """``batched_backend``: (prev [N,H,W], cur [N,H,W]) -> flow [N,H,W,2]
    (e.g. a jitted ``classical.farneback_batched``).  Each stream i publishes
    /optical_flow/<name><i>_velocity on the shared bus."""

    def __init__(
        self,
        bus: Bus,
        batched_backend: Callable,
        n_streams: int,
        pixel_to_meter: float = 0.000566,
        name: str = "STREAM",
        aggregate: str = "mean",
        pipeline_depth: int = 1,
    ):
        self.bus = bus
        self.backend = batched_backend
        self.slots = [_StreamSlot() for _ in range(n_streams)]
        self.vels = [
            VelocityEstimator(pixel_to_meter, aggregate) for _ in range(n_streams)
        ]
        self.name = name
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.batches = 0
        self.fields = 0
        # pipeline_depth=1 (fused backends only): dispatch batch n+1 before
        # syncing batch n's scalars, so the host-sync RTT (~50-90 ms through
        # the axon tunnel — longer than a 60 fps batch period) overlaps the
        # next batch's device work instead of serializing with it.  JAX
        # dispatch is async; the publish of batch n is delayed by one batch
        # but throughput stops being 1/(RTT + device).  Depth > 1 buys
        # nothing (the sync is the bottleneck, not dispatch).
        self.pipeline_depth = int(pipeline_depth)

    def push_frame(self, stream: int, frame: np.ndarray, stamp: float):
        from .nodes import _bgr_to_gray_np

        gray = (
            _bgr_to_gray_np(frame)
            if frame.ndim == 3
            else frame.astype(np.float32)
        )
        self.slots[stream].push(gray, stamp)

    def start(self):
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5.0)

    def _publish(self, ready, out):
        out = np.asarray(out)  # the host sync (device scalars/fields -> np)
        fused = getattr(self.backend, "returns_displacement", False)
        self.batches += 1
        self.fields += len(ready)
        for k, (i, (_, _, t0, t1), _) in enumerate(ready):
            dt = t1 - t0
            if fused:
                # device-aggregated [N] pixel displacements — only N
                # scalars crossed the host boundary for this batch
                vx, vx_s = self.vels[i].update_from_displacement(
                    float(out[k]), dt
                )
            else:
                vx, vx_s, _ = self.vels[i].update(out[k], dt)
            self.bus.publish(
                f"/optical_flow/{self.name}{i}_velocity",
                Vector3StampedMsg(Header(t1), vx),
            )
            self.bus.publish(
                f"/optical_flow/{self.name}{i}_smooth_velocity",
                Vector3StampedMsg(Header(t1), vx_s),
            )

    def _run(self):
        pending = None  # (ready, device_out): dispatched, not yet synced
        while not self._stop.is_set():
            ready = [(i, p, d) for i, (p, d) in
                     ((i, t) for i, t in
                      ((i, s.take()) for i, s in enumerate(self.slots))
                      if t is not None)]
            if not ready:
                if pending is not None:
                    self._publish(*pending)
                    pending = None
                time.sleep(0.001)
                continue
            idxs = [i for i, _, _ in ready]
            prev = np.stack([p[0] for _, p, _ in ready])
            cur = np.stack([p[1] for _, p, _ in ready])
            dropped = [d for _, _, d in ready]
            fused = getattr(self.backend, "returns_displacement", False)
            if getattr(self.backend, "stateful", False):
                out = self.backend(prev, cur, idxs, dropped)
            else:
                out = self.backend(prev, cur)
            if fused and self.pipeline_depth > 0:
                # sync the PREVIOUS batch only after this one is dispatched:
                # the ~50-90 ms tunnel sync overlaps this batch's device work
                # (JAX dispatch is async), so steady-state throughput is
                # 1/max(RTT, device) instead of 1/(RTT + device)
                prev_pending, pending = pending, (ready, out)
                if prev_pending is not None:
                    self._publish(*prev_pending)
            else:
                self._publish(ready, out)
        if pending is not None:
            self._publish(*pending)


def make_batched_farneback(n_streams: int, **kwargs):
    """Jitted batched Farneback backend for MultiStreamFlow.  Pads the batch
    to ``n_streams`` so one compile covers any ready-subset size."""
    import functools

    import jax

    from ..classical import farneback_batched

    fn = jax.jit(functools.partial(farneback_batched, **kwargs))

    def backend(prev, cur):
        n = prev.shape[0]
        if n < n_streams:
            pad = np.repeat(prev[-1:], n_streams - n, axis=0)
            prev = np.concatenate([prev, pad])
            cur = np.concatenate([cur, np.repeat(cur[-1:], n_streams - n, axis=0)])
        return np.asarray(fn(prev, cur))[:n]

    return backend


def make_batched_fused_farneback(n_streams: int, aggregate: str = "mean",
                                 **kwargs):
    """Fused batched backend: flow AND per-stream horizontal-displacement
    aggregation in one device program — [N, H, W] pairs in, [N] pixel
    displacements out (the multi-stream analogue of runtime.fused; only N
    scalars return to the host per batch)."""
    import functools

    import jax
    import jax.numpy as jnp

    from ..classical import farneback_batched

    assert aggregate in ("mean", "median")

    @jax.jit
    def fn(prev, cur):
        u = farneback_batched(prev, cur, **kwargs)[..., 0]
        return (jnp.mean(u, axis=(1, 2)) if aggregate == "mean"
                else jnp.median(u.reshape(u.shape[0], -1), axis=1))

    def backend(prev, cur):
        n = prev.shape[0]
        if n < n_streams:
            pad = np.repeat(prev[-1:], n_streams - n, axis=0)
            prev = np.concatenate([prev, pad])
            cur = np.concatenate([cur, np.repeat(cur[-1:], n_streams - n, axis=0)])
        # device array out (unsynced): MultiStreamFlow pipelines the sync
        return fn(prev, cur)[:n]

    backend.returns_displacement = True

    return backend


def make_stateful_batched_fused_farneback(n_streams: int,
                                          aggregate: str = "mean",
                                          **kwargs):
    """Planes-carrying batched fused backend (TPU block-warp path): the
    device state holds every stream's previous-frame polynomial expansion,
    so each streamed frame is expanded exactly once even across N streams
    (``make_batched_fused_farneback`` re-expands each stream's previous
    frame every batch).  Contract: ``backend(prev, cur, idxs)`` where
    ``idxs`` are the stream indices of the batch rows; the batch is padded
    to a fixed ``n_streams + 1`` rows with pad rows targeting a scratch
    state slot (one compile, no state pollution).  Streams are lazily
    seeded from ``prev`` on their first batch.  The optional ``dropped``
    flags mark rows whose slot overwrote an untaken pair since the last
    take — those rows' stored planes belong to an older frame than the
    pair's prev, so they are reseeded from the given ``prev`` (otherwise
    flow spans a multi-frame gap while dt is single-pair).  Returns [n]
    pixel displacements.  Off the TPU block-warp path, fall back to
    :func:`make_batched_fused_farneback`."""
    import jax
    import jax.numpy as jnp

    from ..classical import farneback as fb

    assert aggregate in ("mean", "median")
    R = n_streams + 1  # fixed batch rows; row with idx == n_streams = scratch

    def _du(u):
        return (jnp.mean(u, axis=(1, 2)) if aggregate == "mean"
                else jnp.median(u.reshape(u.shape[0], -1), axis=1))

    # donate the planes state: without donation XLA copies the whole
    # [n_streams+1, 5, rows, cols] state per level every batch just to
    # update the few ready rows (the caller strictly threads state ->
    # state2, never reusing the old buffers)
    @functools.partial(jax.jit, donate_argnums=(0,),
                       static_argnames=("share",))
    def steady(state, cur, idx, share):
        R0 = tuple(L[idx] for L in state)
        flow, newp = fb.farneback_stream_step(R0, cur, share=share, **kwargs)
        state2 = tuple(L.at[idx].set(P) for L, P in zip(state, newp))
        return state2, _du(flow[..., 0])

    @functools.partial(jax.jit, donate_argnums=(0,),
                       static_argnames=("share",))
    def seed_step(state, prev, cur, idx, fresh, share):
        seeded = fb.farneback_stream_planes(prev, share=share, **kwargs)
        R0 = tuple(
            # per-leaf broadcast: plane leaves are [N, 5, rows, cols], the
            # finest-mode gray leaf is [N, H, W]
            jnp.where(fresh.reshape((-1,) + (1,) * (L.ndim - 1)), S, L[idx])
            for L, S in zip(state, seeded)
        )
        flow, newp = fb.farneback_stream_step(R0, cur, share=share, **kwargs)
        state2 = tuple(L.at[idx].set(P) for L, P in zip(state, newp))
        return state2, _du(flow[..., 0])

    state = None
    stream_seeded = np.zeros(n_streams + 1, bool)
    stream_seeded[n_streams] = True  # scratch slot: never re-seed

    share = None
    res = None

    def backend(prev, cur, idxs, dropped=None):
        nonlocal state, share, res
        if state is None:
            # the share gate is (re)evaluated whenever the state is (re)built
            # — a resolution change mid-lifetime must re-gate, not reuse a
            # stale mode against mismatched state shapes (ADVICE r3)
            share = fb.share_mode(cur.shape[-2], cur.shape[-1])
            res = cur.shape[-2:]
        elif cur.shape[-2:] != res:
            raise ValueError(
                f"stateful backend was built for {res[0]}x{res[1]} frames, "
                f"got {cur.shape[-2]}x{cur.shape[-1]}; streams sharing a "
                f"backend must share a resolution (one compile, one state)")
        n = cur.shape[0]
        idx = np.full(R, n_streams, np.int32)
        idx[:n] = np.asarray(idxs, np.int32)
        pad = R - n
        prev_p = np.concatenate([prev, np.repeat(prev[-1:], pad, 0)])
        cur_p = np.concatenate([cur, np.repeat(cur[-1:], pad, 0)])
        if state is None:
            # allocate the state pytree once from the seeding expansion
            state = tuple(
                jnp.zeros((n_streams + 1,) + tuple(L.shape[1:]), L.dtype)
                for L in fb.farneback_stream_planes(
                    jnp.asarray(prev_p[:1]), share=share, **kwargs)
            )
        fresh = ~stream_seeded[idx]
        if dropped is not None:
            # non-contiguous rows: stored planes predate this pair's prev —
            # recompute the prev expansion (seed path) for those rows
            fresh[:n] |= np.asarray(dropped, bool)
        if fresh[:n].any():
            state, du = seed_step(state, jnp.asarray(prev_p),
                                  jnp.asarray(cur_p), idx,
                                  jnp.asarray(fresh), share)
            stream_seeded[idx[:n]] = True
        else:
            state, du = steady(state, jnp.asarray(cur_p), idx, share)
        # device array out (unsynced): MultiStreamFlow pipelines the sync
        return du[:n]

    backend.returns_displacement = True
    backend.stateful = True

    return backend
