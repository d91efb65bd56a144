"""Device tracing / profiling helpers.

The reference's tracing is wall-clock CSVs + pidstat/nvidia-smi sampling
(SURVEY.md §5); the TPU-native additions here wrap ``jax.profiler``:

- :func:`trace` — context manager writing a TensorBoard-loadable device trace.
- :func:`annotate` — named trace span (shows up in the trace timeline).
- :func:`device_memory_stats` — current HBM usage per device.
"""
from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: ``with trace('/tmp/trace'): run_steps()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span for the trace timeline (usable as context manager)."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats() -> list[dict]:
    """Per-device memory stats (bytes in use / limit) where the backend
    exposes them; empty entries otherwise."""
    out = []
    for d in jax.devices():
        try:
            stats = d.memory_stats() or {}
        except Exception:  # pragma: no cover - backend-dependent
            stats = {}
        out.append(
            {
                "device": str(d),
                "bytes_in_use": stats.get("bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
            }
        )
    return out
