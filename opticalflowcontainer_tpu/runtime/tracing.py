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


def start_memory_monitor(path: str, interval: float = 1.0):
    """Sample per-device HBM usage at ``interval`` seconds into a CSV from a
    daemon thread — the accelerator leg of the reference's monitor.sh
    (scripts/monitor.sh:67 runs ``nvidia-smi pmon`` per node PID; a TPU is
    process-exclusive, so the equivalent sampler must live INSIDE the
    workload process; tools/monitor.py covers the host-CPU leg externally).

    Returns a ``stop()`` callable that ends sampling and closes the file."""
    import threading
    import time

    stop_event = threading.Event()
    f = open(path, "w")
    f.write("timestamp,device,bytes_in_use,peak_bytes_in_use,bytes_limit\n")

    def run():
        while not stop_event.is_set():
            now = time.time()
            for s in device_memory_stats():
                f.write(
                    f"{now:.3f},{s['device']},{s['bytes_in_use']},"
                    f"{s['peak_bytes_in_use']},{s['bytes_limit']}\n"
                )
            f.flush()
            stop_event.wait(interval)
        f.close()

    threading.Thread(target=run, daemon=True).start()

    def stop():
        stop_event.set()

    return stop
