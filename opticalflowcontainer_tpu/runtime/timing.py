"""Observability: per-frame CSV timing and spike-triggered image dumps.

Mirrors the reference mechanisms (SURVEY.md §5): ``[timestamp,
inference_time_s]`` CSVs behind a writeCsv flag (reference
pwc_node.py:38-45,184-191) and outlier-flow PNG dumps when |vx| crosses a
threshold (reference optical_flow_spike_viz.py:29,89-110).
"""
from __future__ import annotations

import os
import threading
import time


class CsvTimer:
    def __init__(self, path: str):
        self.path = path
        self._lock = threading.Lock()
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(self.path, "w") as f:
            f.write("timestamp,inference_time_s\n")

    def record(self, stamp: float, elapsed: float) -> None:
        with self._lock, open(self.path, "a") as f:
            f.write(f"{stamp:.6f},{elapsed:.6f}\n")


class SpikeDumper:
    """Save an annotated frame whenever |vx| exceeds ``threshold`` m/s."""

    def __init__(self, out_dir: str = "spike_images", threshold: float = 0.00075,
                 max_dumps: int = 100):
        self.out_dir = out_dir
        self.threshold = threshold
        self.max_dumps = max_dumps
        self._count = 0

    def maybe_dump(self, frame, flow, vx: float) -> str | None:
        if abs(vx) <= self.threshold or self._count >= self.max_dumps:
            return None
        os.makedirs(self.out_dir, exist_ok=True)
        self._count += 1
        path = os.path.join(self.out_dir, f"spike_{self._count:04d}_{time.time():.3f}.png")
        try:
            import cv2
            import numpy as np

            from .viz import draw_flow_arrows

            img = draw_flow_arrows(np.asarray(frame), flow)
            cv2.imwrite(path, img)
        except Exception:  # pragma: no cover - viz best-effort
            return None
        return path
