"""Double-buffered host->device prefetch.

The reference round-trips host<->GPU every frame (reference
lfn3_node.py:176-189); here the NEXT frame's H2D transfer overlaps the
CURRENT frame's compute: a prefetch thread ``jax.device_put``s incoming
frames into a 2-deep ring while the consumer computes on the previous slot
(SURVEY.md §2.3 intra-process pipelining -> double-buffered HBM prefetch).
"""
from __future__ import annotations

import queue as queue_mod
import threading
from typing import Iterator

import jax


class DevicePrefetcher:
    """Wrap a host-side frame iterator; yields device-resident arrays with the
    transfer of item i+1 overlapping the consumer's work on item i."""

    def __init__(self, it: Iterator, depth: int = 2, device=None):
        self._it = iter(it)
        self._q: queue_mod.Queue = queue_mod.Queue(maxsize=depth)
        self._device = device or jax.devices()[0]
        self._done = object()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        try:
            for item in self._it:
                moved = jax.tree_util.tree_map(
                    lambda a: jax.device_put(a, self._device), item
                )
                self._q.put(moved)
        finally:
            self._q.put(self._done)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._done:
            raise StopIteration
        return item
