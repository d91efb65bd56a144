"""Junction tracking: flow-predicted junction positions matched to fresh
detections (the reference's lfn3_junction_node capability, reference
lfn3_junction_node.py:108-250).

Keeps a timestamp-keyed LRU of recent junction detections; each frame, the
previous junctions are advanced by the dense flow sampled at their positions
and matched to the current detections with a KD-tree gate; velocity comes
from the mean matched displacement when enough matches survive.
"""
from __future__ import annotations

import collections

import numpy as np
from scipy.spatial import cKDTree


class JunctionTracker:
    def __init__(self, history: int = 10, match_gate_px: float = 5.0,
                 min_matches: int = 4):
        self.history: collections.OrderedDict[float, np.ndarray] = collections.OrderedDict()
        self.max_history = history
        self.gate = match_gate_px
        self.min_matches = min_matches

    def add_detection(self, stamp: float, points: np.ndarray) -> None:
        self.history[stamp] = np.asarray(points, np.float32).reshape(-1, 2)
        while len(self.history) > self.max_history:
            self.history.popitem(last=False)

    def latest_before(self, stamp: float):
        best = None
        for t, pts in self.history.items():
            if t <= stamp and (best is None or t > best[0]):
                best = (t, pts)
        return best

    def track(self, flow: np.ndarray, prev_stamp: float, cur_stamp: float):
        """Advance the junctions detected at/before ``prev_stamp`` by ``flow``
        and match them to the detections at/before ``cur_stamp``.

        Returns (mean_displacement [2] or None, n_matches)."""
        prev = self.latest_before(prev_stamp)
        cur = self.latest_before(cur_stamp)
        if prev is None or cur is None or prev[0] == cur[0]:
            return None, 0
        prev_pts, cur_pts = prev[1], cur[1]
        if len(prev_pts) == 0 or len(cur_pts) == 0:
            return None, 0
        H, W = flow.shape[:2]
        xi = np.clip(prev_pts[:, 0].round().astype(int), 0, W - 1)
        yi = np.clip(prev_pts[:, 1].round().astype(int), 0, H - 1)
        predicted = prev_pts + flow[yi, xi]
        tree = cKDTree(cur_pts)
        dist, idx = tree.query(predicted, distance_upper_bound=self.gate)
        matched = np.isfinite(dist)
        if matched.sum() < self.min_matches:
            return None, int(matched.sum())
        disp = cur_pts[idx[matched]] - prev_pts[matched]
        return disp.mean(axis=0), int(matched.sum())
