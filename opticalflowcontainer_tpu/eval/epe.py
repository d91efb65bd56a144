"""Flow accuracy metrics: end-point error and standard derived statistics."""
from __future__ import annotations

import numpy as np


def epe(flow: np.ndarray, gt: np.ndarray, valid: np.ndarray | None = None) -> float:
    """Mean end-point error |flow - gt| over (optionally masked) pixels."""
    d = np.linalg.norm(np.asarray(flow) - np.asarray(gt), axis=-1)
    if valid is not None:
        d = d[np.asarray(valid, bool)]
    return float(d.mean()) if d.size else float("nan")


def epe_stats(flow, gt, valid=None) -> dict:
    d = np.linalg.norm(np.asarray(flow) - np.asarray(gt), axis=-1)
    if valid is not None:
        d = d[np.asarray(valid, bool)]
    if d.size == 0:
        # e.g. a KITTI flow_occ frame with an all-zero valid channel:
        # NaN-valued stats instead of np.percentile raising on empty
        nan = float("nan")
        return {"epe": nan, "p50": nan, "p95": nan,
                "1px": nan, "3px": nan, "5px": nan}
    return {
        "epe": float(d.mean()),
        "p50": float(np.percentile(d, 50)),
        "p95": float(np.percentile(d, 95)),
        "1px": float((d < 1.0).mean()),
        "3px": float((d < 3.0).mean()),
        "5px": float((d < 5.0).mean()),
    }


def outlier_rate(flow, gt, valid=None, abs_thresh: float = 3.0, rel_thresh: float = 0.05) -> float:
    """KITTI Fl-all: fraction of pixels with EPE > 3 px AND > 5% of |gt|."""
    flow = np.asarray(flow)
    gt = np.asarray(gt)
    d = np.linalg.norm(flow - gt, axis=-1)
    mag = np.linalg.norm(gt, axis=-1)
    out = (d > abs_thresh) & (d > rel_thresh * mag)
    if valid is not None:
        out = out[np.asarray(valid, bool)]
    return float(out.mean()) if out.size else float("nan")
