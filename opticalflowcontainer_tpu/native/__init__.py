"""Host-side native components.

:func:`detect_junctions` — fishnet junction-point detection.  Uses the C++
library (``junction/libjunction.so``, built on demand with make) through
ctypes; falls back to a cv2-python implementation of the same pipeline when
the native build is unavailable.  The reference keeps this detector native
too (C++ ROS node, SURVEY.md §2.1) because contour analysis does not map to
the TPU — it runs host-side and feeds the device pipeline through the
``/junction_detector/junctions`` topic.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.join(os.path.dirname(__file__), "junction")
_LIB_PATH = os.path.join(_DIR, "libjunction.so")
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_lib_failed = False


def _load_native() -> ctypes.CDLL | None:
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            if not os.path.exists(_LIB_PATH):
                subprocess.run(
                    ["make", "-s", "libjunction.so"], cwd=_DIR, check=True,
                    capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(_LIB_PATH)
            lib.ofc_detect_junctions.restype = ctypes.c_int
            lib.ofc_detect_junctions.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_int,
                ctypes.c_float, ctypes.c_float, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ]
            _lib = lib
        except Exception:
            _lib_failed = True
        return _lib


def detect_junctions(
    bgr: np.ndarray,
    grid_area: float = 200.0,
    area_tol: float = 2.0,
    cluster_eps: float = 6.0,
    min_cluster_pts: int = 3,
    rb_lo: float = -20.0,
    rb_hi: float = 15.0,
    rotated: bool = False,
    max_out: int = 4096,
    force_python: bool = False,
) -> np.ndarray:
    """Detect fishnet junction points in a bgr8 image -> [N, 2] float32 (x, y).

    ``rotated=True`` fits minAreaRect cells (the reference test-harness
    variant for nets seen at an angle, junction_point_tests/
    junction_detector.cpp:126-170) instead of axis-aligned boxes."""
    bgr = np.ascontiguousarray(bgr, np.uint8)
    assert bgr.ndim == 3 and bgr.shape[2] == 3
    if not force_python:
        lib = _load_native()
        if lib is not None:
            out = np.empty((max_out, 2), np.float32)
            n = lib.ofc_detect_junctions(
                bgr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                bgr.shape[0], bgr.shape[1],
                ctypes.c_float(grid_area), ctypes.c_float(area_tol),
                ctypes.c_float(cluster_eps), min_cluster_pts,
                ctypes.c_float(rb_lo), ctypes.c_float(rb_hi),
                int(rotated),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_out,
            )
            if n >= 0:
                return out[:n].copy()
    return _detect_junctions_py(
        bgr, grid_area, area_tol, cluster_eps, min_cluster_pts, rb_lo, rb_hi,
        rotated,
    )


def _detect_junctions_py(bgr, grid_area, area_tol, cluster_eps, min_pts, rb_lo,
                         rb_hi, rotated=False):
    """cv2-python fallback implementing the same pipeline (also the oracle the
    native path is tested against)."""
    import cv2

    b, g, r = bgr[..., 0].astype(np.float32), bgr[..., 1].astype(np.float32), bgr[..., 2].astype(np.float32)
    rb = r - b
    span = max(rb_hi - rb_lo, 1.0)
    w = np.where(rb < rb_lo, np.maximum(0.0, 1.0 + (rb - rb_lo) / span), 1.0)
    lum = 0.114 * b + 0.587 * g + 0.299 * r
    gray = np.minimum(255.0, lum * w).astype(np.uint8)

    blurred = cv2.GaussianBlur(gray, (3, 3), 0)
    bin_ = cv2.adaptiveThreshold(
        blurred, 255, cv2.ADAPTIVE_THRESH_GAUSSIAN_C, cv2.THRESH_BINARY_INV, 11, 2
    )
    contours, _ = cv2.findContours(bin_, cv2.RETR_TREE, cv2.CHAIN_APPROX_SIMPLE)
    cands = []
    amin, amax = grid_area / area_tol, grid_area * area_tol
    for c in contours:
        area = cv2.contourArea(c)
        if area < amin or area > amax:
            continue
        if rotated:
            rect = cv2.minAreaRect(c)
            (rw, rh), ang = rect[1], rect[2]
            if ang < -45:
                rw, rh = rh, rw
            if rw <= 0 or rh <= 0:
                continue
            if area / (rw * rh) < 0.4 or not (0.5 <= rw / rh <= 2.0):
                continue
            cands += [tuple(p) for p in cv2.boxPoints(rect)]
            continue
        x, y, bw, bh = cv2.boundingRect(c)
        if bw <= 0 or bh <= 0:
            continue
        if area / (bw * bh) < 0.4 or not (0.5 <= bw / bh <= 2.0):
            continue
        cands += [(x, y), (x + bw, y), (x, y + bh), (x + bw, y + bh)]
    if not cands:
        return np.zeros((0, 2), np.float32)

    pts = np.asarray(cands, np.float32)
    # simple O(N^2) radius clustering (fallback path; native uses a grid hash)
    n = len(pts)
    label = -np.ones(n, np.int64)
    nc = 0
    for seed in range(n):
        if label[seed] != -1:
            continue
        stack = [seed]
        label[seed] = nc
        while stack:
            i = stack.pop()
            d2 = np.sum((pts - pts[i]) ** 2, axis=1)
            for j in np.nonzero((d2 <= cluster_eps**2) & (label == -1))[0]:
                label[j] = nc
                stack.append(int(j))
        nc += 1
    out = []
    for c in range(nc):
        members = pts[label == c]
        if len(members) >= min_pts:
            out.append(members.mean(axis=0))
    return np.asarray(out, np.float32).reshape(-1, 2)


__all__ = ["detect_junctions"]
