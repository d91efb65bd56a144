"""Adaptive preprocessing + flow post-processing (the reference's
lfn3_adapt_node capability, reference lfn3_adapt_node.py:26-312).

Preprocessing (before the flow backend):
- contrast-adaptive CLAHE: clip limit linearly interpolated from the frame's
  contrast (std/mean) between [clahe_min_clip, clahe_max_clip]
- optional bilateral filter

Flow post-processing (after the backend):
- median filter on each flow channel
- magnitude threshold (zero out |flow| below min / above max)
- intensity mask (ignore flow where the image is too dark)

All steps are device-side jax ops from ``core`` so they fuse with the flow
computation under one jit when used with jax backends.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..core.filters import bilateral_filter, clahe, median_filter


@dataclasses.dataclass
class AdaptiveParams:
    use_clahe: bool = True
    clahe_min_clip: float = 1.0
    clahe_max_clip: float = 4.0
    contrast_low: float = 0.15   # std/mean at/below which max clip applies
    contrast_high: float = 0.5   # std/mean at/above which min clip applies
    clahe_grid: int = 8
    use_bilateral: bool = False
    bilateral_d: int = 5
    bilateral_sigma_color: float = 25.0
    bilateral_sigma_space: float = 5.0
    flow_median_ksize: int = 0        # 0 = off
    flow_min_mag: float = 0.0
    flow_max_mag: float = float("inf")
    intensity_mask_thresh: float = 0.0  # pixels darker than this get zero flow


class AdaptivePreprocessor:
    def __init__(self, params: AdaptiveParams | None = None):
        self.p = params or AdaptiveParams()

    def preprocess(self, gray: np.ndarray) -> np.ndarray:
        """gray float [H, W] in 0..255 -> enhanced gray."""
        p = self.p
        out = np.asarray(gray, np.float32)
        if p.use_clahe:
            mean = float(out.mean())
            std = float(out.std())
            contrast = std / max(mean, 1e-6)
            t = np.clip(
                (contrast - p.contrast_low) / max(p.contrast_high - p.contrast_low, 1e-6),
                0.0, 1.0,
            )
            clip = p.clahe_max_clip + t * (p.clahe_min_clip - p.clahe_max_clip)
            H, W = out.shape
            Hc = (H // p.clahe_grid) * p.clahe_grid
            Wc = (W // p.clahe_grid) * p.clahe_grid
            if Hc and Wc:
                out = out.copy()
                out[:Hc, :Wc] = np.asarray(
                    clahe(out[:Hc, :Wc], float(clip), p.clahe_grid)
                )
        if p.use_bilateral:
            out = np.asarray(
                bilateral_filter(
                    out, p.bilateral_d, p.bilateral_sigma_color, p.bilateral_sigma_space
                )
            )
        return out

    def postprocess(self, flow: np.ndarray, gray: np.ndarray) -> np.ndarray:
        p = self.p
        out = np.asarray(flow, np.float32)
        if p.flow_median_ksize >= 3:
            out = np.stack(
                [
                    np.asarray(median_filter(out[..., 0], p.flow_median_ksize)),
                    np.asarray(median_filter(out[..., 1], p.flow_median_ksize)),
                ],
                axis=-1,
            )
        mag = np.linalg.norm(out, axis=-1)
        keep = (mag >= p.flow_min_mag) & (mag <= p.flow_max_mag)
        if p.intensity_mask_thresh > 0:
            keep &= np.asarray(gray) >= p.intensity_mask_thresh
        return out * keep[..., None]


def make_adaptive_backend(backend, params: AdaptiveParams | None = None):
    """Wrap a flow backend with adaptive pre/post processing."""
    proc = AdaptivePreprocessor(params)
    last = [None, None]  # [frame ref, preprocessed] — prev is last call's cur

    def wrapped(prev, cur, dt):
        # streaming callers pass last call's cur as this call's prev —
        # reuse its preprocessed form instead of running CLAHE/bilateral
        # twice per frame on the hot path (the kept reference makes the
        # identity check safe against id() reuse)
        prev_p = last[1] if last[0] is prev else proc.preprocess(prev)
        cur_p = proc.preprocess(cur)
        last[0], last[1] = cur, cur_p
        flow = backend(prev_p, cur_p, dt)
        return proc.postprocess(flow, cur)

    return wrapped
