"""Debug visualizations: HSV dense-flow images and sparse arrow overlays
(the reference publishes these on image topics and via cv2.imshow —
lfn3_sub_node.py:225-260)."""
from __future__ import annotations

import numpy as np


_flow_to_hsv_jit = None


def flow_to_bgr(flow: np.ndarray, max_mag: float | None = None) -> np.ndarray:
    """Dense HSV flow visualization as uint8 BGR.  The conversion is jitted
    (one dispatch per frame, compiled once per shape/max_mag): eager jnp ops
    through the remote TPU backend cost ~ms each and the un-jitted form ran
    ~30 of them per debug frame."""
    global _flow_to_hsv_jit
    if _flow_to_hsv_jit is None:
        import jax

        from ..core.color import flow_to_hsv_rgb

        _flow_to_hsv_jit = jax.jit(flow_to_hsv_rgb, static_argnums=(1,))

    rgb = np.asarray(_flow_to_hsv_jit(np.asarray(flow, np.float32), max_mag))
    return (rgb[..., ::-1] * 255).astype(np.uint8)


def draw_flow_arrows(
    frame: np.ndarray, flow: np.ndarray, step: int = 16, scale: float = 1.0,
    outlier_sigma: float | None = None,
) -> np.ndarray:
    """Arrow overlay every ``step`` px; with ``outlier_sigma`` only arrows
    whose magnitude exceeds mean + sigma*std are drawn (the spike-viz style,
    reference optical_flow_spike_viz.py:89-110)."""
    import cv2

    img = frame.copy()
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, -1)
    H, W = flow.shape[:2]
    mag = np.linalg.norm(flow, axis=-1)
    thresh = None
    if outlier_sigma is not None:
        thresh = mag.mean() + outlier_sigma * mag.std()
    for y in range(step // 2, H, step):
        for x in range(step // 2, W, step):
            if thresh is not None and mag[y, x] <= thresh:
                continue
            dx, dy = flow[y, x] * scale
            cv2.arrowedLine(
                img, (x, y), (int(x + dx), int(y + dy)), (0, 255, 0), 1, tipLength=0.3
            )
    return img


def grid_mean_arrows(frame: np.ndarray, flow: np.ndarray, grid: int = 3) -> np.ndarray:
    """3x3-grid mean-flow arrows (the NeuFlow node's visualization,
    reference neuflow_node.py:175-223)."""
    import cv2

    img = frame.copy()
    H, W = flow.shape[:2]
    gh, gw = H // grid, W // grid
    for gy in range(grid):
        for gx in range(grid):
            cell = flow[gy * gh : (gy + 1) * gh, gx * gw : (gx + 1) * gw]
            mu = cell.reshape(-1, 2).mean(axis=0)
            cx, cy = gx * gw + gw // 2, gy * gh + gh // 2
            cv2.arrowedLine(
                img, (cx, cy), (int(cx + mu[0] * 5), int(cy + mu[1] * 5)),
                (0, 0, 255), 2, tipLength=0.3,
            )
    return img
