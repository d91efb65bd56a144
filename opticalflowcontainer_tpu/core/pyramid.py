"""Image pyramids.

Two pyramid styles are needed:

- ``pyr_down`` / ``gaussian_pyramid``: cv2-parity pyrDown with the 5-tap
  binomial kernel [1,4,6,4,1]/16 and REFLECT_101 border — this is what
  ``cv2.buildOpticalFlowPyramid`` feeds the Lucas-Kanade tracker.
- ``image_pyramid_resize``: successive 2x bilinear *resize* pyramids, the style
  the learned models use for their multi-level image pyramids (reference
  liteflownet3.py:266-276 builds them with interpolate).
"""
from __future__ import annotations

import jax
import numpy as np

from .filters import _sepconv
from .resize import resize_bilinear

_PYR_KERNEL = np.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0


def pyr_down(img: jax.Array) -> jax.Array:
    """``cv2.pyrDown`` parity: blur with the 5-tap binomial kernel then take
    every second pixel, output size ceil(dim/2)."""
    blurred = _sepconv(img, _PYR_KERNEL, _PYR_KERNEL, "reflect101")
    return blurred[..., ::2, ::2]


def gaussian_pyramid(img: jax.Array, levels: int) -> list[jax.Array]:
    """Level-0 is the input; each next level is pyr_down of the previous."""
    pyr = [img]
    for _ in range(levels - 1):
        pyr.append(pyr_down(pyr[-1]))
    return pyr


def image_pyramid_resize(
    img: jax.Array, levels: int, align_corners: bool = False, channel_last: bool = True
) -> list[jax.Array]:
    """Bilinear half-resolution pyramid (model-style): level k has spatial dims
    //2**k of the input."""
    h_ax = img.ndim - (3 if channel_last else 2)
    pyr = [img]
    for k in range(1, levels):
        H = img.shape[h_ax] // (2**k)
        W = img.shape[h_ax + 1] // (2**k)
        pyr.append(
            resize_bilinear(pyr[-1], (H, W), align_corners=align_corners, channel_last=channel_last)
        )
    return pyr
