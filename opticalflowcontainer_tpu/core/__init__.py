"""Core image primitives (pure JAX, shape-static, TPU-friendly).

All functions operate on float32 arrays with trailing spatial dims ``[..., H, W]``
(gray) or ``[..., H, W, C]`` (color, NHWC — the TPU-native layout), and are
jit/vmap-safe: no data-dependent Python control flow, static shapes only.
"""
from .filters import (
    gaussian_kernel_1d,
    gaussian_blur,
    box_filter,
    median_filter,
    bilateral_filter,
    clahe,
    sobel,
    scharr_deriv,
)
from .resize import resize_bilinear, resize_area
from .warp import (
    warp_bilinear,
    warp_align_corners,
    warp_half_pixel,
    warp_with_mask,
    flow_grid_sample,
)
from .pyramid import pyr_down, gaussian_pyramid, image_pyramid_resize
from .color import bgr_to_rgb, rgb_to_gray, bgr_to_gray, flow_to_hsv_rgb, normalize_image

__all__ = [
    "gaussian_kernel_1d",
    "gaussian_blur",
    "box_filter",
    "median_filter",
    "bilateral_filter",
    "clahe",
    "sobel",
    "scharr_deriv",
    "resize_bilinear",
    "resize_area",
    "warp_bilinear",
    "warp_align_corners",
    "warp_half_pixel",
    "warp_with_mask",
    "flow_grid_sample",
    "pyr_down",
    "gaussian_pyramid",
    "image_pyramid_resize",
    "bgr_to_rgb",
    "rgb_to_gray",
    "bgr_to_gray",
    "flow_to_hsv_rgb",
    "normalize_image",
]
