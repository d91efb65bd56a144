"""Color conversion + normalization for the frame-ingest stage.

Device-side equivalents of the per-frame CPU preprocessing the reference nodes
do with cv2 (BGR->RGB, /255, mean subtraction — reference lfn3_node.py:161-177),
plus the HSV flow visualization used by every debug image topic.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# ITU-R BT.601 luma weights — what cv2.cvtColor(COLOR_BGR2GRAY) uses.
_BT601 = (0.299, 0.587, 0.114)


def bgr_to_rgb(img: jax.Array) -> jax.Array:
    """Channel flip on the trailing dim ([..., H, W, 3])."""
    return img[..., ::-1]


def rgb_to_gray(img: jax.Array) -> jax.Array:
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    return _BT601[0] * r + _BT601[1] * g + _BT601[2] * b


def bgr_to_gray(img: jax.Array) -> jax.Array:
    return rgb_to_gray(bgr_to_rgb(img))


def normalize_image(
    img: jax.Array,
    scale: float = 1.0 / 255.0,
    mean: tuple[float, ...] | None = None,
) -> jax.Array:
    """img*scale - mean (per-channel).  ``mean=None`` skips subtraction; models
    that subtract the *per-image* mean (LFN3, reference liteflownet3.py:260-261)
    do that inside their forward instead."""
    out = img.astype(jnp.float32) * scale
    if mean is not None:
        out = out - jnp.asarray(mean, jnp.float32)
    return out


def flow_to_hsv_rgb(flow: jax.Array, max_mag: float | None = None) -> jax.Array:
    """Dense-flow HSV visualization (hue=angle, value=magnitude), returned as
    float RGB in [0,1].  Mirrors the cv2 cartToPolar->HSV->BGR debug images the
    reference publishes (reference lfn3_sub_node.py:246-260)."""
    u, v = flow[..., 0], flow[..., 1]
    mag = jnp.sqrt(u * u + v * v)
    # cv2.cartToPolar convention: angle in [0, 2pi) from +x, so rightward
    # flow (u>0, v=0) maps to hue 0 = red — shifting by +pi instead would
    # rotate every published color wheel a half turn vs the reference images
    ang = jnp.arctan2(v, u)  # [-pi, pi]
    ang = jnp.where(ang < 0, ang + 2.0 * jnp.pi, ang)
    hue = ang / (2.0 * jnp.pi)  # [0, 1]
    if max_mag is None:
        denom = jnp.maximum(jnp.max(mag, axis=(-2, -1), keepdims=True), 1e-6)
    else:
        denom = max_mag
    val = jnp.clip(mag / denom, 0.0, 1.0)
    sat = jnp.ones_like(val)

    # standard HSV -> RGB
    h6 = hue * 6.0
    i = jnp.floor(h6)
    f = h6 - i
    p = val * (1.0 - sat)
    q = val * (1.0 - sat * f)
    t = val * (1.0 - sat * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [val, q, p, p, t, val])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, val, val, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, val, val, q])
    return jnp.stack([r, g, b], axis=-1)
