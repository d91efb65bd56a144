"""Batched device-side frame ingest: decode-adjacent preprocessing as ONE
fused jitted stage (the BASELINE north star makes
decode->grayscale->resize->normalize a batched device-side stage instead of
the reference's per-frame CPU cv2 work, reference lfn3_node.py:161-177).

uint8 frames go to the device as-is (4x less PCIe/DCN traffic than float32);
everything after the transfer is device math XLA fuses into one program.
JPEG entropy-decode itself stays on the host (no TPU decode engine) — see
``runtime.nodes`` for that path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .color import bgr_to_gray, bgr_to_rgb
from .resize import resize_bilinear


@functools.partial(
    jax.jit, static_argnames=("out_hw", "to_gray", "to_rgb", "normalize", "mean")
)
def preprocess_frames(
    frames: jax.Array,
    out_hw: tuple[int, int] | None = None,
    to_gray: bool = False,
    to_rgb: bool = False,
    normalize: bool = True,
    mean: tuple[float, float, float] | None = None,
) -> jax.Array:
    """[B, H, W, 3] uint8 BGR -> preprocessed float32 batch.

    - ``to_gray``: BT.601 grayscale -> [B, H', W']
    - ``to_rgb``: channel flip (models trained on RGB)
    - ``out_hw``: bilinear resize (half-pixel, cv2 parity)
    - ``normalize``: /255; ``mean``: per-channel subtraction after that
      (mean values are on the normalized 0-1 scale, so it requires
      ``normalize=True``, and it is per-channel, so incompatible with
      ``to_gray``)
    """
    if mean is not None and to_gray:
        raise ValueError("mean is per-channel; incompatible with to_gray")
    if mean is not None and not normalize:
        raise ValueError(
            "mean values are on the normalized 0-1 scale; subtracting them "
            "from 0-255 pixels would be silently wrong — set normalize=True")
    x = frames.astype(jnp.float32)
    if to_gray:
        x = bgr_to_gray(x)
        if out_hw is not None:
            x = resize_bilinear(x, out_hw)
    else:
        if to_rgb:
            x = bgr_to_rgb(x)
        if out_hw is not None:
            x = resize_bilinear(x, out_hw, channel_last=True)
    if normalize:
        x = x * (1.0 / 255.0)
    if mean is not None:
        x = x - jnp.asarray(mean, jnp.float32)
    return x


def pad_to_multiple(x: jax.Array, mult: int, channel_last: bool = True):
    """Static edge-pad of the trailing spatial dims up to a multiple (models'
    stride contract); returns (padded, (H, W) original)."""
    h_ax = x.ndim - (3 if channel_last else 2)
    H, W = x.shape[h_ax], x.shape[h_ax + 1]
    Hp = ((H + mult - 1) // mult) * mult
    Wp = ((W + mult - 1) // mult) * mult
    if Hp == H and Wp == W:
        return x, (H, W)
    cfg = [(0, 0)] * x.ndim
    cfg[h_ax] = (0, Hp - H)
    cfg[h_ax + 1] = (0, Wp - W)
    return jnp.pad(x, cfg, mode="edge"), (H, W)
