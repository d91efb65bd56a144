"""Bilinear resize with explicit grid conventions.

Three sampling conventions coexist in the reference model zoo (SURVEY.md §7
"hard parts"), so the convention is an explicit argument here instead of an
implementation accident:

- ``half_pixel``    : src_x = (dst_x + 0.5) * scale - 0.5, edge-clamped.
                      == cv2.resize(INTER_LINEAR) == torch interpolate
                      (align_corners=False).  The default.
- ``align_corners`` : src_x = dst_x * (W_src-1)/(W_dst-1).
                      == torch interpolate(align_corners=True).

Gather-based (one ``take`` per axis), fully static shapes, works on
``[..., H, W]`` or ``[..., H, W, C]`` via the ``channel_last`` flag.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


from .backend import on_tpu as _on_tpu


def _axis_coords_np(dst: int, src: int, align_corners: bool) -> np.ndarray:
    i = np.arange(dst, dtype=np.float64)
    if align_corners and dst > 1:
        return i * ((src - 1) / (dst - 1))
    return (i + 0.5) * (src / dst) - 0.5


@functools.lru_cache(maxsize=None)
def _interp_matrix(dst: int, src: int, align_corners: bool) -> np.ndarray:
    """[dst, src] bilinear interpolation matrix (2 nonzeros per row) — lets
    the TPU do resize as an MXU matmul instead of a gather."""
    c = _axis_coords_np(dst, src, align_corners)
    c0 = np.floor(c)
    w1 = c - c0
    i0 = np.clip(c0.astype(np.int64), 0, src - 1)
    i1 = np.clip(c0.astype(np.int64) + 1, 0, src - 1)
    M = np.zeros((dst, src), np.float32)
    rows = np.arange(dst)
    np.add.at(M, (rows, i0), 1.0 - w1)
    np.add.at(M, (rows, i1), w1)
    return M


def _resize_axis(x: jax.Array, axis: int, dst: int, align_corners: bool) -> jax.Array:
    src = x.shape[axis]
    if src == dst:
        return x
    if _on_tpu():
        from .banded import as_operator

        M = as_operator(_interp_matrix(dst, src, align_corners))
        x = jnp.moveaxis(x, axis, -1)
        out = jnp.einsum("...j,oj->...o", x, M, preferred_element_type=jnp.float32)
        return jnp.moveaxis(out, -1, axis).astype(x.dtype)
    c = jnp.asarray(_axis_coords_np(dst, src, align_corners), jnp.float32)
    c0 = jnp.floor(c)
    w1 = (c - c0).astype(x.dtype)
    c0i = c0.astype(jnp.int32)
    i0 = jnp.clip(c0i, 0, src - 1)
    i1 = jnp.clip(c0i + 1, 0, src - 1)
    a = jnp.take(x, i0, axis=axis)
    b = jnp.take(x, i1, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = dst
    w1 = w1.reshape(shape)
    return a * (1 - w1) + b * w1


def resize_bilinear(
    img: jax.Array,
    size: tuple[int, int],
    align_corners: bool = False,
    channel_last: bool = False,
) -> jax.Array:
    """Resize trailing spatial dims to ``size=(H, W)``.

    ``channel_last=True`` treats the input as ``[..., H, W, C]``.
    """
    H, W = size
    orig_dtype = img.dtype
    if not jnp.issubdtype(orig_dtype, jnp.floating):
        # integer inputs: blend weights cast to the input dtype would
        # truncate to 0 (silent nearest-floor sampling) — interpolate in
        # f32 and round back (convex combination, so no clipping needed)
        img = img.astype(jnp.float32)
    h_ax = img.ndim - (3 if channel_last else 2)
    w_ax = h_ax + 1
    out = _resize_axis(img, h_ax, H, align_corners)
    out = _resize_axis(out, w_ax, W, align_corners)
    if out.dtype != orig_dtype:
        out = jnp.round(out).astype(orig_dtype)
    return out


def resize_area(img: jax.Array, size: tuple[int, int], channel_last: bool = False) -> jax.Array:
    """Integer-factor area (average-pool) downsample, ``cv2.INTER_AREA`` parity
    when the scale factor is an exact integer."""
    H, W = size
    h_ax = img.ndim - (3 if channel_last else 2)
    w_ax = h_ax + 1
    sh, sw = img.shape[h_ax] // H, img.shape[w_ax] // W
    assert sh * H == img.shape[h_ax] and sw * W == img.shape[w_ax], (
        "resize_area requires integer scale factors"
    )
    shape = list(img.shape)
    shape[h_ax : h_ax + 1] = [H, sh]
    shape[w_ax + 1 : w_ax + 2] = [W, sw]
    return img.reshape(shape).mean(axis=(h_ax + 1, w_ax + 2))
