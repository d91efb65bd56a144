"""Backward warping (grid_sample equivalents) — the three reference conventions.

The reference model zoo uses three *different* sampling grids for its
``backwarp`` helpers, and converted pretrained weights are only correct if the
convention matches (SURVEY.md §7 "hard parts"):

- LiteFlowNet v1 (reference liteflownet.py:9-27): normalized grid with
  endpoints at -1/+1 on pixel *centers* 0 and W-1 — torch
  ``grid_sample(align_corners=True)``, zeros padding.
- LiteFlowNet3 (reference liteflownet3.py:12-30): half-pixel grid
  ``linspace(-1+1/W, 1-1/W, W)`` — torch ``align_corners=False``, zeros padding.
- PWC-Net (reference pwc_net.py:12-36): align_corners=True grid plus a warped
  ones-channel validity mask, thresholded at 0.999 and multiplied in.

All are expressed here through one gather-based bilinear sampler in *pixel*
coordinates with zeros padding; each convention just maps flow to pixel coords.
Layout: images ``[..., H, W, C]`` (NHWC), flow ``[..., H, W, 2]`` with
``flow[..., 0] = u`` (x-displacement), ``flow[..., 1] = v``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _gather_hw(img: jax.Array, iy: jax.Array, ix: jax.Array) -> jax.Array:
    """Gather img[..., iy, ix, :] for integer index maps [..., h, w] whose
    leading dims broadcast against the image's batch dims."""
    H, W, C = img.shape[-3], img.shape[-2], img.shape[-1]
    batch = img.shape[:-3]
    flat = img.reshape(batch + (H * W, C))
    lin = iy * W + ix
    h, w = lin.shape[-2], lin.shape[-1]
    lin = jnp.broadcast_to(lin, batch + (h, w)).reshape(batch + (h * w, 1))
    out = jnp.take_along_axis(flat, lin, axis=-2)
    return out.reshape(batch + (h, w, C))


from .backend import on_tpu as _on_tpu


def sample_bilinear_zeros(img: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Bilinear sample of ``img [..., H, W, C]`` at float pixel coords (x, y)
    ``[H, W]`` each, zeros outside: out-of-range *taps* contribute zero, exactly
    like torch ``grid_sample(padding_mode='zeros')``.

    TPU path: the gather engine's cost is per gathered row, so the four taps
    are packed into one 4C-channel row and fetched with a single gather from a
    zero-ring-padded image (4x fewer gathered rows than four tap gathers).

    Coordinate math is always fp32 (bf16 coords would quantize pixel
    positions); tap values and blend weights follow the image dtype, so bf16
    images warp at bf16 cost."""
    H, W = img.shape[-3], img.shape[-2]
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None].astype(img.dtype)
    wy = (y - y0)[..., None].astype(img.dtype)
    one = jnp.ones((), img.dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    if _on_tpu():
        C = img.shape[-1]
        batch = img.shape[:-3]
        B = int(np.prod(batch, dtype=np.int64)) if batch else 1
        cfg = [(0, 0)] * (img.ndim - 3) + [(1, 1), (1, 1), (0, 0)]
        p = jnp.pad(img, cfg)  # zero ring: base (y0+1, x0+1) valid for y0 >= -1
        Hp, Wp = H + 2, W + 2
        right = jnp.concatenate([p[..., :, 1:, :], p[..., :, -1:, :]], axis=-2)
        down = jnp.concatenate([p[..., 1:, :, :], p[..., -1:, :, :]], axis=-3)
        downright = jnp.concatenate(
            [down[..., :, 1:, :], down[..., :, -1:, :]], axis=-2
        )
        packed = jnp.concatenate([p, right, down, downright], axis=-1)
        yc = jnp.clip(y0i + 1, 0, Hp - 2)
        xc = jnp.clip(x0i + 1, 0, Wp - 2)
        h, w = x.shape[-2], x.shape[-1]
        lin = (yc * Wp + xc).reshape(-1, h * w, 1)
        lin = jnp.broadcast_to(lin, (B, h * w, 1)).reshape(B, h * w, 1)
        src = packed.reshape(B, Hp * Wp, 4 * C)
        g = jnp.stack(
            [jnp.take_along_axis(src[b], lin[b], axis=0) for b in range(B)]
        ).reshape(batch + (h, w, 4, C))
        ok = lambda iy, ix: (
            ((iy >= 0) & (iy < H) & (ix >= 0) & (ix < W))[..., None]
        ).astype(img.dtype)
        return (
            g[..., 0, :] * (one - wx) * (one - wy) * ok(y0i, x0i)
            + g[..., 1, :] * wx * (one - wy) * ok(y0i, x0i + 1)
            + g[..., 2, :] * (one - wx) * wy * ok(y0i + 1, x0i)
            + g[..., 3, :] * wx * wy * ok(y0i + 1, x0i + 1)
        )

    out = None
    for dy, dx, w in (
        (0, 0, (one - wx) * (one - wy)),
        (0, 1, wx * (one - wy)),
        (1, 0, (one - wx) * wy),
        (1, 1, wx * wy),
    ):
        ix, iy = x0i + dx, y0i + dy
        valid = ((ix >= 0) & (ix < W) & (iy >= 0) & (iy < H))[..., None]
        v = _gather_hw(img, jnp.clip(iy, 0, H - 1), jnp.clip(ix, 0, W - 1))
        term = jnp.where(valid, v * w, jnp.zeros((), img.dtype))
        out = term if out is None else out + term
    return out


def sample_bilinear_edge(img: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Bilinear sample with edge clamping (border replicate) — used by the
    classical-flow stack where OpenCV clamps instead of zero-padding."""
    H, W = img.shape[-3], img.shape[-2]
    x = jnp.clip(x.astype(jnp.float32), 0.0, W - 1.0)
    y = jnp.clip(y.astype(jnp.float32), 0.0, H - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None].astype(img.dtype)
    wy = (y - y0)[..., None].astype(img.dtype)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)
    v00 = _gather_hw(img, y0i, x0i)
    v01 = _gather_hw(img, y0i, x1i)
    v10 = _gather_hw(img, y1i, x0i)
    v11 = _gather_hw(img, y1i, x1i)
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


def _base_grid(H: int, W: int) -> tuple[jax.Array, jax.Array]:
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    return xs, ys


def warp_bilinear(img: jax.Array, flow: jax.Array, padding: str = "zeros") -> jax.Array:
    """Warp ``img`` by ``flow`` in raw pixel units: out(p) = img(p + flow(p)).

    This is the exact pixel-space warp (no normalized-grid round trip); both
    align_corners conventions reduce to this when the flow is already in pixels.
    """
    H, W = img.shape[-3], img.shape[-2]
    xs, ys = _base_grid(H, W)
    x = xs + flow[..., 0].astype(jnp.float32)
    y = ys + flow[..., 1].astype(jnp.float32)
    sampler = sample_bilinear_zeros if padding == "zeros" else sample_bilinear_edge
    return sampler(img, x, y)


def warp_align_corners(img: jax.Array, flow: jax.Array) -> jax.Array:
    """LiteFlowNet-v1 convention (torch align_corners=True, zeros padding).

    The torch code normalizes flow by (W-1)/2 and adds it to a +/-1-endpoint
    grid; in pixel space that is exactly ``p + flow`` — the convention only
    changes how *normalized* coordinates map back to pixels, and with
    align_corners=True that mapping is the identity on pixel centers.
    """
    return warp_bilinear(img, flow, padding="zeros")


def warp_half_pixel(img: jax.Array, flow: jax.Array) -> jax.Array:
    """LiteFlowNet3 convention (torch align_corners=False, zeros padding).

    LFN3 builds grid = linspace(-1+1/W, 1-1/W, W) + flow*2/(W-1) and samples
    with align_corners=False (reference liteflownet3.py:12-30).  Mapping the
    normalized coordinate back to pixels, x_pix = ((gx+1)*W - 1)/2
    = x + u*W/(W-1): the effective pixel displacement is scaled by W/(W-1)
    (and v by H/(H-1)).  Converted LFN3 weights are only correct with this
    exact scaling.
    """
    H, W = img.shape[-3], img.shape[-2]
    sx = W / (W - 1.0) if W > 1 else 1.0
    sy = H / (H - 1.0) if H > 1 else 1.0
    scale = jnp.asarray([sx, sy], jnp.float32)
    return warp_bilinear(img, flow.astype(jnp.float32) * scale, padding="zeros")


def warp_with_mask(img: jax.Array, flow: jax.Array) -> jax.Array:
    """PWC-Net convention: warp with zeros padding, also warp a ones channel,
    gate by (mask > 0.999) hard threshold (reference pwc_net.py:12-36)."""
    ones = jnp.ones(img.shape[:-1] + (1,), img.dtype)
    both = jnp.concatenate([img, ones], axis=-1)
    warped = warp_bilinear(both, flow, padding="zeros")
    mask = (warped[..., -1:].astype(jnp.float32) > 0.999).astype(img.dtype)
    return warped[..., :-1] * mask


def flow_grid_sample(img: jax.Array, grid_xy: jax.Array, padding: str = "zeros") -> jax.Array:
    """Sample ``img [..., H, W, C]`` at absolute pixel coords ``grid_xy [..., 2]``
    of any spatial shape [h, w] — the RAFT correlation-lookup primitive."""
    sampler = sample_bilinear_zeros if padding == "zeros" else sample_bilinear_edge
    return sampler(img, grid_xy[..., 0], grid_xy[..., 1])
