"""RAFT all-pairs correlation volume, pyramid, and windowed lookup.

The RAFT path (reference capability: visualize_raft.py's torchvision
``raft_large``; BASELINE config 4 asks for RAFT-small with a Pallas
correlation volume) needs three pieces:

1. ``all_pairs_correlation``: C(h, w, h', w') = <F1[h,w,:], F2[h',w',:]>/sqrt(C)
   — expressed as one [HW, C] x [C, HW] matmul, exactly what the TPU MXU wants.
2. ``corr_pyramid``: average-pool the last two (target) dims into L levels.
3. ``corr_lookup``: for each source pixel and level, bilinearly sample the
   volume in a (2r+1)^2 grid centered at the flow-displaced target coordinate
   (coords divided by 2^level), concatenating levels -> [H, W, L*(2r+1)^2].

Layout: features NHWC; volume [H, W, H', W'] per batch element (vmap for
batches).  All shapes static; the lookup is a gather the TPU handles well
because the (2r+1)^2 taps are unrolled statically.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def all_pairs_correlation(f1: jax.Array, f2: jax.Array) -> jax.Array:
    """[H, W, C] x [H, W, C] -> [H, W, H, W] scaled by 1/sqrt(C)."""
    H, W, C = f1.shape
    a = f1.reshape(H * W, C)
    b = f2.reshape(H * W, C)
    vol = jnp.dot(a, b.T, preferred_element_type=jnp.float32) / jnp.sqrt(
        jnp.asarray(C, jnp.float32)
    )
    return vol.reshape(H, W, H, W)


def corr_pyramid(vol: jax.Array, levels: int = 4) -> list[jax.Array]:
    """Average-pool the target dims by 2 per level: [H, W, H/2^l, W/2^l]."""
    H, W = vol.shape[0], vol.shape[1]
    pyr = [vol]
    for _ in range(levels - 1):
        v = pyr[-1]
        h2, w2 = v.shape[2] // 2, v.shape[3] // 2
        v = v[:, :, : h2 * 2, : w2 * 2].reshape(H, W, h2, 2, w2, 2).mean(axis=(3, 5))
        pyr.append(v)
    return pyr


from ..core.backend import on_tpu as _on_tpu


def _bilinear_volume_sample(vol: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Sample vol [H, W, H2, W2] at per-source-pixel target coords
    x, y [H, W, T] (zeros outside), returning [H, W, T].

    TPU: the gather engine's cost is per gathered element, so the four
    bilinear taps are packed into one 4-channel row (self/right/down/
    down-right) and fetched with a single bf16 gather — ~4x fewer elements
    than four scalar gathers (same trick as the Farneback warp)."""
    H, W, H2, W2 = vol.shape
    T = x.shape[-1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    if _on_tpu():
        # zero-pad one ring so every base (y0+1, x0+1) with y0 in [-1, H2-1]
        # maps to an exact 2x2 block carrying the zero-outside semantics;
        # fully-out-of-range bases are killed by the per-tap masks below.
        volp = jnp.pad(vol, ((0, 0), (0, 0), (1, 1), (1, 1)))
        Hp, Wp = H2 + 2, W2 + 2
        right = jnp.concatenate([volp[..., :, 1:], volp[..., :, -1:]], axis=-1)
        down = jnp.concatenate([volp[..., 1:, :], volp[..., -1:, :]], axis=-2)
        downright = jnp.concatenate([down[..., :, 1:], down[..., :, -1:]], axis=-1)
        packed = jnp.stack([volp, right, down, downright], axis=-1).astype(
            jnp.bfloat16
        )  # [H, W, Hp, Wp, 4]
        xc = jnp.clip(x0i + 1, 0, Wp - 2)
        yc = jnp.clip(y0i + 1, 0, Hp - 2)
        lin = (yc * Wp + xc).reshape(H * W, T, 1)
        g = jnp.take_along_axis(
            packed.reshape(H * W, Hp * Wp, 4),
            jnp.broadcast_to(lin, (H * W, T, 1)),
            axis=1,
        ).astype(jnp.float32).reshape(H, W, T, 4)
        ok = lambda iy, ix: ((iy >= 0) & (iy < H2) & (ix >= 0) & (ix < W2)).astype(
            jnp.float32
        )
        return (
            g[..., 0] * (1 - wx) * (1 - wy) * ok(y0i, x0i)
            + g[..., 1] * wx * (1 - wy) * ok(y0i, x0i + 1)
            + g[..., 2] * (1 - wx) * wy * ok(y0i + 1, x0i)
            + g[..., 3] * wx * wy * ok(y0i + 1, x0i + 1)
        )

    flat = vol.reshape(H * W, H2 * W2)

    def tap(iy, ix):
        ok = (iy >= 0) & (iy < H2) & (ix >= 0) & (ix < W2)
        lin = jnp.clip(iy, 0, H2 - 1) * W2 + jnp.clip(ix, 0, W2 - 1)
        v = jnp.take_along_axis(flat, lin.reshape(H * W, T), axis=1).reshape(H, W, T)
        return jnp.where(ok, v, 0.0)

    return (
        tap(y0i, x0i) * (1 - wx) * (1 - wy)
        + tap(y0i, x0i + 1) * wx * (1 - wy)
        + tap(y0i + 1, x0i) * (1 - wx) * wy
        + tap(y0i + 1, x0i + 1) * wx * wy
    )


def _window_volume_sample_rows(vol: jax.Array, cx: jax.Array, cy: jax.Array,
                               r: int) -> jax.Array:
    """Windowed bilinear volume sample around per-pixel centers (cx, cy)
    [H, W] -> [H, W, (2r+1)^2], zeros outside, row-major (dy, dx).

    All (2r+1)^2 window taps of one pixel share a single fractional offset
    (the offsets are integers), so instead of (2r+1)^2 per-tap gathers this
    fetches the 2r+3 consecutive FULL target-width y-rows of each pixel's
    volume plane (one row gather each — ~6x fewer gathered rows, the measured
    per-row cost being flat in row width), combines the y-bilinear pairs
    elementwise, and contracts the x-window as a per-pixel one-hot matmul on
    the MXU (the one-hot carries the x-bilinear weights and the zero-outside
    masking)."""
    H, W, H2, W2 = vol.shape
    P = H * W
    n = 2 * r + 1
    x0 = jnp.floor(cx).astype(jnp.int32)
    y0 = jnp.floor(cy).astype(jnp.int32)
    wx = (cx - x0.astype(jnp.float32)).reshape(P)
    wy = (cy - y0.astype(jnp.float32)).reshape(P)

    # y taps y0 - r .. y0 + r + 1 (n + 1 consecutive rows)
    ytap = y0.reshape(P, 1) + jnp.arange(-r, r + 2, dtype=jnp.int32)[None]
    ymask = (ytap >= 0) & (ytap < H2)
    lin = (
        jnp.arange(P, dtype=jnp.int32)[:, None] * H2
        + jnp.clip(ytap, 0, H2 - 1)
    ).reshape(P * (n + 1), 1)
    src = vol.astype(jnp.bfloat16).reshape(P * H2, W2)
    rows = (
        jnp.take_along_axis(src, lin, axis=0)
        .astype(jnp.float32)
        .reshape(P, n + 1, W2)
    )
    rows = rows * ymask[..., None].astype(jnp.float32)
    vy = rows[:, :n] * (1.0 - wy)[:, None, None] + rows[:, 1:] * wy[:, None, None]

    # x-window one-hot (bilinear weights + zero-outside folded in)
    base = (x0.reshape(P) - r)[:, None, None]  # leftmost integer tap
    xs = jnp.arange(W2, dtype=jnp.int32)[None, :, None]
    dxs = jnp.arange(n, dtype=jnp.int32)[None, None, :]
    Sx = (xs == base + dxs).astype(jnp.float32) * (1.0 - wx)[:, None, None] + (
        xs == base + dxs + 1
    ).astype(jnp.float32) * wx[:, None, None]
    out = jnp.einsum("pdx,pxe->pde", vy, Sx, preferred_element_type=jnp.float32)
    return out.reshape(H, W, n * n)


# Packing gate, in packed bytes.  Default 0 = OFF: an interleaved A/B at
# RAFT-small 384x512 (r4 probe, 64-rep chains, 3 rounds) measured the packed
# form +3.4 ms FIXED (the pack construction: 10.8 vs 7.4 ms) with NO
# per-iteration saving (0.590 vs 0.588 ms/iter) — the gather cost is per row
# and the rows path's n+1 thin gathers cost the same as one fat one at these
# row widths, so the pack only adds its build cost.  The code path stays for
# shapes/backends where fatter rows might win; raise the gate to re-enable.
PACK_MAX_BYTES = 0


def pack_corr_pyramid(
    pyramid: list[jax.Array], radius: int
) -> list[jax.Array]:
    """Pre-pack each pyramid level's target plane into y-window fat rows.

    The volume is FIXED across all GRU iterations, but the per-iteration
    lookup (_window_volume_sample_rows) gathers n+1 = 2r+2 separate y-rows
    per (source pixel, level) every iteration.  The measured gather cost is
    per ROW and flat in row width (CLAUDE.md round-1: ~11 ns/row for
    16-256 B rows), so packing the n+1 consecutive (zero-padded) y-rows of
    every possible window position into ONE fat row — once per frame —
    makes each iteration's lookup a single gather per (pixel, level):
    (n+1)x fewer gathered rows on the dominant per-iteration term,
    amortized over the 12 iterations.

    Returns [P, H2+n, (n+1)*W2] bf16 per level (P = H*W source pixels;
    row k holds target y-rows k-n .. k of the n-padded plane, i.e. the
    window of floor(cy) = k - r - 1).  Falls back to the unpacked pyramid
    when the packed bytes would exceed PACK_MAX_BYTES (the packed form is
    (n+1)/2 x the f32 volume; RAFT shapes stay far under the cap).
    """
    n = 2 * radius + 1
    total = sum(
        v.shape[0] * v.shape[1] * (v.shape[2] + n) * (n + 1) * v.shape[3] * 2
        for v in pyramid
    )
    if total > PACK_MAX_BYTES:
        return pyramid
    packed = []
    for vol in pyramid:
        H, W, H2, W2 = vol.shape
        P = H * W
        volp = jnp.pad(
            vol.astype(jnp.bfloat16).reshape(P, H2, W2), ((0, 0), (n, n), (0, 0))
        )
        K = H2 + n
        packed.append(
            jnp.concatenate([volp[:, i : i + K, :] for i in range(n + 1)], axis=-1)
        )
    return packed


def _window_volume_sample_packed(rows: jax.Array, cx: jax.Array, cy: jax.Array,
                                 r: int) -> jax.Array:
    """Windowed bilinear sample from a pack_corr_pyramid level.

    Same math as _window_volume_sample_rows (y-bilinear pairs elementwise,
    x-window as a per-pixel one-hot matmul carrying the x-bilinear weights
    and zero-outside masking) but fetches ONE fat row per source pixel:
    row k = floor(cy) + r + 1 of the packed level holds the window's n+1
    zero-padded y-rows.  Out-of-range y handling: partial overlaps read the
    zero padding baked into the pack (exact); fully-out windows hit a
    clamped real-data row and are killed by the `valid` mask.
    """
    P, K, Wn = rows.shape
    n = 2 * r + 1
    H2 = K - n
    W2 = Wn // (n + 1)
    y0 = jnp.floor(cy).astype(jnp.int32).reshape(P)
    x0 = jnp.floor(cx).astype(jnp.int32).reshape(P)
    wy = cy.reshape(P) - y0.astype(jnp.float32)
    wx = cx.reshape(P) - x0.astype(jnp.float32)
    k = jnp.clip(y0 + r + 1, 0, K - 1)
    lin = (jnp.arange(P, dtype=jnp.int32) * K + k).reshape(P, 1)
    fat = jnp.take_along_axis(rows.reshape(P * K, Wn), lin, axis=0)
    win = fat.astype(jnp.float32).reshape(P, n + 1, W2)
    valid = ((y0 >= -(r + 1)) & (y0 <= H2 - 1 + r)).astype(jnp.float32)
    vy = win[:, :n] * (1.0 - wy)[:, None, None] + win[:, 1:] * wy[:, None, None]
    vy = vy * valid[:, None, None]
    base = (x0 - r)[:, None, None]
    xs = jnp.arange(W2, dtype=jnp.int32)[None, :, None]
    dxs = jnp.arange(n, dtype=jnp.int32)[None, None, :]
    Sx = (xs == base + dxs).astype(jnp.float32) * (1.0 - wx)[:, None, None] + (
        xs == base + dxs + 1
    ).astype(jnp.float32) * wx[:, None, None]
    return jnp.einsum("pdx,pxe->pde", vy, Sx, preferred_element_type=jnp.float32)


def corr_lookup(
    pyramid: list[jax.Array], flow: jax.Array, radius: int = 4
) -> jax.Array:
    """Windowed multi-scale cost-volume lookup.

    ``flow`` [H, W, 2] (u, v); returns [H, W, levels*(2r+1)^2] features, level
    -major then row-major over (dy, dx) — torchvision RAFT ordering.
    ``pyramid`` is either raw [H, W, H2, W2] levels or the fat-row-packed
    form from :func:`pack_corr_pyramid` (detected by ndim).
    """
    H, W = flow.shape[0], flow.shape[1]
    r = radius
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    cx = xs + flow[..., 0].astype(jnp.float32)
    cy = ys + flow[..., 1].astype(jnp.float32)
    n = 2 * r + 1
    if pyramid[0].ndim == 3:
        return jnp.concatenate(
            [
                _window_volume_sample_packed(
                    rows, cx * 0.5**l, cy * 0.5**l, r
                ).reshape(H, W, n * n)
                for l, rows in enumerate(pyramid)
            ],
            axis=-1,
        )
    if _on_tpu():
        return jnp.concatenate(
            [
                _window_volume_sample_rows(vol, cx * 0.5**l, cy * 0.5**l, r)
                for l, vol in enumerate(pyramid)
            ],
            axis=-1,
        )
    oy, ox = np.mgrid[-r : r + 1, -r : r + 1]
    oy = jnp.asarray(oy.reshape(-1), jnp.float32)
    ox = jnp.asarray(ox.reshape(-1), jnp.float32)
    feats = []
    for lvl, vol in enumerate(pyramid):
        scale = 0.5**lvl
        x = cx[..., None] * scale + ox
        y = cy[..., None] * scale + oy
        feats.append(_bilinear_volume_sample(vol, x, y))
    return jnp.concatenate(feats, axis=-1)
