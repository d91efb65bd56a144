"""Sparse pyramidal Lucas-Kanade tracking, cv2.calcOpticalFlowPyrLK parity.

Bouguet-style pyramidal LK: for each corner, at each pyramid level (coarse to
fine), iterate the 2x2 windowed least-squares solve
    G = sum_w [Ix^2, IxIy; IxIy, Iy^2],  d += G^-1 * sum_w [It*Ix, It*Iy]
with bilinear sampling of the image and Scharr-derivative windows at sub-pixel
positions.  cv2 computes derivatives with the (-3,0,3;-10,0,10;-3,0,3)/32
Scharr operator on each pyramid level and uses fixed-point bilinear weights;
we use float math (differences vs cv2 stay well under the 0.1-px parity bar).

Vectorized over points (no per-point Python loops): all point windows are
gathered as [N, win, win] stacks, the iteration is a ``lax.fori_loop``, so one
jit covers any point count with static shapes.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.filters import scharr_deriv
from ..core.pyramid import gaussian_pyramid


class LKResult(NamedTuple):
    pts: jax.Array  # [N, 2] tracked positions (x, y)
    status: jax.Array  # [N] uint8: 1 = tracked
    err: jax.Array  # [N] float32: mean abs window residual (cv2-style)


def _window_offsets(win: int) -> tuple[np.ndarray, np.ndarray]:
    r = win // 2
    oy, ox = np.mgrid[-r : win - r, -r : win - r]
    return oy.astype(np.float32), ox.astype(np.float32)


def _reflect101(idx: jax.Array, n: int) -> jax.Array:
    """BORDER_REFLECT_101 index mapping (one reflection each side, enough for
    window overhangs < n-1)."""
    idx = jnp.abs(idx)
    idx = jnp.where(idx >= n, jnp.abs(2 * (n - 1) - idx), idx)
    return jnp.clip(idx, 0, n - 1)


def _gather_windows(
    img: jax.Array, cx: jax.Array, cy: jax.Array, win: int, border: str = "reflect101"
):
    """Bilinear-sampled [N, win, win] windows of ``img [H, W]`` centered at
    float positions (cx, cy) (window top-left at center - win//2).

    ``border``: off-image taps use REFLECT_101 ("reflect101", how cv2 pads
    pyramid levels) or contribute zero ("zeros", how cv2 pads the derivative
    planes in buildOpticalFlowPyramid).
    """
    H, W = img.shape
    oy, ox = _window_offsets(win)
    x = cx[:, None, None] + ox[None]
    y = cy[:, None, None] + oy[None]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    flat = img.reshape(-1)

    flat2d = flat[:, None]

    def _rows(lin):
        # take_along_axis row-gather: the fast TPU gather form (~30x over
        # jnp.take; see CLAUDE.md perf rules)
        return jnp.take_along_axis(flat2d, lin.reshape(-1, 1), axis=0).reshape(x.shape)

    if border == "reflect101":
        def tap(iy, ix):
            iy = _reflect101(iy, H)
            ix = _reflect101(ix, W)
            return _rows(iy * W + ix)
    else:
        def tap(iy, ix):
            ok = (iy >= 0) & (iy < H) & (ix >= 0) & (ix < W)
            v = _rows(jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1))
            return jnp.where(ok, v, 0.0)

    return (
        tap(y0i, x0i) * (1 - wx) * (1 - wy)
        + tap(y0i, x0i + 1) * wx * (1 - wy)
        + tap(y0i + 1, x0i) * (1 - wx) * wy
        + tap(y0i + 1, x0i + 1) * wx * wy
    )


def _unfold_pairrows(img: jax.Array, win: int) -> jax.Array:
    """[Hp, Wp] -> [Hp*Wp, 2K] fat-row unfold (K = win + 1): row ``l``
    carries ``flat[l : l+K]`` and ``flat[l+Wp : l+Wp+K]`` — every tap a
    bilinear (win x win) window needs from image rows (y, y+1) at a column
    origin, packed so ONE row gather per (point, window-row) replaces the
    per-tap element gather (the ~11 ns/row TPU gather floor rewards fewer,
    fatter rows — same packing lesson as farneback._pack_taps and
    ops/allpairs.py; fat row = 2K floats = 176 B, inside the measured
    16-256 B flat-cost band)."""
    Hp, Wp = img.shape
    K = win + 1
    M = Hp * Wp
    flat = jnp.concatenate([img.reshape(-1),
                            jnp.zeros((Wp + K,), img.dtype)])
    cols = [flat[j : j + M] for j in range(K)]
    cols += [flat[Wp + j : Wp + j + M] for j in range(K)]
    return jnp.stack(cols, axis=1)


def _gather_windows_packed(unf: jax.Array, Hp: int, Wp: int, cx: jax.Array,
                           cy: jax.Array, win: int, P: int) -> jax.Array:
    """Bilinear [N, win, win] windows from a fat-row unfold of an image
    padded by ``P`` (border semantics are baked into the padding: reflect101
    for pyramid levels, zeros for derivative planes — exactly cv2's split).
    Taps clamp to the padded bounds; points that far off-image are dropped
    by the caller's status logic (cv2 drops them too)."""
    K = win + 1
    r = win // 2
    x = cx - r + P
    y = cy - r + P
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[:, None, None]
    wy = (y - y0)[:, None, None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, Wp - K)
    a = jnp.arange(win, dtype=jnp.int32)
    iy = jnp.clip(y0.astype(jnp.int32)[:, None] + a[None], 0, Hp - 2)
    lin = iy * Wp + x0i[:, None]  # [N, win]
    rows = jnp.take_along_axis(unf, lin.reshape(-1, 1), axis=0)
    rows = rows.reshape(cx.shape[0], win, 2, K)
    ry = rows[:, :, 0] * (1.0 - wy) + rows[:, :, 1] * wy  # [N, win, K]
    return ry[:, :, :win] * (1.0 - wx) + ry[:, :, 1:K] * wx


def _pad_reflect101(img: jax.Array, P: int) -> jax.Array:
    return jnp.pad(img, P, mode="reflect")


def _pad_zeros(img: jax.Array, P: int) -> jax.Array:
    return jnp.pad(img, P)


def _use_packed_gather() -> bool:
    # the fat-row unfold trades a one-time materialization for a ~400x
    # smaller gather row count — the right trade on TPU where the element
    # gather floor dominates; on CPU the per-tap gather is cheap and the
    # unfold is pure overhead
    return jax.default_backend() == "tpu"


@functools.partial(jax.jit, static_argnames=("win", "max_iters", "levels"))
def _pyr_lk_full(
    prev_img: jax.Array,
    next_img: jax.Array,
    pts: jax.Array,
    init: jax.Array,
    win: int,
    max_iters: int,
    eps: float,
    levels: int,
    min_eig_threshold: float,
):
    """Single-dispatch entry: pyramids + tracking in one jitted program (the
    pyramid used to be built outside, costing ~5 extra device dispatches per
    call through the axon tunnel)."""
    prev_pyr = tuple(gaussian_pyramid(prev_img, levels + 1))
    next_pyr = tuple(gaussian_pyramid(next_img, levels + 1))
    return _pyr_lk(
        prev_pyr, next_pyr, pts, init, win, max_iters, eps, levels,
        min_eig_threshold,
    )


def _pyr_lk(
    prev_pyr: tuple[jax.Array, ...],
    next_pyr: tuple[jax.Array, ...],
    pts: jax.Array,
    init: jax.Array,
    win: int,
    max_iters: int,
    eps: float,
    levels: int,
    min_eig_threshold: float,
):
    N = pts.shape[0]
    guess = init / (2.0**levels)  # guess at coarsest level, in level coords

    status = jnp.ones((N,), bool)
    err = jnp.zeros((N,), jnp.float32)
    packed = _use_packed_gather()

    for lvl in range(levels, -1, -1):
        I0 = prev_pyr[lvl]
        I1 = next_pyr[lvl]
        H, W = I0.shape
        gx, gy = scharr_deriv(I0)
        p_lvl = pts / (2.0**lvl)
        guess = guess * 2.0 if lvl != levels else guess

        cx, cy = p_lvl[:, 0], p_lvl[:, 1]
        if packed:
            # fat-row unfolds: border semantics baked into the padding
            # (reflect101 image / zeros derivatives, cv2's split); the J
            # unfold is reused by every solver iteration
            P = min(win + win // 2 + 2, min(H, W) - 1)
            Hp, Wp = H + 2 * P, W + 2 * P
            unf_T = _unfold_pairrows(_pad_reflect101(I0, P), win)
            unf_gx = _unfold_pairrows(_pad_zeros(gx, P), win)
            unf_gy = _unfold_pairrows(_pad_zeros(gy, P), win)
            unf_J = _unfold_pairrows(_pad_reflect101(I1, P), win)

            def gw(unf, qx, qy):
                return _gather_windows_packed(unf, Hp, Wp, qx, qy, win, P)

            T = gw(unf_T, cx, cy)
            Gx = gw(unf_gx, cx, cy)
            Gy = gw(unf_gy, cx, cy)
        else:
            # template windows + gradients at the (fixed) prev-frame position
            T = _gather_windows(I0, cx, cy, win, "reflect101")
            Gx = _gather_windows(gx, cx, cy, win, "zeros")
            Gy = _gather_windows(gy, cx, cy, win, "zeros")
        gxx = jnp.sum(Gx * Gx, axis=(1, 2))
        gxy = jnp.sum(Gx * Gy, axis=(1, 2))
        gyy = jnp.sum(Gy * Gy, axis=(1, 2))
        det = gxx * gyy - gxy * gxy
        # cv2 computes min-eig on fixed-point Scharr values (x32, FLT_SCALE
        # 2^-20) => its eigenvalue scale is ours/1024; match so the default
        # 1e-4 threshold filters the same points.
        min_eig = (gyy + gxx - jnp.sqrt((gxx - gyy) ** 2 + 4.0 * gxy**2)) / (
            2.0 * win * win * 1024.0
        )
        r = win // 2
        # cv2 only drops a point when its window origin is farther than a full
        # window outside the image (windows may hang off the edge; sampling
        # there uses border-replicated values, as our clamped gather does).
        inb0 = (
            (cx - r >= -win) & (cx - r < W) & (cy - r >= -win) & (cy - r < H)
        )
        solvable = (min_eig > min_eig_threshold) & (det > 1e-12)
        lvl_ok = inb0 & solvable

        def body(i, d):
            qx = cx + d[:, 0]
            qy = cy + d[:, 1]
            Jw = (gw(unf_J, qx, qy) if packed
                  else _gather_windows(I1, qx, qy, win))
            diff = Jw - T
            b1 = jnp.sum(diff * Gx, axis=(1, 2))
            b2 = jnp.sum(diff * Gy, axis=(1, 2))
            idet = jnp.where(det > 1e-12, 1.0 / det, 0.0)
            du = -(gyy * b1 - gxy * b2) * idet
            dv = -(gxx * b2 - gxy * b1) * idet
            step = jnp.stack([du, dv], axis=-1)
            # freeze points that already converged or are unsolvable
            active = (jnp.sum(step * step, axis=-1) >= eps * eps) | (i == 0)
            step = jnp.where((lvl_ok & active)[:, None], step, 0.0)
            return d + step

        d = jax.lax.fori_loop(0, max_iters, body, guess)
        # status is only decided at level 0 (cv2 semantics)
        qx, qy = cx + d[:, 0], cy + d[:, 1]
        inb1 = (qx - r >= -win) & (qx - r < W) & (qy - r >= -win) & (qy - r < H)
        if lvl == 0:
            status = status & inb0 & inb1 & solvable
            Jw = (gw(unf_J, qx, qy) if packed
                  else _gather_windows(I1, qx, qy, win))
            err = jnp.sum(jnp.abs(Jw - T), axis=(1, 2)) / (win * win)
        guess = d

    tracked = pts + guess
    return tracked, status, err


def calc_optical_flow_pyr_lk(
    prev_img: jax.Array,
    next_img: jax.Array,
    prev_pts: jax.Array,
    next_pts: jax.Array | None = None,
    win_size: tuple[int, int] = (21, 21),
    max_level: int = 3,
    criteria: tuple[int, float] = (30, 0.01),
    min_eig_threshold: float = 1e-4,
    use_initial_flow: bool = False,
) -> LKResult:
    """``cv2.calcOpticalFlowPyrLK`` parity (forward tracking).

    ``prev_pts``: [N, 2] float (x, y).  Returns tracked points, status, error.
    ``criteria`` accepts both this API's ``(count, eps)`` and cv2's 3-tuple
    ``(type, count, eps)``.  ``next_pts`` seeds the search only with
    ``use_initial_flow=True`` (cv2's OPTFLOW_USE_INITIAL_FLOW: with flags=0
    cv2 treats nextPts as an output buffer, so honoring it unconditionally
    would seed the coarsest level with garbage for cv2-style callers).
    """
    prev_img = jnp.asarray(prev_img, jnp.float32)
    next_img = jnp.asarray(next_img, jnp.float32)
    H, W = prev_img.shape
    max_level = min(
        max_level, int(np.floor(np.log2(max(min(H, W) / 32.0, 1.0))))
    )
    pts = jnp.asarray(prev_pts, jnp.float32).reshape(-1, 2)
    if next_pts is None or not use_initial_flow:
        init = jnp.zeros_like(pts)
    else:
        init = jnp.asarray(next_pts, jnp.float32).reshape(-1, 2) - pts
    if len(criteria) == 3:  # cv2 (TERM_CRITERIA_* type, count, eps)
        criteria = criteria[1:]
    if win_size[0] != win_size[1]:
        raise NotImplementedError(
            f"win_size={win_size}: only square LK windows are implemented; "
            "silently using the width would change the G matrices and "
            "off-image sampling vs cv2")
    win = int(win_size[0])
    tracked, status, err = _pyr_lk_full(
        prev_img,
        next_img,
        pts,
        init,
        win=win,
        max_iters=int(criteria[0]),
        eps=float(criteria[1]),
        levels=max_level,
        min_eig_threshold=float(min_eig_threshold),
    )
    return LKResult(tracked, status.astype(jnp.uint8), err)
