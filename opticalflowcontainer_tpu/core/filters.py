"""cv2-parity image filters in pure JAX.

The classical-flow stack (Farneback, pyramidal LK) needs filters that match
OpenCV's numerics closely enough for <=0.1 px flow parity.  Border conventions:

- OpenCV ``BORDER_REFLECT_101`` == ``jnp.pad(mode="reflect")``  (default for
  GaussianBlur / Sobel / pyrDown)
- OpenCV ``BORDER_REPLICATE``   == ``jnp.pad(mode="edge")``     (used inside
  Farneback polynomial expansion)

All filters take ``[..., H, W]`` single-channel float arrays and are vmap-free:
leading dims are handled by reshaping into a batch, so a single XLA conv covers
any batch shape (keeps the MXU/VPU fed with one large op instead of many small
ones).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_BORDER_TO_PAD = {
    "reflect101": "reflect",
    "replicate": "edge",
    "constant": "constant",
    "reflect": "symmetric",
}


def _pad2d(img: jax.Array, ph: int, pw: int, border: str) -> jax.Array:
    """Pad the trailing two dims of ``img`` by (ph, pw) with an OpenCV border mode."""
    if ph == 0 and pw == 0:
        return img
    mode = _BORDER_TO_PAD[border]
    cfg = [(0, 0)] * (img.ndim - 2) + [(ph, ph), (pw, pw)]
    return jnp.pad(img, cfg, mode=mode)


def gaussian_kernel_1d(ksize: int, sigma: float) -> np.ndarray:
    """OpenCV ``getGaussianKernel`` parity (float64 path, normalized).

    When ``sigma <= 0`` OpenCV derives it from the kernel size
    (``sigma = 0.3*((ksize-1)*0.5 - 1) + 0.8``) — except for ksize <= 7 where
    it returns fixed binomial-style small kernels.
    """
    if sigma <= 0 and ksize <= 7 and ksize % 2 == 1:
        fixed = {
            1: [1.0],
            3: [0.25, 0.5, 0.25],
            5: [0.0625, 0.25, 0.375, 0.25, 0.0625],
            7: [0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125],
        }
        return np.array(fixed[ksize], np.float64)
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) * 0.5
    g = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (g / g.sum()).astype(np.float64)


from .backend import on_tpu as _on_tpu


def _corr1d(x: jax.Array, k, axis: int) -> jax.Array:
    """VALID 1-D correlation along ``axis`` as a statically-unrolled sum of
    scaled shifted slices — K fused multiply-adds, no conv op.  This is the
    fast CPU path (XLA's single-channel conv is ~20x slower there)."""
    K = len(k)
    n = x.shape[axis] - K + 1
    out = None
    for i in range(K):
        term = jax.lax.slice_in_dim(x, i, i + n, axis=axis) * float(k[i])
        out = term if out is None else out + term
    return out


@functools.lru_cache(maxsize=None)
def _toeplitz(n_out: int, k_bytes: bytes, dtype_str: str) -> np.ndarray:
    """Banded [n_out, n_out + K - 1] VALID-correlation matrix: T[i, i+t]=k[t]."""
    k = np.frombuffer(k_bytes, np.float64)
    K = len(k)
    T = np.zeros((n_out, n_out + K - 1), np.float32)
    for t in range(K):
        T[np.arange(n_out), np.arange(n_out) + t] = k[t]
    return T


def _corr1d_matmul(x: jax.Array, k, axis: int) -> jax.Array:
    """VALID 1-D correlation along ``axis`` as a dense banded-matrix matmul —
    the TPU path: unaligned lane/sublane shifts are expensive on TPU, while
    the MXU eats an [n, n+K] matmul for free (bandwidth-bound either way)."""
    K = len(k)
    n = x.shape[axis] - K + 1
    from .banded import as_operator

    T = as_operator(_toeplitz(n, np.asarray(k, np.float64).tobytes(), "f32"))
    x = jnp.moveaxis(x, axis, -1)
    out = jnp.einsum("...j,oj->...o", x, T, preferred_element_type=jnp.float32)
    return jnp.moveaxis(out, -1, axis)


def _sepconv(img: jax.Array, kx: np.ndarray, ky: np.ndarray, border: str) -> jax.Array:
    """Separable 2-D correlation over the trailing [H, W] dims (any leading
    batch dims), with an OpenCV border mode.  Dispatches to the MXU-matmul
    form on TPU and the shifted-slice form elsewhere."""
    x = img.astype(jnp.float32)
    x = _pad2d(x, len(ky) // 2, len(kx) // 2, border)
    conv = _corr1d_matmul if _on_tpu() else _corr1d
    x = conv(x, ky, x.ndim - 2)
    x = conv(x, kx, x.ndim - 1)
    return x


def gaussian_blur(
    img: jax.Array, ksize: int, sigma: float, border: str = "reflect101"
) -> jax.Array:
    """``cv2.GaussianBlur(img, (ksize, ksize), sigma)`` parity."""
    k = gaussian_kernel_1d(ksize, sigma)
    return _sepconv(img, k, k, border)


def box_filter(
    img: jax.Array, ksize: int, border: str = "reflect101", normalize: bool = True
) -> jax.Array:
    """``cv2.boxFilter`` / ``cv2.blur`` parity (square window)."""
    k = np.ones(ksize, np.float64)
    if normalize:
        k /= ksize
    return _sepconv(img, k, k, border)


def sobel(img: jax.Array, dx: int, dy: int, ksize: int = 3) -> jax.Array:
    """``cv2.Sobel`` parity for ksize=3 (derivative of Gaussian-smoothed image)."""
    assert ksize == 3, "only 3x3 sobel implemented"
    smooth = np.array([1.0, 2.0, 1.0])
    deriv = np.array([-1.0, 0.0, 1.0])
    kx = deriv if dx else smooth
    ky = deriv if dy else smooth
    return _sepconv(img, kx, ky, "reflect101")


def scharr_deriv(img: jax.Array) -> tuple[jax.Array, jax.Array]:
    """3x3 Scharr x/y derivatives scaled by 1/32 — the gradient operator the
    OpenCV LK tracker uses (``calcScharrDeriv``: smooth [3,10,3], deriv [-1,0,1],
    net weights (-3,0,3;-10,0,10;-3,0,3)/32)."""
    smooth = np.array([3.0, 10.0, 3.0]) / 32.0
    deriv = np.array([-1.0, 0.0, 1.0])
    gx = _sepconv(img, deriv, smooth, "replicate")
    gy = _sepconv(img, smooth, deriv, "replicate")
    return gx, gy


def median_filter(img: jax.Array, ksize: int) -> jax.Array:
    """``cv2.medianBlur`` parity for odd ksize (border replicate).

    Materializes the k*k neighborhood stack and sorts along it — fine for the
    k in {3,5} flow post-processing uses (lfn3_adapt_node flow median filter).
    """
    r = ksize // 2
    x = _pad2d(img, r, r, "replicate")
    H, W = img.shape[-2], img.shape[-1]
    patches = [
        jax.lax.dynamic_slice_in_dim(
            jax.lax.dynamic_slice_in_dim(x, i, H, axis=-2), j, W, axis=-1
        )
        for i in range(ksize)
        for j in range(ksize)
    ]
    stack = jnp.stack(patches, axis=-1)
    return jnp.sort(stack, axis=-1)[..., (ksize * ksize) // 2]


def bilateral_filter(
    img: jax.Array, d: int, sigma_color: float, sigma_space: float
) -> jax.Array:
    """``cv2.bilateralFilter`` equivalent (brute-force window, replicate border).

    Reference capability: optional pre-filter in the adaptive preprocessing node
    (reference lfn3_adapt_node.py:186-190). Images in [0,255] or [0,1] — sigma_color
    should match the image scale.
    """
    if d <= 0:
        d = int(round(sigma_space * 1.5)) * 2 + 1
    r = d // 2
    x = _pad2d(img, r, r, "replicate")
    H, W = img.shape[-2], img.shape[-1]
    num = jnp.zeros_like(img)
    den = jnp.zeros_like(img)
    inv_2sc = -0.5 / (sigma_color * sigma_color)
    for i in range(d):
        for j in range(d):
            di, dj = i - r, j - r
            if di * di + dj * dj > r * r:
                continue
            nb = jax.lax.dynamic_slice_in_dim(
                jax.lax.dynamic_slice_in_dim(x, i, H, axis=-2), j, W, axis=-1
            )
            w_s = np.exp((di * di + dj * dj) * (-0.5) / (sigma_space * sigma_space))
            w = w_s * jnp.exp((nb - img) ** 2 * inv_2sc)
            num = num + w * nb
            den = den + w
    return num / den


@functools.partial(jax.jit, static_argnums=(2,))
def clahe(img: jax.Array, clip_limit: float = 2.0, grid: int = 8) -> jax.Array:
    """Contrast-limited adaptive histogram equalization over [H, W] uint8-range
    float input (values 0..255), ``cv2.createCLAHE(clip, (grid, grid))`` analogue.

    Reference capability: contrast-adaptive CLAHE on the HSV value channel
    (reference lfn3_adapt_node.py:163-182).  Tile histograms -> clipped CDF LUTs
    -> bilinear LUT interpolation between tile centers.  Static shapes; H and W
    must be divisible by ``grid`` (callers resize first, as the runtime does).
    """
    H, W = img.shape[-2], img.shape[-1]
    th, tw = H // grid, W // grid
    n_bins = 256
    tiles = img.reshape(img.shape[:-2] + (grid, th, grid, tw))
    tiles = jnp.moveaxis(tiles, -2, -3)  # [..., grid, grid, th, tw]
    flat = tiles.reshape(img.shape[:-2] + (grid, grid, th * tw))
    idx = jnp.clip(flat, 0, 255).astype(jnp.int32)
    # chunked one-hot accumulation: a single materialized one-hot would be a
    # [tiles, th*tw, 256] f32 transient (~314 MB at 640x480/grid=8, per
    # frame); scanning 256-pixel chunks bounds it to ~16 MB with identical
    # numerics (one_hot(-1) rows from the tail padding are all-zero)
    chunk = 256
    npix = th * tw
    nch = -(-npix // chunk)
    pad = nch * chunk - npix
    idx_p = jnp.pad(idx, [(0, 0)] * (idx.ndim - 1) + [(0, pad)],
                    constant_values=-1)
    chunks = jnp.moveaxis(
        idx_p.reshape(idx.shape[:-1] + (nch, chunk)), -2, 0)

    def _acc(h, ch):
        return h + jax.nn.one_hot(ch, n_bins, dtype=jnp.float32).sum(axis=-2), None

    hist, _ = jax.lax.scan(
        _acc, jnp.zeros(idx.shape[:-1] + (n_bins,), jnp.float32), chunks)
    # clip histogram and redistribute the excess uniformly (standard CLAHE)
    limit = jnp.maximum(clip_limit * (th * tw) / n_bins, 1.0)
    excess = jnp.sum(jnp.maximum(hist - limit, 0.0), axis=-1, keepdims=True)
    hist = jnp.minimum(hist, limit) + excess / n_bins
    cdf = jnp.cumsum(hist, axis=-1)
    cdf = cdf / cdf[..., -1:]
    luts = cdf * 255.0  # [..., grid, grid, 256]

    # bilinear interpolation between the 4 surrounding tile LUTs, per pixel
    ys = (jnp.arange(H, dtype=jnp.float32) + 0.5) / th - 0.5
    xs = (jnp.arange(W, dtype=jnp.float32) + 0.5) / tw - 0.5
    y0 = jnp.clip(jnp.floor(ys), 0, grid - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xs), 0, grid - 1).astype(jnp.int32)
    y1 = jnp.clip(y0 + 1, 0, grid - 1)
    x1 = jnp.clip(x0 + 1, 0, grid - 1)
    wy = jnp.clip(ys - y0, 0.0, 1.0)[:, None]
    wx = jnp.clip(xs - x0, 0.0, 1.0)[None, :]

    pix = jnp.clip(img, 0, 255).astype(jnp.int32)

    def lut_at(ty, tx):
        # gather LUT value for each pixel from tile (ty[y], tx[x])
        t = luts[..., ty, :, :][..., :, tx, :]  # [..., H, W, 256]
        return jnp.take_along_axis(t, pix[..., None], axis=-1)[..., 0]

    v00 = lut_at(y0, x0)
    v01 = lut_at(y0, x1)
    v10 = lut_at(y1, x0)
    v11 = lut_at(y1, x1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy
