"""Fused windowed blur + per-pixel 2x2 solve for Farneback's flow update.

The displacement solve (classical/farneback.py:_solve_flow_planes, mirroring
cv2's FarnebackUpdateFlow_Blur) blurs the 5 normal-equation planes
[B, 5, H, W] over ``winsize`` (box, or Gaussian with the
OPTFLOW_FARNEBACK_GAUSSIAN flag) and solves G d = h per pixel.  As XLA
border-folded matmuls that is 2 big einsums whose intermediates round-trip
HBM (~790 MB at 720p B=8, measured 4.0 ms).  This kernel streams each block
once: DMA a halo patch, 2*winsize shifted-slice accumulates on the VPU
(separable blur), solve, write u, v — ~240 MB of traffic.

Geometry: the input is replicate-padded by (8, 64) so every block's halo
window starts at the block's own tile-aligned origin (halo 7 <= 8 sublanes /
64 lanes); all DMA offsets are static.  Double-buffered patch DMA as in
ops/blockwarp.py.  Border semantics: replicate padding + full-window sums ==
the border-folded matrix operators (bit-close; see the parity test).

Reference: cv2 FarnebackUpdateFlow_Blur (the reference repo has no classical
path of its own; BASELINE config 1 makes cv2 the oracle).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PAD_Y, _PAD_X = 8, 64


def _kernel(m_ref, uv_ref, patch, sem, *, bh, bw, taps, nby, nbx, nb_total,
            eps):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    n = (b * nby + i) * nbx + j
    slot = jax.lax.rem(n, 2)
    ph, pw = bh + 2 * _PAD_Y, bw + 2 * _PAD_X
    r = (len(taps) - 1) // 2

    def copy_for(bb, ii, jj, sl):
        return pltpu.make_async_copy(
            m_ref.at[bb, :, pl.ds(ii * bh, ph), pl.ds(jj * bw, pw)],
            patch.at[sl], sem.at[sl],
        )

    @pl.when(n == 0)
    def _first():
        copy_for(b, i, j, slot).start()

    @pl.when(n + 1 < nb_total)
    def _next():
        nn = n + 1
        jn = jax.lax.rem(nn, nbx)
        in_ = jax.lax.rem(nn // nbx, nby)
        bn = nn // (nbx * nby)
        copy_for(bn, in_, jn, jax.lax.rem(nn, 2)).start()

    copy_for(b, i, j, slot).wait()
    p = patch[slot]  # [5, ph, pw]

    xb = jnp.zeros((5, ph, bw), jnp.float32)
    for t, wt in enumerate(taps):
        xb = xb + wt * p[:, :, _PAD_X - r + t : _PAD_X - r + t + bw]
    mb = jnp.zeros((5, bh, bw), jnp.float32)
    for t, wt in enumerate(taps):
        mb = mb + wt * xb[:, _PAD_Y - r + t : _PAD_Y - r + t + bh, :]

    g00, g01, g11, h1, h2 = mb[0], mb[1], mb[2], mb[3], mb[4]
    idet = 1.0 / (g00 * g11 - g01 * g01 + eps)
    u = (g11 * h1 - g01 * h2) * idet
    v = (g00 * h2 - g01 * h1) * idet
    uv_ref[0] = jnp.stack([u, v]).astype(uv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("winsize", "gaussian", "block",
                                             "interpret"))
def blur_solve_2x2(
    M: jax.Array,
    *,
    winsize: int,
    gaussian: bool = False,
    block: tuple[int, int] = (48, 640),
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """[B, 5, H, W] normal-equation planes -> (u, v) [B, H, W].

    Matches classical/farneback.py:_solve_flow_planes (replicate-border
    ``winsize`` blur of G00, G01, G11, h1, h2 then the regularized per-pixel
    2x2 solve).  H % block[0] == 0 and W % block[1] == 0 (pad at call site);
    winsize//2 must fit the (8, 64) halo.
    """
    B, C, H, W = M.shape
    assert C == 5, M.shape
    bh, bw = block
    assert H % bh == 0 and W % bw == 0, (H, W, block)
    assert bh % 8 == 0 and bw % 128 == 0, block
    r = winsize // 2
    assert r <= _PAD_Y and r <= _PAD_X, (winsize, _PAD_Y, _PAD_X)
    if gaussian:
        sigma = r * 0.3
        k = np.exp(-0.5 * (np.arange(-r, r + 1) / sigma) ** 2)
        k /= k.sum()
    else:
        k = np.full(winsize, 1.0 / winsize)
    taps = tuple(float(t) for t in k)

    Mp = jnp.pad(M, ((0, 0), (0, 0), (_PAD_Y, _PAD_Y), (_PAD_X, _PAD_X)),
                 mode="edge")
    nby, nbx = H // bh, W // bw
    ph, pw = bh + 2 * _PAD_Y, bw + 2 * _PAD_X
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B, nby, nbx),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, 2, bh, bw), lambda b, i, j: (b, 0, i, j)),
        scratch_shapes=[
            pltpu.VMEM((2, 5, ph, pw), M.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _kernel, bh=bh, bw=bw, taps=taps, nby=nby, nbx=nbx,
        nb_total=B * nby * nbx, eps=1e-3,
    )
    uv = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 2, H, W), jnp.float32),
        interpret=interpret,
    )(Mp)
    return uv[:, 0], uv[:, 1]
