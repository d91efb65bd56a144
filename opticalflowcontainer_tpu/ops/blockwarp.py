"""Block-patch bilinear warp: the TPU answer to the per-pixel gather wall.

Dense backward warp ``out[b,c,y,x] = bilinear(src[b,c], y+v, x+u)`` is the
dominant cost of Farneback (and of every coarse-to-fine flow model): XLA
lowers it to a per-pixel row gather that runs at a measured ~11 ns/row floor
on this hardware regardless of row width — ~10 ms for one 720p field, ~95% of
total field time (the warp inside cv2.calcOpticalFlowFarneback; our
exact-path implementation is classical/farneback.py:_update_matrices).

This kernel exploits the one property the gather cannot: *flow is smooth*.
Pixels are processed in (bh, bw) blocks; each block's integer displacement is
summarized by one (dy, dx) base (block mean, computed in a cheap XLA prepass
together with the patch origin, clipped per block into the padded image) and
the kernel DMAs ONE patch of source pixels per block from HBM at that dynamic
offset (PrefetchScalarGridSpec: per-block origins are scalar-prefetched so
the copy address is known before the body runs).  Each pixel then picks its
bilinear taps from the in-VMEM patch with ``(2*slack + 2)^2`` shifted-slice
select-accumulates using separable selection weights — pure VPU + DMA work,
no gather anywhere.

TPU geometry (discovered by probing Mosaic, see the round-2 notes):
- DMA slice SHAPES and OFFSETS must both be tile-aligned — (8, 128) on the
  (sublane, lane) dims.  The kernel therefore DMAs at the quantized origin
  ``(y0 & ~7, x0 & ~127)`` with a patch enlarged by one tile per axis, and
  realigns in-VMEM with dynamic rotates (``pltpu.roll`` with a traced shift),
  which makes the selection arithmetic identical to the unquantized design.
- Patch: ``(round8(bh + 2*slack + 8), round128(bw + 2*slack + 128))``.
- Blocks default to (16, 128): lane-dim 128 keeps every select at full VPU
  width; 16 rows amortize the 8-row sublane quantization.

Border handling: the source is replicate- (or zero-) padded by
``pad = (pad_y, pad_x)`` before the kernel runs and patch origins are clipped
per block, so a patch never exits the padded image and an edge clip costs
exactly the out-of-range pixels (no block poisoning).  Out-of-image taps read
replicated edge pixels; Farneback masks those pixels exactly (its ``inb``
logic is recomputed outside); model warps use ``pad_mode='zeros'`` + their
own validity masks.

Exactness: pixels whose integer displacement is within ``slack`` of their
block mean AND within the pad-limited range sample EXACTLY (bit-equal
bilinear taps).  Approximation error concentrates at motion discontinuities
sharper than ``slack`` px per block — negligible for Farneback fields, which
are pre-smoothed over ``winsize``.

`block_warp_bilinear_reference` is a lax/gather implementation with
bit-identical semantics backing the unit tests and the CPU path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_src(src, pad_y, pad_x, pad_mode):
    cfg = [(0, 0), (0, 0), (pad_y, pad_y), (pad_x, pad_x)]
    if pad_mode == "edge":
        return jnp.pad(src, cfg, mode="edge")
    return jnp.pad(src, cfg)  # zeros


def _geometry(block, slack, pad):
    bh, bw = block
    pad_y, pad_x = (pad, pad) if isinstance(pad, int) else pad
    ph = _round_up(bh + 2 * slack + 1 + 7, 8)
    pw = _round_up(bw + 2 * slack + 1 + 127, 128)
    assert pad_y > slack and pad_x > slack, (pad, slack)
    return bh, bw, pad_y, pad_x, ph, pw


def _block_bases(u, v, block, slack, pad, Hp, Wp):
    """Per-block UNQUANTIZED patch origins in padded coordinates, clipped so
    the quantized patch always fits: y0 in [0, Hp-ph+7], x0 in [0, Wp-pw+127]
    (then (y0 & ~7) + ph <= Hp etc. because Hp % 8 == 0 and Wp % 128 == 0).
    Returns int32 [B, H//bh, W//bw] (y0, x0)."""
    bh, bw, pad_y, pad_x, ph, pw = _geometry(block, slack, pad)
    B, H, W = u.shape
    nby, nbx = H // bh, W // bw
    ub = u.reshape(B, nby, bh, nbx, bw).mean(axis=(2, 4))
    vb = v.reshape(B, nby, bh, nbx, bw).mean(axis=(2, 4))
    bdx = jnp.round(ub).astype(jnp.int32)
    bdy = jnp.round(vb).astype(jnp.int32)
    gy = (jnp.arange(nby, dtype=jnp.int32) * bh)[None, :, None]
    gx = (jnp.arange(nbx, dtype=jnp.int32) * bw)[None, None, :]
    y0 = jnp.clip(gy + pad_y + bdy - slack, 0, Hp - ph + 7)
    x0 = jnp.clip(gx + pad_x + bdx - slack, 0, Wp - pw + 127)
    return y0, x0


def _kernel(x0_ref, y0_ref, src_ref, u_ref, v_ref, out_ref, patch, sem,
            *, bh, bw, ph, pw, slack, pad_y, pad_x, nby, nbx, nb_total):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    # Double-buffered patch pipeline: grid steps run sequentially on the
    # core, so block n's compute overlaps block n+1's patch DMA (two scratch
    # slots, parity-indexed; block n's own copy was started at step n-1, or
    # at step 0 for the first block).
    n = (b * nby + i) * nbx + j
    slot = jax.lax.rem(n, 2)

    def copy_for(bb, ii, jj, sl):
        yy = y0_ref[bb, ii, jj]
        xx = x0_ref[bb, ii, jj]
        yq = pl.multiple_of((yy // 8) * 8, 8)
        xq = pl.multiple_of((xx // 128) * 128, 128)
        return pltpu.make_async_copy(
            src_ref.at[bb, :, pl.ds(yq, ph), pl.ds(xq, pw)],
            patch.at[sl], sem.at[sl],
        )

    @pl.when(n == 0)
    def _start_first():
        copy_for(b, i, j, slot).start()

    @pl.when(n + 1 < nb_total)
    def _prefetch_next():
        nn = n + 1
        jn = jax.lax.rem(nn, nbx)
        in_ = jax.lax.rem(nn // nbx, nby)
        bn = nn // (nbx * nby)
        copy_for(bn, in_, jn, jax.lax.rem(nn, 2)).start()

    y0 = y0_ref[b, i, j]
    x0 = x0_ref[b, i, j]
    y0q = pl.multiple_of((y0 // 8) * 8, 8)
    x0q = pl.multiple_of((x0 // 128) * 128, 128)

    u = u_ref[0]
    v = v_ref[0]
    # tap coordinates in PADDED image space (Mosaic iota is integer-only)
    il = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0)
    jl = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1)
    gy = il.astype(jnp.float32) + (i * bh + pad_y).astype(jnp.float32)
    gx = jl.astype(jnp.float32) + (j * bw + pad_x).astype(jnp.float32)
    fx = gx + u
    fy = gy + v
    xf = jnp.floor(fx)
    yf = jnp.floor(fy)
    wx = fx - xf
    wy = fy - yf
    win_h = bh + 2 * slack + 1
    win_w = bw + 2 * slack + 1
    rx = jnp.clip(xf.astype(jnp.int32) - x0, 0, win_w - 2)
    ry = jnp.clip(yf.astype(jnp.int32) - y0, 0, win_h - 2)
    qx = jnp.clip(rx - jl, 0, 2 * slack)
    qy = jnp.clip(ry - il, 0, 2 * slack)

    nsel = 2 * slack + 2
    wxs = [
        jnp.where(qx == t, 1.0 - wx, 0.0) + jnp.where(qx + 1 == t, wx, 0.0)
        for t in range(nsel)
    ]
    wys = [
        jnp.where(qy == t, 1.0 - wy, 0.0) + jnp.where(qy + 1 == t, wy, 0.0)
        for t in range(nsel)
    ]

    copy_for(b, i, j, slot).wait()
    # Realign the tile-quantized patch so that p[c, r, l] = src[y0+r, x0+l].
    # pltpu.roll(dynamic) miscompiles on non-power-of-2 lane counts and has
    # no bf16 lowering (probed on this backend), so realignment is done as
    # permutation MATMULS on the MXU — exact: one operand is {0,1} and
    # accumulation is fp32 (HIGHEST precision covers the f32-patch case).
    p = patch[slot]
    C = p.shape[0]
    yrem = y0 - y0q
    xrem = x0 - x0q
    r_ = jax.lax.broadcasted_iota(jnp.int32, (ph, ph), 0)
    s_ = jax.lax.broadcasted_iota(jnp.int32, (ph, ph), 1)
    Ty = ((r_ + yrem) % ph == s_).astype(jnp.bfloat16)
    m_ = jax.lax.broadcasted_iota(jnp.int32, (pw, pw), 0)
    l_ = jax.lax.broadcasted_iota(jnp.int32, (pw, pw), 1)
    Tx = (m_ == (l_ + xrem) % pw).astype(jnp.bfloat16)

    def permute(pp):  # bf16 [C, ph, pw] -> f32, exact (operands are {0,1})
        q = jnp.einsum("rs,csl->crl", Ty, pp,
                       preferred_element_type=jnp.float32)
        q = jnp.dot(q.reshape(C * ph, pw).astype(jnp.bfloat16), Tx,
                    preferred_element_type=jnp.float32)
        return q.reshape(C, ph, pw)

    if patch.dtype == jnp.bfloat16:
        p = permute(p)
    else:
        # exact f32 permutation: 3-way bf16 split covers the f32 mantissa
        p32 = p.astype(jnp.float32)
        p0 = p32.astype(jnp.bfloat16)
        res1 = p32 - p0.astype(jnp.float32)
        p1 = res1.astype(jnp.bfloat16)
        p2 = (res1 - p1.astype(jnp.float32)).astype(jnp.bfloat16)
        p = permute(p0) + permute(p1) + permute(p2)
    acc = jnp.zeros((C, bh, bw), jnp.float32)
    for a in range(nsel):
        for t in range(nsel):
            w = (wys[a] * wxs[t])[None]
            acc = acc + w * p[:, a : a + bh, t : t + bw].astype(jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block", "slack", "pad", "pad_mode", "src_padded",
                     "interpret", "compute_dtype"),
)
def block_warp_bilinear(
    src: jax.Array,
    u: jax.Array,
    v: jax.Array,
    *,
    block: tuple[int, int] = (16, 128),
    slack: int = 3,
    pad: int | tuple[int, int] = (40, 192),
    pad_mode: str = "edge",
    src_padded: bool = False,
    interpret: bool = False,
    compute_dtype=None,
) -> jax.Array:
    """Backward-warp ``src`` by (u, v) with block-patch bilinear sampling.

    src: [B, C, H, W] (or [B, C, H+2*pad_y, W+2*pad_x] with
    ``src_padded=True`` when the producer already emits padded planes);
    u, v: [B, H, W] pixel displacements (x-right, y-down).
    H % block[0] == 0, W % block[1] == 0, and the PADDED dims must satisfy
    (H + 2*pad_y) % 8 == 0, (W + 2*pad_x) % 128 == 0 (pad shapes at the call
    site).  Returns [B, C, H, W] float32.  ``compute_dtype`` casts the DMA'd
    patches (bf16 halves HBM traffic; accumulation stays fp32).
    """
    bh, bw, pad_y, pad_x, ph, pw = _geometry(block, slack, pad)
    if src_padded:
        B, C, Hp, Wp = src.shape
        H, W = Hp - 2 * pad_y, Wp - 2 * pad_x
    else:
        B, C, H, W = src.shape
        src = _pad_src(src, pad_y, pad_x, pad_mode)
        Hp, Wp = H + 2 * pad_y, W + 2 * pad_x
    assert H % bh == 0 and W % bw == 0, (H, W, block)
    assert Hp % 8 == 0 and Wp % 128 == 0, (Hp, Wp)
    assert ph <= Hp and pw <= Wp, ("image too small for patch", (ph, pw), (Hp, Wp))
    # Mosaic tiling: block shapes' last two dims divisible by (8, 128) or
    # equal to the array dims.
    assert (bh % 8 == 0 or bh == H) and (bw % 128 == 0 or bw == W), (block, H, W)
    nby, nbx = H // bh, W // bw
    y0, x0 = _block_bases(u, v, block, slack, pad, Hp, Wp)
    cdtype = compute_dtype or src.dtype
    src = src.astype(cdtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, nby, nbx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, bh, bw), lambda b, i, j, x0, y0: (b, i, j)),
            pl.BlockSpec((1, bh, bw), lambda b, i, j, x0, y0: (b, i, j)),
        ],
        out_specs=pl.BlockSpec(
            (1, C, bh, bw), lambda b, i, j, x0, y0: (b, 0, i, j)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, C, ph, pw), cdtype),  # double-buffered patch slots
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _kernel, bh=bh, bw=bw, ph=ph, pw=pw,
        slack=slack, pad_y=pad_y, pad_x=pad_x,
        nby=nby, nbx=nbx, nb_total=B * nby * nbx,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, C, H, W), jnp.float32),
        interpret=interpret,
    )(x0, y0, src, u, v)


def block_warp_bilinear_reference(
    src, u, v, *, block=(16, 128), slack=3, pad=(40, 192), pad_mode="edge",
    src_padded=False,
) -> jax.Array:
    """Bit-identical lax/gather reference for the kernel's semantics
    (tests + CPU path).  After the kernel's in-VMEM realignment its selection
    is relative to the unquantized origin, so this reference needs no
    quantization."""
    bh, bw, pad_y, pad_x, ph, pw = _geometry(block, slack, pad)
    if src_padded:
        B, C, Hp, Wp = src.shape
        H, W = Hp - 2 * pad_y, Wp - 2 * pad_x
    else:
        B, C, H, W = src.shape
        src = _pad_src(src, pad_y, pad_x, pad_mode)
        Hp, Wp = H + 2 * pad_y, W + 2 * pad_x
    y0, x0 = _block_bases(u, v, block, slack, pad, Hp, Wp)
    y0p = jnp.repeat(jnp.repeat(y0, bh, axis=1), bw, axis=2)
    x0p = jnp.repeat(jnp.repeat(x0, bh, axis=1), bw, axis=2)
    gy = jnp.arange(H, dtype=jnp.float32)[None, :, None] + pad_y
    gx = jnp.arange(W, dtype=jnp.float32)[None, None, :] + pad_x
    fx = gx + u
    fy = gy + v
    xf = jnp.floor(fx)
    yf = jnp.floor(fy)
    wx = fx - xf
    wy = fy - yf
    win_h = bh + 2 * slack + 1
    win_w = bw + 2 * slack + 1
    rx = jnp.clip(xf.astype(jnp.int32) - x0p, 0, win_w - 2)
    ry = jnp.clip(yf.astype(jnp.int32) - y0p, 0, win_h - 2)
    il = jnp.arange(H, dtype=jnp.int32)[None, :, None] % bh
    jl = jnp.arange(W, dtype=jnp.int32)[None, None, :] % bw
    qx = jnp.clip(rx - jl, 0, 2 * slack)
    qy = jnp.clip(ry - il, 0, 2 * slack)
    tx = x0p + jl + qx
    ty = y0p + il + qy
    lin = (ty * Wp + tx)[:, None].astype(jnp.int32)
    flat = src.reshape(src.shape[0], src.shape[1], Hp * Wp)
    B, C = flat.shape[:2]

    def tap(dy, dx):
        idx = (lin + dy * Wp + dx).reshape(B, 1, H * W)
        idx = jnp.broadcast_to(idx, (B, C, H * W))
        return jnp.take_along_axis(flat, idx, axis=2).reshape(B, C, H, W)

    t00, t01 = tap(0, 0), tap(0, 1)
    t10, t11 = tap(1, 0), tap(1, 1)
    wxc = wx[:, None]
    wyc = wy[:, None]
    return (
        t00 * (1 - wxc) * (1 - wyc)
        + t01 * wxc * (1 - wyc)
        + t10 * (1 - wxc) * wyc
        + t11 * wxc * wyc
    ).astype(jnp.float32)
