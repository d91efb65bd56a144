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
  (sublane, lane) dims.  The kernel therefore DMAs at a tile-quantized origin
  with a patch enlarged by the quantization margin, and realigns in-VMEM:
  sublanes via a {0,1} permutation matmul (exact: bf16 operands, fp32
  accumulation), lanes via ONE dynamic lane rotate (``realign='roll'``,
  measured fastest) or a second permutation matmul (``realign='matmul'``).
- ``phases=2`` halves the lane margin by keeping a second, 64-lane-shifted
  copy of the source in HBM (patch 384 -> 256 lanes at bw=128: less DMA and
  a cheaper realign; measured 7.55 vs 10.3 ms per B=8 720p warp).
- Patch: ``(round8(bh + 2*slack + 8), round128(bw + 2*slack + 128/phases))``.
- Lane-dim 128 blocks keep every select at full VPU width; taller blocks
  amortize the 8-row sublane quantization (Farneback ships (32, 128)).

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


def _geometry(block, slack, pad, phases=1):
    """``phases`` > 1 keeps that many 64/128-lane-shifted copies of the source
    in HBM so the patch's lane-quantization margin shrinks from 127 to
    128//phases - 1 — a narrower patch means less DMA traffic and a cheaper
    realign.  phases=2 turns the (128,)-block 384-lane patch into 256."""
    bh, bw = block
    pad_y, pad_x = (pad, pad) if isinstance(pad, int) else pad
    ph = _round_up(bh + 2 * slack + 1 + 7, 8)
    pw = _round_up(bw + 2 * slack + 1 + (128 // phases - 1), 128)
    assert pad_y > slack and pad_x > slack, (pad, slack)
    return bh, bw, pad_y, pad_x, ph, pw


def _block_bases(u, v, block, slack, pad, Hp, Wp, phases=1):
    """Per-block UNQUANTIZED patch origins in padded coordinates, clipped so
    the quantized patch always fits: y0 in [0, Hp-ph+7], x0 in
    [0, Wp-pw+(128//phases-1)] (quantizing down then eats the margin because
    Hp % 8 == 0 and Wp % 128 == 0).  Returns int32 [B, H//bh, W//bw]."""
    bh, bw, pad_y, pad_x, ph, pw = _geometry(block, slack, pad, phases)
    B, H, W = u.shape
    nby, nbx = H // bh, W // bw
    ub = u.reshape(B, nby, bh, nbx, bw).mean(axis=(2, 4))
    vb = v.reshape(B, nby, bh, nbx, bw).mean(axis=(2, 4))
    bdx = jnp.round(ub).astype(jnp.int32)
    bdy = jnp.round(vb).astype(jnp.int32)
    gy = (jnp.arange(nby, dtype=jnp.int32) * bh)[None, :, None]
    gx = (jnp.arange(nbx, dtype=jnp.int32) * bw)[None, None, :]
    y0 = jnp.clip(gy + pad_y + bdy - slack, 0, Hp - ph + 7)
    x0 = jnp.clip(gx + pad_x + bdx - slack, 0, Wp - pw + (128 // phases - 1))
    return y0, x0


# 4x4 middle selection tier for span<=2 blocks (A/B flag; the 3x3 tier is
# always on).  Only affects rotation/zoom-dominant content — pure
# translation lands in tier 1, per-pixel-random in tier 0.
# Measured NEUTRAL (r5 probe, interleaved, 720p clip on 0.8 deg/frame
# rotation content: 2.100 on vs 2.102 off ms/field, identical checksums) —
# kept as free insurance for content between the 9-tap and 36-tap tiers.
FAST_TIER_SPAN2 = True


def _block_fastq(u, v, y0, x0, block, slack, pad):
    """Per-block selection-tier descriptor, packed into one int32
    [B, nby, nbx]: ``tier << 16 | qyc << 8 | qxc``.

    Computes each pixel's selection indices (qy, qx) EXACTLY as the kernel
    does (same clips, relative to the same unquantized origins) and tiers
    blocks by their index span:

    - tier 1 (span <= 1 both axes — translation/slow pan): bilinear needs
      only the 3x3 tap window starting at (qyc, qxc) = (min qy, min qx);
    - tier 2 (span <= 2 both axes — moderate rotation/zoom, slack >= 2
      only): the 4x4 window suffices, 16 FMAs vs the full 36;
    - tier 0: full (2*slack+2)^2 sweep.

    The kernel folds (qyc, qxc) into its realign offsets and sweeps only the
    tier's window; the skipped taps have exactly-zero weights, so tiered
    results are BIT-IDENTICAL to the full path (adding 0.0-weighted products
    of finite values is an exact no-op)."""
    bh, bw = block
    pad_y, pad_x = (pad, pad) if isinstance(pad, int) else pad
    B, H, W = u.shape
    nby, nbx = H // bh, W // bw

    # Cheap closed form: pixel coordinates are integers, so the kernel's
    # selection index (absent clip binding) is qx = floor(u) + ox with
    # ox = (j*bw + pad_x - x0) a per-block scalar (and symmetrically for y).
    # The prepass therefore only needs per-block min/max of floor(u)/floor(v)
    # — two cheap reduces XLA fuses with the _block_bases mean reduce — and
    # the fast flag additionally requires the whole index range inside
    # [0, 2*slack] so NO kernel clip binds (clipped pixels would break the
    # constant-offset identity; they take the full-sweep tier).
    fu = jnp.floor(u).astype(jnp.int32).reshape(B, nby, bh, nbx, bw)
    fv = jnp.floor(v).astype(jnp.int32).reshape(B, nby, bh, nbx, bw)
    fx_min, fx_max = fu.min(axis=(2, 4)), fu.max(axis=(2, 4))
    fy_min, fy_max = fv.min(axis=(2, 4)), fv.max(axis=(2, 4))
    gy = (jnp.arange(nby, dtype=jnp.int32) * bh)[None, :, None]
    gx = (jnp.arange(nbx, dtype=jnp.int32) * bw)[None, None, :]
    oy = gy + pad_y - y0
    ox = gx + pad_x - x0
    qy_min, qy_max = fy_min + oy, fy_max + oy
    qx_min, qx_max = fx_min + ox, fx_max + ox
    inb = ((qy_min >= 0) & (qy_max <= 2 * slack)
           & (qx_min >= 0) & (qx_max <= 2 * slack))
    span1 = (qy_max - qy_min <= 1) & (qx_max - qx_min <= 1)
    span2 = (qy_max - qy_min <= 2) & (qx_max - qx_min <= 2)
    tier = jnp.where(span1 & inb, 1,
                     jnp.where(span2 & inb, 2, 0)).astype(jnp.int32)
    if slack < 2 or not FAST_TIER_SPAN2:
        # full sweep is (2*slack+2)^2 = 16 at slack 1 — tier 2 saves nothing
        tier = jnp.where(tier == 2, 0, tier)
    return (tier << 16) | (jnp.clip(qy_min, 0, 2 * slack) << 8) \
        | jnp.clip(qx_min, 0, 2 * slack)


def start_prefetch_pipeline(copy_for, n, nbx, nby, nb_total):
    """Double-buffered DMA pipeline steps shared by every block kernel here
    and in ops/solve2x2: start block 0's own copy at grid step 0 and block
    n+1's copy during block n's compute (parity slot indexing) — an
    un-prefetched start+wait inside the body stalls one DMA latency per
    block (measured 4.5x on the whole 720p pipeline).  The caller waits on
    ``copy_for(b, i, j, slot)`` itself when it needs the data."""
    def _decompose(m):
        return (m // (nbx * nby), jax.lax.rem(m // nbx, nby),
                jax.lax.rem(m, nbx))

    @pl.when(n == 0)
    def _start_first():
        bb, ii, jj = _decompose(n)
        copy_for(bb, ii, jj, jax.lax.rem(n, 2)).start()

    @pl.when(n + 1 < nb_total)
    def _prefetch_next():
        bb, ii, jj = _decompose(n + 1)
        copy_for(bb, ii, jj, jax.lax.rem(n + 1, 2)).start()


def split3_bf16(p32, apply):
    """Exact f32 linear map via the 3-way bf16 mantissa split: the three
    splits sum to the f32 value exactly, so for a LINEAR ``apply`` whose
    other operand is a {0,1} matrix (bf16 operands, fp32 accumulation) the
    summed results equal applying the map to the f32 input exactly."""
    p0 = p32.astype(jnp.bfloat16)
    res1 = p32 - p0.astype(jnp.float32)
    p1 = res1.astype(jnp.bfloat16)
    p2 = (res1 - p1.astype(jnp.float32)).astype(jnp.bfloat16)
    return apply(p0) + apply(p1) + apply(p2)


def _roll_lanes(f, shift, use_pltpu):
    """Left-rotate f32 [..., L] lanes by a traced ``shift`` in [0, L).
    ``pltpu.roll`` requires a NON-NEGATIVE shift, so the left rotate is issued
    as a right rotate by L - shift — probed exact on this backend for dynamic
    shifts at L=384 f32 (the earlier dynamic-roll miscompile repro used
    negative shifts/bf16).  Interpret mode uses a doubled-array slice."""
    L = f.shape[-1]
    if use_pltpu:
        return pltpu.roll(f, jax.lax.rem(L - shift, L), f.ndim - 1)
    d = jnp.concatenate([f, f], axis=-1)
    return jax.lax.dynamic_slice_in_dim(d, shift, L, axis=f.ndim - 1)


def _warp_block_core(x0_ref, y0_ref, fq_ref, src_ref, u_ref, v_ref, patch,
                     sem, emit,
                     *, bh, bw, ph, pw, slack, pad_y, pad_x, nby, nbx,
                     nb_total, realign, interpret, phases, select="slice",
                     r1_off=0):
    """Shared kernel body: patch DMA pipeline + realign + bilinear selection.
    Calls ``emit(acc, u, v, xf, yf, il, jl, i, j)`` with the selected warp
    accumulator so epilogue variants fuse their per-pixel math and the
    out_ref write WITHOUT a second pass over VMEM/HBM.

    ``fq_ref`` carries the per-block fast-path descriptor (_block_fastq):
    blocks whose per-pixel selection indices span <= 1 in both axes fold
    (qyc, qxc) into the realign offsets and run a 9-tap selection instead of
    the full (2*slack+2)^2 sweep — bit-identical (the skipped taps have
    exactly-zero weights), ~4x less selection work on translation-dominant
    video (the reference's conveyor/camera regime, lfn3_node.py:29-31).
    The whole selection+epilogue is branched with pl.when (``emit`` runs
    inside each branch — an accumulator scratch handoff instead measured
    +20% on the full-sweep tier from the extra VMEM round-trip)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    # Double-buffered patch pipeline: grid steps run sequentially on the
    # core, so block n's compute overlaps block n+1's patch DMA (two scratch
    # slots, parity-indexed; block n's own copy was started at step n-1, or
    # at step 0 for the first block).
    n = (b * nby + i) * nbx + j
    slot = jax.lax.rem(n, 2)

    qx_unit = 128 // phases

    def copy_for(bb, ii, jj, sl):
        yy = y0_ref[bb, ii, jj]
        xx = x0_ref[bb, ii, jj]
        yq = pl.multiple_of((yy // 8) * 8, 8)
        # phase copy p holds src shifted left by p*qx_unit lanes, so the
        # 128-aligned DMA origin only misses the true origin by < qx_unit
        phx = (xx // qx_unit) % phases
        xq = pl.multiple_of(((xx - phx * qx_unit) // 128) * 128, 128)
        # r1_off: clip mode packs T frames in src; batch row b's R1 source
        # is frame b + 1 (its R0 is frame b, read by the fused epilogue)
        return pltpu.make_async_copy(
            src_ref.at[phx, bb + r1_off, :, pl.ds(yq, ph), pl.ds(xq, pw)],
            patch.at[sl], sem.at[sl],
        )

    start_prefetch_pipeline(copy_for, n, nbx, nby, nb_total)

    y0 = y0_ref[b, i, j]
    x0 = x0_ref[b, i, j]
    y0q = pl.multiple_of((y0 // 8) * 8, 8)
    # selection below only reads rows [0, win_h) and lanes [0, win_w) of the
    # realigned patch; realign only that window (rounded up to the tile)
    rh = _round_up(bh + 2 * slack + 1, 8)
    rw = _round_up(bw + 2 * slack + 1, 128)

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
    fq = fq_ref[b, i, j]
    fastv = fq >> 16
    qyc = (fq >> 8) & 255
    qxc = fq & 255

    copy_for(b, i, j, slot).wait()
    # Realign the tile-quantized patch so that p[c, r, l] = src[y0+r, x0+l]
    # (fast-path blocks fold their selection base (qyc, qxc) in, so
    # p[c, r, l] = src[y0+qyc+r, x0+qxc+l] there).
    # Sublanes: {0,1} permutation matmul (exact: bf16 operands, fp32
    # accumulation).  Lanes: one dynamic rotate ('roll') or a second
    # permutation matmul ('matmul'); bf16 has no pltpu.roll lowering, so the
    # rotate runs on the f32 result of the sublane matmul.
    p = patch[slot]
    C = p.shape[0]
    yrem = y0 - y0q + jnp.where(fastv >= 1, qyc, 0)
    xrem = (jax.lax.rem(x0, qx_unit)  # offset of x0 within its phase copy
            + jnp.where(fastv >= 1, qxc, 0))
    r_ = jax.lax.broadcasted_iota(jnp.int32, (rh, ph), 0)
    s_ = jax.lax.broadcasted_iota(jnp.int32, (rh, ph), 1)
    Ty = ((r_ + yrem) % ph == s_).astype(jnp.bfloat16)

    def permute_y(pp):  # bf16 [C, ph, pw] -> f32 [C, rh, pw], exact ({0,1} op)
        return jnp.einsum("rs,csl->crl", Ty, pp,
                          preferred_element_type=jnp.float32)

    def realign_y(pp):
        if pp.dtype == jnp.bfloat16:
            return permute_y(pp)
        # exact f32 permutation: 3-way bf16 split covers the f32 mantissa
        return split3_bf16(pp.astype(jnp.float32), permute_y)

    if realign == "none":
        # floor-probe mode (numerically WRONG unless xrem == yrem == 0):
        # skips realignment entirely to expose the DMA/selection bound.
        p = p.astype(jnp.float32)[:, :rh, :]
    elif realign == "roll":
        # Lane realign via ONE dynamic lane rotate of the f32 result of the
        # (cheap) sublane permutation matmul — replaces the dominant
        # [pw, pw] lane-permutation matmul.
        p = _roll_lanes(realign_y(p), xrem, use_pltpu=not interpret)
    else:
        m_ = jax.lax.broadcasted_iota(jnp.int32, (pw, rw), 0)
        l_ = jax.lax.broadcasted_iota(jnp.int32, (pw, rw), 1)
        Tx = (m_ == (l_ + xrem) % pw).astype(jnp.bfloat16)

        def permute_x(q):  # f32 [C, rh, pw] -> f32 [C, rh, rw]
            q = jnp.dot(q.reshape(C * rh, pw).astype(jnp.bfloat16), Tx,
                        preferred_element_type=jnp.float32)
            return q.reshape(C, rh, rw)

        if patch.dtype == jnp.bfloat16:
            p = permute_x(permute_y(p))
        else:
            # per-split composition stays exact: each bf16 split's sublane
            # permutation is exactly representable in bf16 for permute_x
            p = split3_bf16(p.astype(jnp.float32),
                            lambda q: permute_x(permute_y(q)))
    def select_taps(qy_, qx_, ntap):
        """Tap sweep over an ``ntap`` x ``ntap`` window with per-pixel
        one-hot-interpolation weights built from (qy_, qx_)."""
        wxs = [
            jnp.where(qx_ == t, 1.0 - wx, 0.0) + jnp.where(qx_ + 1 == t, wx, 0.0)
            for t in range(ntap)
        ]
        wys = [
            jnp.where(qy_ == t, 1.0 - wy, 0.0) + jnp.where(qy_ + 1 == t, wy, 0.0)
            for t in range(ntap)
        ]
        acc = jnp.zeros((C, bh, bw), jnp.float32)
        if select == "roll":
            # Lane-aligned selection: one static lane rotate per column tap
            # t, then every FMA slices at lane offset 0 (only sublane
            # offsets remain).  The 2D form below slices at lane offsets
            # 1..2*slack+1, and every non-128-aligned lane slice relayouts
            # (the solve2x2 lesson); here the rotate is paid once per t
            # instead of once per (a, t).
            for t in range(ntap):
                pt = p if t == 0 else _roll_lanes(p, t, use_pltpu=not interpret)
                s = jnp.zeros((C, bh, bw), jnp.float32)
                for a in range(ntap):
                    s = s + wys[a][None] * pt[:, a : a + bh, :bw].astype(jnp.float32)
                acc = acc + wxs[t][None] * s
        else:
            for a in range(ntap):
                for t in range(ntap):
                    w = (wys[a] * wxs[t])[None]
                    acc = acc + w * p[:, a : a + bh, t : t + bw].astype(jnp.float32)
        return acc

    if slack >= 1:
        # branched selection tiers (prepass flag): 3x3 for span<=1 blocks,
        # 4x4 for span<=2 (slack>=2 only), full sweep otherwise — all
        # bit-identical to the full sweep (skipped taps weigh exactly 0.0)
        @pl.when(fastv == 1)
        def _fast():
            emit(select_taps(qy - qyc, qx - qxc, 3),
                 u, v, xf, yf, il, jl, i, j)

        if slack >= 2:
            @pl.when(fastv == 2)
            def _mid():
                emit(select_taps(qy - qyc, qx - qxc, 4),
                     u, v, xf, yf, il, jl, i, j)

        @pl.when(fastv == 0)
        def _slow():
            emit(select_taps(qy, qx, nsel), u, v, xf, yf, il, jl, i, j)
    else:
        emit(select_taps(qy, qx, nsel), u, v, xf, yf, il, jl, i, j)


def _kernel(x0_ref, y0_ref, fq_ref, src_ref, u_ref, v_ref, out_ref, patch,
            sem, **kw):
    def emit(acc, *_):
        out_ref[0] = acc.astype(out_ref.dtype)

    _warp_block_core(x0_ref, y0_ref, fq_ref, src_ref, u_ref, v_ref,
                     patch, sem, emit, **kw)


def _kernel_farneback_update(x0_ref, y0_ref, fq_ref, src_ref, u_ref, v_ref,
                             r0_ref, out_ref, patch, sem,
                             *, img_h, img_w, ramp, **kw):
    """Fused Farneback update: warp frame-1's expansion planes AND accumulate
    the per-pixel normal equations in one pass — the warped planes never
    round-trip through HBM.  Epilogue mirrors
    classical/farneback.py:_update_matrices_planes exactly (same channel
    order bx, by, axx, ayy, qxy in; G00, G01, G11, h1, h2 out)."""
    pad_y, pad_x, bh, bw = kw["pad_y"], kw["pad_x"], kw["bh"], kw["bw"]

    def emit(acc, u, v, xf, yf, il, jl, i, j):
        R0v = r0_ref[0].astype(jnp.float32)  # [5, bh, bw]
        _farneback_epilogue(acc, u, v, xf, yf, il, jl, i, j, R0v, out_ref,
                            img_h=img_h, img_w=img_w, ramp=ramp,
                            pad_y=pad_y, pad_x=pad_x, bh=bh, bw=bw)

    _warp_block_core(x0_ref, y0_ref, fq_ref, src_ref, u_ref, v_ref, patch,
                     sem, emit, **kw)


def _kernel_farneback_update_r0src(x0_ref, y0_ref, fq_ref, src_ref, u_ref,
                                   v_ref, out_ref, patch, sem,
                                   r0_scr, r0_sem,
                                   *, img_h, img_w, ramp, **kw):
    """Fused update with R0 read STRAIGHT from the shared padded planes:
    clip/stream mode keeps every frame's expansion once (phase-stacked); the
    batch row's R0 block is DMA'd from phase copy 1 at static, tile-aligned
    offsets ((pad_y + i*bh) % 8 == 0; (pad_x - 64 + j*bw) % 128 == 0 because
    copy 1 is the 64-lane-left-shifted source) — no separate R0 array is
    ever materialized, and no XLA slice of the padded planes exists to lose
    the fusion lottery (classical/farneback.py round-2 notes)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    pad_y, pad_x, bh, bw = kw["pad_y"], kw["pad_x"], kw["bh"], kw["bw"]
    nby, nbx, nb_total = kw["nby"], kw["nbx"], kw["nb_total"]
    # R0 copies ride the same double-buffered prefetch pipeline as the
    # patches (start block n+1's copy during block n's compute) — an
    # un-prefetched start+wait inside the body stalls one DMA latency per
    # block, measured 4.5x on the whole 720p pipeline
    n = (b * nby + i) * nbx + j
    slot = jax.lax.rem(n, 2)

    def r0_copy_for(bb, ii, jj, sl):
        return pltpu.make_async_copy(
            src_ref.at[1, bb, :,
                       pl.ds(pl.multiple_of(pad_y + ii * bh, 8), bh),
                       pl.ds(pl.multiple_of(pad_x - 64 + jj * bw, 128), bw)],
            r0_scr.at[sl], r0_sem.at[sl],
        )

    start_prefetch_pipeline(r0_copy_for, n, nbx, nby, nb_total)

    def emit(acc, u, v, xf, yf, il, jl, i, j):
        r0_copy_for(b, i, j, slot).wait()
        R0v = r0_scr[slot].astype(jnp.float32)
        _farneback_epilogue(acc, u, v, xf, yf, il, jl, i, j, R0v, out_ref,
                            img_h=img_h, img_w=img_w, ramp=ramp,
                            pad_y=pad_y, pad_x=pad_x, bh=bh, bw=bw)

    _warp_block_core(x0_ref, y0_ref, fq_ref, src_ref, u_ref, v_ref, patch,
                     sem, emit, **kw)


def _farneback_epilogue(acc, u, v, xf, yf, il, jl, i, j, R0, out_ref,
                        *, img_h, img_w, ramp, pad_y, pad_x, bh, bw):
    # cv2's in-bounds test: all four taps strictly inside the REAL image
    xi = xf.astype(jnp.int32) - pad_x
    yi = yf.astype(jnp.int32) - pad_y
    inb = (xi >= 0) & (xi < img_w - 1) & (yi >= 0) & (yi < img_h - 1)
    axx = jnp.where(inb, (R0[2] + acc[2]) * 0.5, R0[2])
    ayy = jnp.where(inb, (R0[3] + acc[3]) * 0.5, R0[3])
    axy = jnp.where(inb, (R0[4] + acc[4]) * 0.25, R0[4] * 0.5)
    dbx = jnp.where(inb, (R0[0] - acc[0]) * 0.5, 0.0) + axx * u + axy * v
    dby = jnp.where(inb, (R0[1] - acc[1]) * 0.5, 0.0) + axy * u + ayy * v
    # separable border down-weight ramp, computed from the block's global
    # pixel coordinates (product form also covers overlapping edges)
    xr = jl + j * bw
    yr = il + i * bh
    wgt = jnp.ones((bh, bw), jnp.float32)
    for d, rv in enumerate(ramp):
        wgt = (wgt
               * jnp.where(xr == d, rv, 1.0)
               * jnp.where(xr == img_w - 1 - d, rv, 1.0)
               * jnp.where(yr == d, rv, 1.0)
               * jnp.where(yr == img_h - 1 - d, rv, 1.0))
    axx = axx * wgt
    ayy = ayy * wgt
    axy = axy * wgt
    dbx = dbx * wgt
    dby = dby * wgt
    out_ref[0] = jnp.stack([
        axx * axx + axy * axy,
        (axx + ayy) * axy,
        ayy * ayy + axy * axy,
        axx * dbx + axy * dby,
        axy * dbx + ayy * dby,
    ]).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block", "slack", "pad", "pad_mode", "src_padded",
                     "interpret", "compute_dtype", "realign", "phases",
                     "select"),
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
    realign: str = "roll",
    phases: int = 1,
    select: str = "slice",
) -> jax.Array:
    """Backward-warp ``src`` by (u, v) with block-patch bilinear sampling.

    src: [B, C, H, W] (or [B, C, H+2*pad_y, W+2*pad_x] with
    ``src_padded=True`` when the producer already emits padded planes);
    u, v: [B, H, W] pixel displacements (x-right, y-down).
    H % block[0] == 0, W % block[1] == 0, and the PADDED dims must satisfy
    (H + 2*pad_y) % 8 == 0, (W + 2*pad_x) % 128 == 0 (pad shapes at the call
    site).  Returns [B, C, H, W] float32.  ``compute_dtype`` casts the DMA'd
    patches (bf16 halves HBM traffic; accumulation stays fp32).
    ``phases=2`` keeps a second, 64-lane-left-shifted copy of the source in
    HBM, shrinking the patch's lane-quantization margin (and so the patch
    width, DMA traffic and realign cost) — numerically identical.
    """
    bh, bw, pad_y, pad_x, ph, pw = _geometry(block, slack, pad, phases)
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
    y0, x0 = _block_bases(u, v, block, slack, pad, Hp, Wp, phases)
    fq = _block_fastq(u, v, y0, x0, (bh, bw), slack, (pad_y, pad_x))
    cdtype = compute_dtype or src.dtype
    src = src.astype(cdtype)
    if phases == 1:
        srcs = src[None]
    else:
        assert phases == 2, phases
        # phase copy 1 = source shifted left 64 lanes (kernel never reads the
        # wrapped tail — the x0 clip keeps phase-1 patches 64 lanes short of
        # the edge)
        srcs = jnp.stack([src, jnp.roll(src, -64, axis=-1)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, nby, nbx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, bh, bw), lambda b, i, j, x0, y0, fq: (b, i, j)),
            pl.BlockSpec((1, bh, bw), lambda b, i, j, x0, y0, fq: (b, i, j)),
        ],
        out_specs=pl.BlockSpec(
            (1, C, bh, bw), lambda b, i, j, x0, y0, fq: (b, 0, i, j)
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
        realign=realign, interpret=interpret, phases=phases, select=select,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, C, H, W), jnp.float32),
        interpret=interpret,
    )(x0, y0, fq, srcs, u, v)


@functools.partial(
    jax.jit,
    static_argnames=("img_hw", "ramp", "block", "slack", "pad", "interpret",
                     "compute_dtype", "realign", "phases", "out_dtype",
                     "select", "src_prestacked", "r0_from_src", "clip_shift"),
)
def block_warp_farneback_update(
    r0: jax.Array | None,
    r1_padded: jax.Array,
    u: jax.Array,
    v: jax.Array,
    *,
    img_hw: tuple[int, int],
    ramp: tuple[float, ...] = (),
    block: tuple[int, int] = (32, 128),
    slack: int = 2,
    pad: int | tuple[int, int] = (40, 192),
    interpret: bool = False,
    compute_dtype=None,
    realign: str = "roll",
    phases: int = 2,
    out_dtype=jnp.float32,
    select: str = "slice",
    src_prestacked: bool = False,
    r0_from_src: bool = False,
    clip_shift: bool = False,
) -> jax.Array:
    """Fused Farneback iteration update: block-patch warp of frame-1's
    expansion planes + per-pixel normal-equation accumulation in ONE kernel
    pass (the warped planes never round-trip through HBM — saves ~300 MB per
    720p B=8 call vs warp-then-XLA-elementwise).

    r0: [B, 5, H, W] frame-0 expansion planes, H/W rounded up to ``block``
    (replicate-extended past ``img_hw``); r1_padded: [B, 5, H+2*pad_y,
    W+2*pad_x] frame-1 planes; u, v: [B, H, W].  Returns M = [B, 5, H, W]
    (G00, G01, G11, h1, h2), valid inside ``img_hw``.  Semantics match
    classical/farneback.py:_update_matrices_planes exactly.

    Shared-expansion variants:
    - ``src_prestacked``: ``r1_padded`` is already the phase stack
      [phases, B', 5, Hp, Wp] (emitted directly by the poly matmuls —
      classical/farneback.py:_poly_planes_direct(phases=...) — skipping the
      stack's HBM round-trip).
    - ``clip_shift``: the stack holds B+1 consecutive frames; batch row b
      warps frame b+1 (R1) against frame b (R0).
    - ``r0_from_src``: pass ``r0=None``; each block's R0 is DMA'd in-kernel
      from phase copy 1 of the stack at static tile-aligned offsets — no R0
      array is materialized and no XLA slice of the padded planes exists
      (the round-2 "R0-slice fusion lottery").  Requires ``phases == 2``,
      ``pad_y % 8 == 0`` and ``(pad_x - 64) % 128 == 0``.
    """
    bh, bw, pad_y, pad_x, ph, pw = _geometry(block, slack, pad, phases)
    if src_prestacked:
        n_ph, Bs, C, Hp, Wp = r1_padded.shape
        assert n_ph == phases, (n_ph, phases)
        B = Bs - (1 if clip_shift else 0)
        srcs = r1_padded.astype(compute_dtype) if compute_dtype else r1_padded
    else:
        assert not clip_shift and not r0_from_src
        B, C, Hp, Wp = r1_padded.shape
    H, W = Hp - 2 * pad_y, Wp - 2 * pad_x
    if r0_from_src:
        assert r0 is None
        # the kernel promises pl.multiple_of(pad_y + ii*bh, 8) and
        # pl.multiple_of(pad_x - 64 + jj*bw, 128) for ALL blocks, which
        # needs bh/bw tile-aligned too — a sweep block like (48,192) would
        # otherwise pass and silently miscompile the R0 DMA origin
        assert phases == 2 and pad_y % 8 == 0 and (pad_x - 64) % 128 == 0 \
            and bh % 8 == 0 and bw % 128 == 0, (
            "R0-from-source needs tile-aligned offsets", pad, phases, block)
    else:
        assert r0.shape == (B, C, H, W), (r0.shape, (B, C, H, W))
    assert H % bh == 0 and W % bw == 0, (H, W, block)
    assert Hp % 8 == 0 and Wp % 128 == 0, (Hp, Wp)
    assert ph <= Hp and pw <= Wp, ("image too small", (ph, pw), (Hp, Wp))
    nby, nbx = H // bh, W // bw
    y0, x0 = _block_bases(u, v, block, slack, pad, Hp, Wp, phases)
    fq = _block_fastq(u, v, y0, x0, (bh, bw), slack, (pad_y, pad_x))
    cdtype = compute_dtype or r1_padded.dtype
    if not src_prestacked:
        src = r1_padded.astype(cdtype)
        if phases == 1:
            srcs = src[None]
        else:
            assert phases == 2, phases
            srcs = jnp.stack([src, jnp.roll(src, -64, axis=-1)])

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.HBM),
        pl.BlockSpec((1, bh, bw), lambda b, i, j, x0, y0, fq: (b, i, j)),
        pl.BlockSpec((1, bh, bw), lambda b, i, j, x0, y0, fq: (b, i, j)),
    ]
    scratch = [
        pltpu.VMEM((2, C, ph, pw), cdtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    common = dict(
        img_h=img_hw[0], img_w=img_hw[1],
        ramp=tuple(float(r) for r in ramp),
        bh=bh, bw=bw, ph=ph, pw=pw,
        slack=slack, pad_y=pad_y, pad_x=pad_x,
        nby=nby, nbx=nbx, nb_total=B * nby * nbx,
        realign=realign, interpret=interpret, phases=phases, select=select,
        r1_off=1 if clip_shift else 0,
    )
    if r0_from_src:
        kernel = functools.partial(_kernel_farneback_update_r0src, **common)
        scratch += [pltpu.VMEM((2, C, bh, bw), cdtype),
                    pltpu.SemaphoreType.DMA((2,))]
        operands = (x0, y0, fq, srcs, u, v)
    else:
        kernel = functools.partial(_kernel_farneback_update, **common)
        in_specs.append(
            pl.BlockSpec((1, C, bh, bw),
                         lambda b, i, j, x0, y0, fq: (b, 0, i, j)))
        operands = (x0, y0, fq, srcs, u, v, r0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, nby, nbx),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, C, bh, bw), lambda b, i, j, x0, y0, fq: (b, 0, i, j)
        ),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, C, H, W), out_dtype),
        interpret=interpret,
    )(*operands)


def block_warp_bilinear_reference(
    src, u, v, *, block=(16, 128), slack=3, pad=(40, 192), pad_mode="edge",
    src_padded=False, phases=1,
) -> jax.Array:
    """Bit-identical lax/gather reference for the kernel's semantics
    (tests + CPU path).  After the kernel's in-VMEM realignment its selection
    is relative to the unquantized origin, so this reference needs no
    quantization (``phases`` only moves the x0 clip at the far image edge)."""
    bh, bw, pad_y, pad_x, ph, pw = _geometry(block, slack, pad, phases)
    if src_padded:
        B, C, Hp, Wp = src.shape
        H, W = Hp - 2 * pad_y, Wp - 2 * pad_x
    else:
        B, C, H, W = src.shape
        src = _pad_src(src, pad_y, pad_x, pad_mode)
        Hp, Wp = H + 2 * pad_y, W + 2 * pad_x
    y0, x0 = _block_bases(u, v, block, slack, pad, Hp, Wp, phases)
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
