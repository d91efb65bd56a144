"""Dense Farneback optical flow, cv2.calcOpticalFlowFarneback-parity, pure JAX.

Algorithm (Farneback 2003, "Two-frame motion estimation based on polynomial
expansion"), with OpenCV's operating conventions so results match
``cv2.calcOpticalFlowFarneback`` to <=0.1 px mean EPE (BASELINE config 1):

1.  **Polynomial expansion**: each pixel neighborhood is approximated as
    f(p+d) ~ c + b^T d + d^T A d with a Gaussian-weighted LSQ fit over a
    (2n+1)^2 window.  Because the weights are constant, the normal-equation
    inverse is a constant 6x6 matrix and the projections reduce to six
    separable correlations of the image with {g, x*g, x^2*g} kernels.
    The special structure of the Gaussian moment matrix makes the
    (c, x^2, y^2) block's cross-coupling cofactor vanish, so
    a_xx = ig03*s0 + ig33*s_xx exactly (and symmetrically for a_yy).

2.  **Displacement update**: with expansions (A0,b0) of frame0 at p and
    (A1,b1) of frame1 sampled at p~ = p + dprior:
        A  = (A0(p) + A1(p~))/2
        db = (b0(p) - b1(p~))/2 + A @ dprior
    accumulated into per-pixel normal equations G = A^T A, h = A^T db,
    which are blurred over ``winsize`` (box, or Gaussian with the
    OPTFLOW_FARNEBACK_GAUSSIAN flag) and solved 2x2 per pixel for the *total*
    displacement.  Pixels whose warped sample falls outside the image use
    frame0's A only with db = 0; a 5-px edge ramp down-weights border pixels.

3.  **Pyramid**: levels are built by Gaussian-smoothing the *full-res* image
    with sigma = (1/scale - 1)/2 then bilinear-resizing to round(size*scale)
    — NOT a pyrDown chain (this is what cv2 does, and it matters for parity).

TPU-first design (all batch-native [..., H, W]; measured on v5e):

- Every separable linear stage (pyramid blur+resize, polynomial expansion)
  is a precomputed border-folded matrix, so each stage is bare MXU matmuls
  with no pad/transpose copies.  The blur->resize pair per pyramid level is
  ONE combined matrix per axis (exact — matrix product of the two operators),
  so level images never materialize at full resolution.
- The warp samples all four bilinear taps with ONE wide row gather
  (take_along_axis, the fast TPU gather form) from a 20-channel tap-packed
  field built once per level and reused across iterations.
- Batching is explicit indexing, not vmap (vmapped gathers lower ~3x slower).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.filters import _sepconv, gaussian_kernel_1d, _on_tpu
from ..core.banded import apply_banded_h, apply_banded_v, as_operator
from ..core.resize import resize_bilinear, _interp_matrix

OPTFLOW_USE_INITIAL_FLOW = 4
OPTFLOW_FARNEBACK_GAUSSIAN = 256

# TPU fast path: block-patch Pallas warp (ops/blockwarp.py) instead of the
# per-pixel XLA gather.  The gather is exact but runs at a measured ~11 ns/row
# floor (~95% of field time at 720p); the block warp is exact for every pixel
# whose integer displacement is within BLOCK_WARP_SLACK of its block mean.
# Set BLOCK_WARP = False to force the exact gather on TPU (e.g. for parity
# debugging).
BLOCK_WARP = True
# Hardware-swept geometry (720p 1.5-degree-rotation + 1.02-zoom stress;
# device EPE vs cv2 / ms per B=8 double-buffered warp):
#   (16,128) s1 1.52 px (FAILS the 0.1 bar);  (16,128) s2 0.056 / 12.2;
#   (16,128) s3 0.038 / 15.7;  (24,128) s2 0.059 / 10.7;
#   (32,128) s2 0.065 / 10.3;  (32,256) s2 3.09 (FAILS), s3 0.30 (FAILS).
# Full-pipeline sweep after the direct-poly rework (fields/s / rot EPE):
#   (32,128) s2 216 / 0.058;  (48,128) s2 226 / 0.078;  (48,128) s3 164 /
#   0.030 (same 64x256 patch, but 8^2 select taps are VPU-bound);
#   (64,128) s2 224 / 0.133 (FAILS).
# Taller blocks amortize the 8-row sublane DMA quantization (y-deviation from
# rotation stays small) and (48,128) divides 720 exactly (no row padding);
# wider blocks blow the x-deviation budget.  Shipped: (48,128) slack 2 —
# fastest config under the bar; pure-translation fields measure <=0.0008 px
# in every config.
# r4 kernel-only sweep (ms/field-iter at 720p, random +-1.5 px flow):
# (48,128) s2 0.311 [shipped], (48,256) s2 0.287, (96,256) s2 0.250,
# (96,128) s2 0.299, s1 0.268, s3 0.438 — the wide-block winners REMAIN
# rejected: 256-lane blocks put theta*256 ~ 6.7 px of y-deviation across
# the block at the 1.5-degree rotation bar, past any slack<=3 ((32,256) s2
# measured 3.09 px EPE in r2).  Selection is tiered instead (9-tap fast
# tier for span<=1 blocks, ops/blockwarp.py _block_fastq): kernel 0.311 ->
# 0.241 on translation content, 0.363 on random-flow content (the tier
# check + branch costs ~17% there), EPE bit-identical by construction.
BLOCK_WARP_BLOCK = (48, 128)
BLOCK_WARP_SLACK = 2
BLOCK_WARP_PAD = (40, 192)  # (pad_y, pad_x): room for the tile-aligned patch + displacement range
BLOCK_WARP_DTYPE = jnp.bfloat16  # patch DMA dtype; accumulation stays fp32
# clip/stream shared-expansion gate: frames with <= this many pixels share
# the padded planes at EVERY pyramid level; larger frames share only the
# finest level.  The r2 1080p share-all blowup (+52 ms/field from the
# coarsest level) was the wide-band banded-operator expansion pathology,
# fixed in core/banded.py (_BANDED_MAX_BW) — post-fix interleaved A/B at
# 1080p T=5 (2026-08-19): share-all 6.71/7.07 vs finest 7.09/7.40 ms/field,
# so the gate now sits above 1080p (2.07 Mpx); the finest fallback remains
# for larger frames (e.g. the 4096x1200 offline stills), untested there.
CLIP_SHARE_ALL_MAX_PIXELS = 2_200_000


def share_mode(height: int, width: int) -> str:
    """Shared-expansion mode for a frame size: "all" below the measured gate
    (every pyramid level's planes are carried/shared), "finest" above it
    (the composed all-levels program hits the coarse-level R0-slice fusion
    blowup at 1080p — see :func:`_blockwarp_flow`).  The ONE place the gate
    expression lives; runtime.fused and runtime.multistream call this."""
    return "all" if height * width <= CLIP_SHARE_ALL_MAX_PIXELS else "finest"
BLOCK_WARP_REALIGN = "roll"  # patch realign: "roll" (lane rotates) | "matmul"
# r5 composed-clip A/B (720p T=7, interleaved): roll 1.976 / matmul 2.121 /
# none (numerically wrong floor) 1.909 ms/field — realign is now only
# ~0.067 ms/field over the floor; no further headroom worth chasing here.
BLOCK_WARP_PHASES = 2  # 64-lane-shifted source copies: narrower patches
# Tap selection form inside the warp kernel ("slice" | "roll"); measured
# 720p B=8 full pipeline: slice 37.3 ms, roll 23.0 ms (update stage 10.5 vs
# 8.0).  "roll" pays one static lane rotate per column tap t and then every
# bilinear FMA slices at lane offset 0 — the 2D "slice" form's taps at lane
# offsets 1..2*slack+1 each relayout (same lesson as solve2x2).
BLOCK_WARP_SELECT = "roll"
BLOCK_WARP_FUSE = True  # fuse the normal-equation epilogue into the kernel
# Clip-mode phase-emitting poly + in-kernel R0 DMA (no R0 slice, no phase
# stack): "all" = every shared level, "finest" = k==0 only, "off" = never.
# Isolated probes (poly emission, update kernel) measure neutral, but the
# COMPOSED pipeline is an XLA fusion lottery — gated per measurement:
# interleaved 720p T=5 A/B (2026-08-18): off 3.10, finest 2.98, all 13.15
# ms/field — the coarse-level composition blows up 4x (same class as the
# round-2 1080p coarse-slice blowup); finest-only is the win.
BLOCK_WARP_R0SRC = "finest"
# Storage dtype of the poly expansion's [rows_p, W] t-intermediates (the
# vertical-pass outputs re-read by every horizontal matmul, ~100 MB/field
# f32 at 720p clip): None = f32.  bf16 MEASURED AND REJECTED (2026-08-19
# probe_r4): 0.445 vs 0.416 ms/field f32 at 720p k0 — the poly stage is
# MXU-bound (~64 TF/s), not bandwidth-bound (stage roofline), so the
# traffic cut buys nothing and the casts cost.
POLY_T_DTYPE = None
# Pallas fused blur+2x2-solve (ops/solve2x2.py): measured SLOWER than the
# XLA banded-matmul solve at 720p B=8 in both forms — v1 shifted-slice taps
# (131 vs 158 fields/s: unaligned lane slices relayout per tap) and v2
# in-kernel banded matmuls (125 vs 160.5: per-block [pw,bw] contractions
# lose to XLA's two full-width weight-stationary einsums).  Kept off; the
# XLA solve's bandwidth is cut by carrying M in bf16 instead (SOLVE_DTYPE).
SOLVE_FUSE = False
SOLVE_DTYPE = jnp.bfloat16  # M planes + blur intermediate; final math fp32
BLOCK_WARP_INTERPRET = False  # tests: run the Pallas kernel interpreted on CPU


def _bw_interpret() -> bool:
    """Pallas block-warp interpret flag at trace time: Mosaic only lowers on
    TPU, so off-TPU (bench --cpu/--smoke, any CPU caller outside the test
    suite's monkeypatch) the kernel must run interpreted."""
    return BLOCK_WARP_INTERPRET or not _on_tpu()

# Edge ramp (5 px) applied to the expansion coefficients near image borders
# before the normal equations are accumulated, so border pixels contribute
# less to the blurred G/h fields.
_BORDER_RAMP = np.array([0.14, 0.14, 0.4472, 0.4472, 0.4472], np.float32)


# --------------------------------------------------------------- operators

def _reflect101_idx(i: np.ndarray, n: int) -> np.ndarray:
    i = np.abs(i)
    i = np.where(i >= n, np.abs(2 * (n - 1) - i), i)
    return np.clip(i, 0, n - 1)


@functools.lru_cache(maxsize=None)
def _border_conv_matrix(n: int, k_bytes: bytes, border: str) -> np.ndarray:
    """[n, n] matrix of a 1-D correlation with the border mode folded in:
    out[i] = sum_t k[t] * x[map(i + t - r)]."""
    k = np.frombuffer(k_bytes, np.float64)
    r = len(k) // 2
    M = np.zeros((n, n), np.float32)
    rows = np.arange(n)
    for t, kv in enumerate(k):
        j = rows + t - r
        j = _reflect101_idx(j, n) if border == "reflect101" else np.clip(j, 0, n - 1)
        np.add.at(M, (rows, j), kv)
    return M


@functools.lru_cache(maxsize=None)
def _prep_matrices(H: int, W: int, lh: int, lw: int, smooth_sz: int, sigma: float):
    """Combined (bilinear resize) @ (reflect101 Gaussian blur) operator per
    axis — the cv2 blur-full-res-then-resize pyramid stage as ONE exact matrix
    product per axis."""
    k = gaussian_kernel_1d(smooth_sz, sigma)
    kb = np.asarray(k, np.float64).tobytes()
    Bv = _border_conv_matrix(H, kb, "reflect101")
    Bh = _border_conv_matrix(W, kb, "reflect101")
    Rv = _interp_matrix(lh, H, False)
    Rh = _interp_matrix(lw, W, False)
    return (Rv @ Bv).astype(np.float32), (Rh @ Bh).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _poly_exp_inverse(n: int, sigma: float) -> tuple[np.ndarray, ...]:
    """1-D kernels {g, x g, x^2 g} and the needed elements of the inverse
    Gaussian moment matrix for window half-size n."""
    x = np.arange(-n, n + 1, dtype=np.float64)
    g = np.exp(-(x * x) / (2.0 * sigma * sigma))
    g /= g.sum()
    xg = x * g
    xxg = x * x * g
    m2 = float((x * x * g).sum())
    m4 = float((x**4 * g).sum())
    G = np.array(
        [
            [1.0, 0, 0, m2, m2, 0],
            [0, m2, 0, 0, 0, 0],
            [0, 0, m2, 0, 0, 0],
            [m2, 0, 0, m4, m2 * m2, 0],
            [m2, 0, 0, m2 * m2, m4, 0],
            [0, 0, 0, 0, 0, m2 * m2],
        ]
    )
    invG = np.linalg.inv(G)
    return g, xg, xxg, invG[1, 1], invG[0, 3], invG[3, 3], invG[5, 5]


def _combine_poly(s0, sx, sy, sxx, syy, sxy, ig11, ig03, ig33, ig55):
    bx = ig11 * sx
    by = ig11 * sy
    axx = ig03 * s0 + ig33 * sxx
    ayy = ig03 * s0 + ig33 * syy
    qxy = ig55 * sxy
    return jnp.stack([bx, by, axx, ayy, qxy], axis=-1)


def poly_exp(img: jax.Array, n: int, sigma: float) -> jax.Array:
    """Polynomial-expansion coefficients [..., H, W, 5] =
    (bx, by, axx, ayy, qxy): local model c + bx*dx + by*dy + axx*dx^2 +
    ayy*dy^2 + qxy*dx*dy (dx right, dy down; qxy == 2*A_offdiag).
    Border: replicate."""
    g, xg, xxg, ig11, ig03, ig33, ig55 = _poly_exp_inverse(n, float(sigma))
    if _on_tpu():
        H, W = img.shape[-2], img.shape[-1]
        Vg, Vxg, Vxxg = (
            as_operator(
                _border_conv_matrix(H, np.asarray(k, np.float64).tobytes(), "replicate")
            )
            for k in (g, xg, xxg)
        )
        Hg, Hxg, Hxxg = (
            as_operator(
                _border_conv_matrix(W, np.asarray(k, np.float64).tobytes(), "replicate")
            )
            for k in (g, xg, xxg)
        )
        mm = functools.partial(jnp.einsum, precision="float32",
                               preferred_element_type=jnp.float32)
        tg = mm("oh,...hw->...ow", Vg, img)
        txg = mm("oh,...hw->...ow", Vxg, img)
        txxg = mm("oh,...hw->...ow", Vxxg, img)
        s0 = mm("...hw,pw->...hp", tg, Hg)
        sx = mm("...hw,pw->...hp", tg, Hxg)
        sxx = mm("...hw,pw->...hp", tg, Hxxg)
        sy = mm("...hw,pw->...hp", txg, Hg)
        sxy = mm("...hw,pw->...hp", txg, Hxg)
        syy = mm("...hw,pw->...hp", txxg, Hg)
    else:
        s0 = _sepconv(img, g, g, "replicate")
        sx = _sepconv(img, xg, g, "replicate")
        sy = _sepconv(img, g, xg, "replicate")
        sxx = _sepconv(img, xxg, g, "replicate")
        syy = _sepconv(img, g, xxg, "replicate")
        sxy = _sepconv(img, xg, xg, "replicate")
    return _combine_poly(s0, sx, sy, sxx, syy, sxy, ig11, ig03, ig33, ig55)


def _border_weight_vecs(H: int, W: int, ramp: np.ndarray):
    """Separable factors of the per-pixel edge down-weight (1 in interior)."""
    B = len(ramp)
    wx = np.ones(W, np.float32)
    wy = np.ones(H, np.float32)
    for i in range(min(B, W)):
        wx[i] *= ramp[i]
        wx[W - 1 - i] *= ramp[i]
    for i in range(min(B, H)):
        wy[i] *= ramp[i]
        wy[H - 1 - i] *= ramp[i]
    return wy, wx


def _border_weight(H: int, W: int, ramp: np.ndarray) -> np.ndarray:
    """Per-pixel down-weight: product of x and y edge ramps (1 in interior)."""
    wy, wx = _border_weight_vecs(H, W, ramp)
    return wy[:, None] * wx[None, :]


def _border_weight_dev(H: int, W: int, ramp: np.ndarray) -> jax.Array:
    """On-device outer-product form: embeds two length-H/W vectors instead of
    an [H, W] literal (2 MB+ per level at 1080p; see core/banded.py)."""
    wy, wx = _border_weight_vecs(H, W, ramp)
    return jnp.asarray(wy)[:, None] * jnp.asarray(wx)[None, :]


# --------------------------------------------- plane-major TPU fast path

# Precision of the poly-expansion matmuls on TPU.  Stage-profiled at 720p
# B=8 (2026-08-17): the poly/prep stage was 17 ms of the 50 ms batch — 44%,
# bigger than the warp stage — almost all of it the 6-pass `float32` MXU
# emulation.  Device-measured (720p B=8, fields/s / rotation-stress EPE vs
# cv2, bar 0.1 px): "default" (1-pass bf16) 211 / 0.0545; "high" (3-pass)
# 192 / 0.0533; old float32 staged pipeline 160 / 0.065.  The block-warp
# slack, not poly precision, dominates the error — ship "default".
POLY_PRECISION = "default"
# Frame-0 expansion planes dtype: bf16 halves the fused update kernel's R0
# stream (read once per iteration, 3x per level); device EPE unchanged
# (0.0005 px translation — f32 R0 measured 0.0010, noise-level difference).
R0_DTYPE = jnp.bfloat16

def _replicate_rows(M: np.ndarray, rows_core: int, pad: int) -> np.ndarray:
    """Extend an output-side operator matrix to emit replicate-padded (and
    rounded-up) rows: row i of the result equals row clip(i - pad, 0, H-1) of
    ``M``.  Folding the pad into the poly-expansion matrices makes the padded
    source planes for the block warp FREE (same matmul, taller matrix)."""
    idx = np.clip(np.arange(rows_core + 2 * pad) - pad, 0, M.shape[0] - 1)
    return np.ascontiguousarray(M[idx])


def _poly_planes(img: jax.Array, n: int, sigma: float,
                 pad_y: int, pad_x: int,
                 rows_out: int, cols_out: int,
                 out_dtype=None) -> jax.Array:
    """Polynomial expansion as plane-major
    [..., 5, rows_out+2*pad_y, cols_out+2*pad_x] (replicate-extended beyond
    the image; rows_out/cols_out >= H/W round the grid up to the warp block
    size).  Channel order matches poly_exp: (bx, by, axx, ayy, qxy).
    ``out_dtype`` emits the planes pre-cast (e.g. bf16 for the warp kernel's
    patch DMA — skips a separate full-resolution cast pass)."""
    g, xg, xxg, ig11, ig03, ig33, ig55 = _poly_exp_inverse(n, float(sigma))
    H, W = img.shape[-2], img.shape[-1]
    Vs = [
        as_operator(_replicate_rows(
            _border_conv_matrix(H, np.asarray(k, np.float64).tobytes(), "replicate"),
            rows_out, pad_y))
        for k in (g, xg, xxg)
    ]
    Hs = [
        as_operator(_replicate_rows(
            _border_conv_matrix(W, np.asarray(k, np.float64).tobytes(), "replicate"),
            cols_out, pad_x))
        for k in (g, xg, xxg)
    ]
    Vg, Vxg, Vxxg = Vs
    Hg, Hxg, Hxxg = Hs
    mm = functools.partial(jnp.einsum, precision="float32",
                           preferred_element_type=jnp.float32)
    tg = mm("oh,...hw->...ow", Vg, img)
    txg = mm("oh,...hw->...ow", Vxg, img)
    txxg = mm("oh,...hw->...ow", Vxxg, img)
    s0 = mm("...hw,pw->...hp", tg, Hg)
    sx = mm("...hw,pw->...hp", tg, Hxg)
    sxx = mm("...hw,pw->...hp", tg, Hxxg)
    sy = mm("...hw,pw->...hp", txg, Hg)
    sxy = mm("...hw,pw->...hp", txg, Hxg)
    syy = mm("...hw,pw->...hp", txxg, Hg)
    bx = ig11 * sx
    by = ig11 * sy
    axx = ig03 * s0 + ig33 * sxx
    ayy = ig03 * s0 + ig33 * syy
    qxy = ig55 * sxy
    R = jnp.stack([bx, by, axx, ayy, qxy], axis=-3)
    return R.astype(out_dtype) if out_dtype is not None else R


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=None)
def _poly_direct_matrices(H: int, W: int, lh: int, lw: int, smooth_sz: int,
                          prep_sigma: float, n: int, sigma: float,
                          pad_y: int, pad_x: int,
                          rows_out: int, cols_out: int):
    """Operator matrices that turn the FULL-RES image straight into the five
    plane-major expansion planes in one vertical + one horizontal matmul per
    plane, with the pyramid stage (reflect101 blur + bilinear resize to
    (lh, lw)) and the plane combination (ig* linear forms) folded in:

        plane = (V_k @ Cv) @ img @ (Ch^T @ H_k^T)^T

    Exact algebra — vertical operators commute with horizontal ones, and
    bx/axx/qxy are linear in the s-planes, so folding changes only the f32
    rounding order.  ayy needs two vertical inputs (tg, txxg), so it is
    emitted as (ig03*tg + ig33*txxg) @ Hg — the scalars are returned for the
    runtime combine.  Replaces the old prep(2 matmuls) + 6 s-plane matmuls +
    full-res combine pass: 8 matmuls (3 V + 5 H) and zero extra passes.
    """
    g, xg, xxg, ig11, ig03, ig33, ig55 = _poly_exp_inverse(n, float(sigma))
    kp = gaussian_kernel_1d(smooth_sz, prep_sigma)
    kpb = np.asarray(kp, np.float64).tobytes()
    Cv = (_interp_matrix(lh, H, False) @ _border_conv_matrix(H, kpb, "reflect101"))
    Ch = (_interp_matrix(lw, W, False) @ _border_conv_matrix(W, kpb, "reflect101"))

    def vmat(k):
        Vk = _replicate_rows(
            _border_conv_matrix(lh, np.asarray(k, np.float64).tobytes(),
                                "replicate"),
            rows_out, pad_y)
        return np.ascontiguousarray((Vk @ Cv).astype(np.float32))

    def hmat(M):
        # stored [cols_out_tot, W]: consumed as einsum("...hw,pw->...hp")
        Hk = _replicate_rows(
            _border_conv_matrix(lw, np.asarray(M, np.float64).tobytes(),
                                "replicate"),
            cols_out, pad_x)
        return np.ascontiguousarray((Hk @ Ch).astype(np.float32))

    Hg_, Hxg_, Hxxg_ = hmat(g), hmat(xg), hmat(xxg)
    hmats = (
        np.float32(ig11) * Hxg_,                       # bx  <- tg
        np.float32(ig11) * Hg_,                        # by  <- txg
        np.float32(ig03) * Hg_ + np.float32(ig33) * Hxxg_,  # axx <- tg
        Hg_,                                           # ayy <- ig03*tg+ig33*txxg
        np.float32(ig55) * Hxg_,                       # qxy <- txg
    )
    return (
        (vmat(g), vmat(xg), vmat(xxg)),
        hmats,
        (float(ig03), float(ig33)),
    )


def _shift_rows(M: np.ndarray, k: int) -> np.ndarray:
    """Rows shifted toward 0 by ``k`` with zero-fill at the tail: the
    horizontal poly operator of the warp kernel's phase-``p`` source copy
    (copy_p[..., l] = src[..., l + p*shift]; the kernel never reads the
    wrapped tail, so zero-fill — which keeps the operator banded for
    ``as_operator`` — is exact where it is read)."""
    out = np.zeros_like(M)
    if k < M.shape[0]:
        out[: M.shape[0] - k] = M[k:]
    return np.ascontiguousarray(out)


def _poly_planes_direct(img: jax.Array, mats, out_dtype=None,
                        phases: int | None = None,
                        phase_shift: int = 64) -> jax.Array:
    """[..., H, W] full-res image -> plane-major expansion planes
    [..., 5, rows_out+2*pad_y, cols_out+2*pad_x] at the pyramid level baked
    into ``mats`` (see :func:`_poly_direct_matrices`).  All matmuls run at
    ``POLY_PRECISION`` (fp32 accumulation either way).

    ``phases=p`` emits the warp kernel's lane-shifted source copies
    DIRECTLY from the horizontal matmuls (row-shifted operators), returning
    [p, ..., 5, rows, cols] — the copies never round-trip through an HBM
    stack (vs emit-then-``jnp.stack([src, roll(src)])``, which re-reads and
    re-writes every plane).  Exact: same matmul, shifted operator rows."""
    (Vg, Vxg, Vxxg), hmats, (ig03, ig33) = mats
    mv = functools.partial(apply_banded_v, precision=POLY_PRECISION)
    mh = functools.partial(apply_banded_h, precision=POLY_PRECISION)
    # t intermediates are [rows_p, W_full] arrays materialized in HBM between
    # the vertical and horizontal passes (too big to stay in VMEM); POLY_T
    # DTYPE=bf16 halves that traffic (the output planes are already bf16 on
    # the TPU path, so the added quantization is the same error class the
    # pipeline already accepts — device EPE guard covers the 0.1 px bar)
    tdt = POLY_T_DTYPE or jnp.float32
    tg = mv(Vg, img).astype(tdt)
    txg = mv(Vxg, img).astype(tdt)
    txxg = mv(Vxxg, img).astype(tdt)
    t_ayy = (ig03 * tg.astype(jnp.float32)
             + ig33 * txxg.astype(jnp.float32)).astype(tdt)
    t_in = (tg, txg, tg, t_ayy, txg)  # per-plane horizontal-matmul inputs

    def emit(hs):
        planes = [mh(Hk, t) for t, Hk in zip(t_in, hs)]
        R = jnp.stack(planes, axis=-3)
        return R.astype(out_dtype) if out_dtype is not None else R

    if phases is None:
        return emit(hmats)
    return jnp.stack([
        emit(tuple(_shift_rows(Hk, p * phase_shift) for Hk in hmats))
        for p in range(phases)
    ])


def _update_matrices_planes(R0p: jax.Array | None, R1pad: jax.Array,
                            u: jax.Array, v: jax.Array,
                            img_hw: tuple[int, int],
                            src_prestacked: bool = False,
                            r0_from_src: bool = False,
                            clip_shift: bool = False) -> jax.Array:
    """Plane-major normal equations [B, 5, H, W] using the block-patch warp
    kernel for the R1 sampling (semantics identical to _update_matrices; the
    inb/border logic is recomputed exactly here).  ``R0p`` is frame-0's
    expansion replicate-extended to the warp block grid (or None with
    ``r0_from_src`` — clip mode, R0 blocks DMA'd straight from the shared
    phase stack); ``img_hw`` is the real level size."""
    from ..ops.blockwarp import (
        block_warp_bilinear,
        block_warp_farneback_update,
    )

    H, W = img_hw
    B = u.shape[0]

    if BLOCK_WARP_FUSE:
        H16, W16 = (R1pad.shape[-2] - 2 * BLOCK_WARP_PAD[0],
                    R1pad.shape[-1] - 2 * BLOCK_WARP_PAD[1])
        up = jnp.pad(u, ((0, 0), (0, H16 - H), (0, W16 - W)), mode="edge")
        vp = jnp.pad(v, ((0, 0), (0, H16 - H), (0, W16 - W)), mode="edge")
        M = block_warp_farneback_update(
            R0p, R1pad, up, vp, img_hw=img_hw, ramp=tuple(_BORDER_RAMP),
            block=BLOCK_WARP_BLOCK, slack=BLOCK_WARP_SLACK,
            pad=BLOCK_WARP_PAD, compute_dtype=BLOCK_WARP_DTYPE,
            interpret=_bw_interpret(), realign=BLOCK_WARP_REALIGN,
            phases=BLOCK_WARP_PHASES, out_dtype=SOLVE_DTYPE,
            select=BLOCK_WARP_SELECT, src_prestacked=src_prestacked,
            r0_from_src=r0_from_src, clip_shift=clip_shift,
        )
        return M[..., :H, :W]
    assert not (src_prestacked or r0_from_src or clip_shift)
    H16, W16 = R0p.shape[-2], R0p.shape[-1]
    up = jnp.pad(u, ((0, 0), (0, H16 - H), (0, W16 - W)), mode="edge")
    vp = jnp.pad(v, ((0, 0), (0, H16 - H), (0, W16 - W)), mode="edge")

    R0 = R0p[..., :H, :W]
    R1s = block_warp_bilinear(
        R1pad, up, vp,
        block=BLOCK_WARP_BLOCK, slack=BLOCK_WARP_SLACK, pad=BLOCK_WARP_PAD,
        src_padded=True, compute_dtype=BLOCK_WARP_DTYPE,
        interpret=_bw_interpret(), realign=BLOCK_WARP_REALIGN,
        phases=BLOCK_WARP_PHASES, select=BLOCK_WARP_SELECT,
    )[..., :H, :W]

    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    fx = xs + u
    fy = ys + v
    x0i = jnp.floor(fx).astype(jnp.int32)
    y0i = jnp.floor(fy).astype(jnp.int32)
    inb = (x0i >= 0) & (x0i < W - 1) & (y0i >= 0) & (y0i < H - 1)

    axx = jnp.where(inb, (R0[:, 2] + R1s[:, 2]) * 0.5, R0[:, 2])
    ayy = jnp.where(inb, (R0[:, 3] + R1s[:, 3]) * 0.5, R0[:, 3])
    axy = jnp.where(inb, (R0[:, 4] + R1s[:, 4]) * 0.25, R0[:, 4] * 0.5)
    dbx = jnp.where(inb, (R0[:, 0] - R1s[:, 0]) * 0.5, 0.0)
    dby = jnp.where(inb, (R0[:, 1] - R1s[:, 1]) * 0.5, 0.0)
    dbx = dbx + axx * u + axy * v
    dby = dby + axy * u + ayy * v

    bw_ = _border_weight_dev(H, W, _BORDER_RAMP)
    axx = axx * bw_
    ayy = ayy * bw_
    axy = axy * bw_
    dbx = dbx * bw_
    dby = dby * bw_

    G00 = axx * axx + axy * axy
    G01 = (axx + ayy) * axy
    G11 = ayy * ayy + axy * axy
    h1 = axx * dbx + axy * dby
    h2 = axy * dbx + ayy * dby
    return jnp.stack([G00, G01, G11, h1, h2], axis=-3).astype(SOLVE_DTYPE)


def _solve_flow_planes(M: jax.Array, winsize: int, gaussian: bool):
    """[B, 5, H, W] -> (u, v) [B, H, W] (plane-major twin of _solve_flow)."""
    H, W = M.shape[-2], M.shape[-1]
    if SOLVE_FUSE and winsize // 2 <= 8:
        # Fused Pallas blur+solve streams each block once (ops/solve2x2.py);
        # the XLA form below round-trips two full-res intermediates.
        # Replicate-padding to the block grid preserves the replicate border.
        from ..ops.solve2x2 import blur_solve_2x2

        H2, W2 = _round_up(H, 48), _round_up(W, 128)
        bw_ = max(d for d in (640, 512, 384, 256, 128) if W2 % d == 0)
        Mp = M
        if (H2, W2) != (H, W):
            Mp = jnp.pad(M, ((0, 0), (0, 0), (0, H2 - H), (0, W2 - W)),
                         mode="edge")
        u, v = blur_solve_2x2(Mp, winsize=winsize, gaussian=gaussian,
                              block=(48, bw_),
                              interpret=_bw_interpret())
        return u[..., :H, :W], v[..., :H, :W]
    if gaussian:
        m = winsize // 2
        sigma = m * 0.3
        k = np.exp(-0.5 * (np.arange(-m, m + 1) / sigma) ** 2)
        k /= k.sum()
    else:
        k = np.ones(winsize, np.float64) / winsize
    kb = np.asarray(k, np.float64).tobytes()
    Bv = _border_conv_matrix(H, kb, "replicate")
    Bh = _border_conv_matrix(W, kb, "replicate")
    Mb = apply_banded_v(Bv, M)
    if M.dtype == jnp.bfloat16:
        # keep the full-res intermediate in bf16 too: the solve is
        # bandwidth-bound (~790 MB fp32 at 720p B=8) and the 2x2 solve's
        # numerator/denominator share the blur error, so flow error stays
        # ~1e-3 px (device EPE vs cv2 guards the 0.1 px bar)
        Mb = Mb.astype(jnp.bfloat16)
    Mb = apply_banded_h(Bh, Mb)
    G00, G01, G11, h1, h2 = (Mb[:, c] for c in range(5))
    idet = 1.0 / (G00 * G11 - G01 * G01 + 1e-3)
    u = (G11 * h1 - G01 * h2) * idet
    v = (G00 * h2 - G01 * h1) * idet
    return u, v


# ------------------------------------------------------------ per-iteration

def _pack_taps(R1: jax.Array) -> jax.Array:
    """[..., H, W, 5] -> [..., H, W, 20]: each pixel carries its 2x2
    neighborhood (self, right, down, down-right) so the bilinear warp needs
    only ONE row gather.  Flow-independent: build once per level, reuse
    across iterations."""
    right = jnp.concatenate([R1[..., :, 1:, :], R1[..., :, -1:, :]], axis=-2)
    down = jnp.concatenate([R1[..., 1:, :, :], R1[..., -1:, :, :]], axis=-3)
    downright = jnp.concatenate([down[..., :, 1:, :], down[..., :, -1:, :]], axis=-2)
    return jnp.concatenate([R1, right, down, downright], axis=-1)


def _update_matrices(R0: jax.Array, R1p: jax.Array, flow: jax.Array) -> jax.Array:
    """Per-pixel normal equations M = [G00, G01, G11, h1, h2] ([..., H, W, 5])
    from R0 and the tap-packed R1 (see :func:`_pack_taps`).  Batch-native."""
    H, W = R0.shape[-3], R0.shape[-2]
    batch = R0.shape[:-3]
    B = int(np.prod(batch, dtype=np.int64)) if batch else 1
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    dx = flow[..., 0]
    dy = flow[..., 1]
    fx = xs + dx
    fy = ys + dy
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    # all four taps strictly in-bounds, as cv2 requires
    inb = (x0i >= 0) & (x0i < W - 1) & (y0i >= 0) & (y0i < H - 1)
    wx = (fx - x0)[..., None]
    wy = (fy - y0)[..., None]
    xc = jnp.clip(x0i, 0, W - 2)
    yc = jnp.clip(y0i, 0, H - 2)

    lin = (yc * W + xc).reshape(B, H * W, 1)
    # On TPU the gather is the dominant cost.  Two measured properties shape
    # this code: (a) gather slows superlinearly with SOURCE size, so each
    # batch element gathers from its own [HW, 20] source instead of one
    # [B*HW, 20] source (3x/field regression otherwise); (b) bf16 taps halve
    # the traffic (the expansion coefficients tolerate it — the
    # normal-equation math stays fp32).
    src = R1p.astype(jnp.bfloat16) if _on_tpu() else R1p
    src = src.reshape(B, H * W, 20)
    g = jnp.stack(
        [jnp.take_along_axis(src[b], lin[b], axis=0) for b in range(B)]
    ).astype(jnp.float32).reshape(batch + (H, W, 4, 5))
    R1s = (
        g[..., 0, :] * (1 - wx) * (1 - wy)
        + g[..., 1, :] * wx * (1 - wy)
        + g[..., 2, :] * (1 - wx) * wy
        + g[..., 3, :] * wx * wy
    )

    # A terms: average of the two frames when the sample is valid, frame0 only
    # otherwise (with db = 0 there: no data term, pure prior propagation).
    axx = jnp.where(inb, (R0[..., 2] + R1s[..., 2]) * 0.5, R0[..., 2])
    ayy = jnp.where(inb, (R0[..., 3] + R1s[..., 3]) * 0.5, R0[..., 3])
    axy = jnp.where(inb, (R0[..., 4] + R1s[..., 4]) * 0.25, R0[..., 4] * 0.5)
    dbx = jnp.where(inb, (R0[..., 0] - R1s[..., 0]) * 0.5, 0.0)
    dby = jnp.where(inb, (R0[..., 1] - R1s[..., 1]) * 0.5, 0.0)
    dbx = dbx + axx * dx + axy * dy
    dby = dby + axy * dx + ayy * dy

    bw = _border_weight_dev(H, W, _BORDER_RAMP)
    axx = axx * bw
    ayy = ayy * bw
    axy = axy * bw
    dbx = dbx * bw
    dby = dby * bw

    G00 = axx * axx + axy * axy
    G01 = (axx + ayy) * axy
    G11 = ayy * ayy + axy * axy
    h1 = axx * dbx + axy * dby
    h2 = axy * dbx + ayy * dby
    return jnp.stack([G00, G01, G11, h1, h2], axis=-1)


def _solve_flow(M: jax.Array, winsize: int, gaussian: bool) -> jax.Array:
    """Blur the normal-equation field over winsize and solve 2x2 per pixel."""
    Mc = jnp.moveaxis(M, -1, 0)  # [5, ..., H, W]
    if gaussian:
        m = winsize // 2
        sigma = m * 0.3
        k = np.exp(-0.5 * (np.arange(-m, m + 1) / sigma) ** 2)
        k /= k.sum()
    else:
        k = np.ones(winsize, np.float64) / winsize
    if _on_tpu():
        H, W = M.shape[-3], M.shape[-2]
        kb = np.asarray(k, np.float64).tobytes()
        Mb = apply_banded_v(_border_conv_matrix(H, kb, "replicate"), Mc)
        Mb = apply_banded_h(_border_conv_matrix(W, kb, "replicate"), Mb)
    else:
        Mb = _sepconv(Mc, k, k, "replicate")
    G00, G01, G11, h1, h2 = Mb[0], Mb[1], Mb[2], Mb[3], Mb[4]
    idet = 1.0 / (G00 * G11 - G01 * G01 + 1e-3)
    u = (G11 * h1 - G01 * h2) * idet
    v = (G00 * h2 - G01 * h1) * idet
    return jnp.stack([u, v], axis=-1)


# ----------------------------------------------------------------- pyramid

def _num_levels(H: int, W: int, levels: int, pyr_scale: float) -> int:
    """cv2 clamps the pyramid depth so the coarsest level stays >= ~32 px."""
    k = 0
    scale = 1.0
    while k < levels:
        scale *= pyr_scale
        if W * scale < 32.0 or H * scale < 32.0:
            break
        k += 1
    return k


def _level_size(H: int, W: int, scale: float) -> tuple[int, int]:
    # cvRound: round-half-to-even, same as python round()
    return int(round(H * scale)), int(round(W * scale))


def _blockwarp_flow(prev_b, next_b, H, W, n_levels, pyr_scale, winsize,
                    iterations, poly_n, poly_sigma, use_gauss,
                    init_uv=None, frames_b=None):
    """Plane-major fast path: block-patch Pallas warp, no gathers, no tap
    packing, poly planes emitted pre-padded by taller matrices.  The pyramid
    blur+resize AND the plane combination are folded into the poly-expansion
    matrices (see :func:`_poly_direct_matrices`): each frame goes full-res
    image -> 5 planes in 8 matmuls, R0 replicate-extended to the warp block
    grid (values past (lh, lw) are never used), R1 emitted pre-padded +
    pre-cast for the warp kernel's patch DMA.

    Pair mode: ``prev_b``/``next_b`` are [B, H, W].  Clip mode: pass
    ``frames_b`` [T, H, W] instead — consecutive-pair flow with the expansion
    planes computed ONCE per frame; frame t's R0 role is the core slice of
    the same padded planes (exact: ``_replicate_rows`` makes padded-operator
    rows [pad, pad+rows_out) identical to the unpadded operator's rows, so
    the slice IS the pair-mode R0 placement).  cv2 re-expands both frames
    every call — on a video stream that is ~2x redundant poly work this path
    avoids (the reference's hot loop pays it per frame,
    reference lfn3_node.py:145-210 analogue)."""
    bh, bwd = BLOCK_WARP_BLOCK
    pad_y, pad_x = BLOCK_WARP_PAD
    clip = frames_b is not None
    batch_n = (frames_b.shape[0] - 1) if clip else prev_b.shape[0]
    u = v = None
    for k in range(n_levels, -1, -1):
        scale = pyr_scale**k
        lh, lw = _level_size(H, W, scale)
        sigma = (1.0 / scale - 1.0) * 0.5
        smooth_sz = max(int(round(sigma * 5)) | 1, 3)
        if u is None:
            if init_uv is not None:
                u = resize_bilinear(init_uv[0], (lh, lw)) * scale
                v = resize_bilinear(init_uv[1], (lh, lw)) * scale
            else:
                u = jnp.zeros((batch_n, lh, lw), jnp.float32)
                v = jnp.zeros((batch_n, lh, lw), jnp.float32)
        else:
            u = resize_bilinear(u, (lh, lw)) / pyr_scale
            v = resize_bilinear(v, (lh, lw)) / pyr_scale
        rows_out, cols_out = _round_up(lh, bh), _round_up(lw, bwd)
        mats1 = _poly_direct_matrices(
            H, W, lh, lw, smooth_sz, float(sigma), poly_n,
            float(poly_sigma), pad_y, pad_x, rows_out, cols_out)
        share_level = clip and (k == 0 or H * W <= CLIP_SHARE_ALL_MAX_PIXELS)
        r0src_level = (BLOCK_WARP_R0SRC == "all"
                       or (BLOCK_WARP_R0SRC == "finest" and k == 0))
        if (share_level and r0src_level and BLOCK_WARP_FUSE
                and BLOCK_WARP_PHASES == 2
                and pad_y % 8 == 0 and (pad_x - 64) % 128 == 0):
            # shared expansions, phase copies emitted straight from the poly
            # matmuls, R0 blocks DMA'd in-kernel from phase copy 1 — no
            # phase-stack round-trip and no R0 slice (the round-2 fusion
            # lottery is structurally gone: there is no slice to fuse)
            Rall2 = _poly_planes_direct(frames_b, mats1,
                                        out_dtype=BLOCK_WARP_DTYPE,
                                        phases=BLOCK_WARP_PHASES)
            for _ in range(iterations):
                M = _update_matrices_planes(None, Rall2, u, v, (lh, lw),
                                            src_prestacked=True,
                                            r0_from_src=True, clip_shift=True)
                u, v = _solve_flow_planes(M, winsize, use_gauss)
            continue
        if share_level:
            # Shared expansion: the frame's R0 role is the core slice of the
            # padded planes.  The slice's cost is an XLA fusion/layout
            # lottery (the offset-192 lane slice crosses (8,128) tiles):
            # measured per-resolution on v5e, sharing EVERY level wins at
            # <=720p (3.16 vs 3.77 ms/field) but blows up 4x at 1080p
            # (+52 ms/field from the coarsest level alone), where sharing
            # ONLY the finest level wins (10.9 vs 14.0 ms/field) — and the
            # reverse choices lose 4-6x at the other resolution.  Hence the
            # empirical area gate; an optimization_barrier (forced
            # materialization) was 7x slower at 720p, so the fast cases rely
            # on XLA fusing the slice away (A/B + level-sweep probes,
            # 2026-08-17).
            Rall = _poly_planes_direct(frames_b, mats1,
                                       out_dtype=BLOCK_WARP_DTYPE)
            R0 = jax.lax.slice(
                Rall, (0, 0, pad_y, pad_x),
                (batch_n, 5, pad_y + rows_out, pad_x + cols_out))
            R1p = Rall[1:]
            for _ in range(iterations):
                # round-2 form: the wrapper stacks the phase copies itself
                M = _update_matrices_planes(R0, R1p, u, v, (lh, lw))
                u, v = _solve_flow_planes(M, winsize, use_gauss)
            continue
        elif clip:
            # large-frame coarse levels: pair-mode expansions (duplicate
            # poly work is cheap at 2x+ downsampled sizes)
            mats0 = _poly_direct_matrices(
                H, W, lh, lw, smooth_sz, float(sigma), poly_n,
                float(poly_sigma), 0, 0, rows_out, cols_out)
            R0 = _poly_planes_direct(frames_b[:-1], mats0,
                                     out_dtype=R0_DTYPE)
            R1p = _poly_planes_direct(
                frames_b[1:], mats1, out_dtype=BLOCK_WARP_DTYPE,
                phases=BLOCK_WARP_PHASES if BLOCK_WARP_FUSE else None)
        else:
            mats0 = _poly_direct_matrices(
                H, W, lh, lw, smooth_sz, float(sigma), poly_n,
                float(poly_sigma), 0, 0, rows_out, cols_out)
            R0 = _poly_planes_direct(prev_b, mats0, out_dtype=R0_DTYPE)
            R1p = _poly_planes_direct(
                next_b, mats1, out_dtype=BLOCK_WARP_DTYPE,
                phases=BLOCK_WARP_PHASES if BLOCK_WARP_FUSE else None)
        for _ in range(iterations):
            M = _update_matrices_planes(R0, R1p, u, v, (lh, lw),
                                        src_prestacked=BLOCK_WARP_FUSE)
            u, v = _solve_flow_planes(M, winsize, use_gauss)
    return u, v


def calc_optical_flow_farneback(
    prev: jax.Array,
    next: jax.Array,
    flow: jax.Array | None = None,
    pyr_scale: float = 0.5,
    levels: int = 3,
    winsize: int = 15,
    iterations: int = 3,
    poly_n: int = 5,
    poly_sigma: float = 1.2,
    flags: int = 0,
) -> jax.Array:
    """``cv2.calcOpticalFlowFarneback`` parity.  ``prev``/``next`` are
    single-channel [..., H, W] images (uint8 range, any leading batch dims);
    returns flow [..., H, W, 2] (u = x-displacement, v = y-displacement)
    mapping prev -> next."""
    H, W = prev.shape[-2], prev.shape[-1]
    batch = prev.shape[:-2]
    prev = prev.astype(jnp.float32)
    next = next.astype(jnp.float32)
    use_gauss = bool(flags & OPTFLOW_FARNEBACK_GAUSSIAN)
    use_init = bool(flags & OPTFLOW_USE_INITIAL_FLOW) and flow is not None

    n_levels = _num_levels(H, W, levels, pyr_scale)

    if _on_tpu() and BLOCK_WARP:
        batch_n = int(np.prod(batch, dtype=np.int64)) if batch else 1
        init_uv = None
        if use_init:
            f0 = flow.reshape(batch_n, H, W, 2)
            init_uv = (f0[..., 0], f0[..., 1])
        u, v = _blockwarp_flow(
            prev.reshape(batch_n, H, W), next.reshape(batch_n, H, W),
            H, W, n_levels, pyr_scale, winsize, iterations, poly_n,
            poly_sigma, use_gauss, init_uv=init_uv)
        return jnp.stack([u, v], axis=-1).reshape(batch + (H, W, 2))

    cur_flow = None
    for k in range(n_levels, -1, -1):
        scale = pyr_scale**k
        lh, lw = _level_size(H, W, scale)
        sigma = (1.0 / scale - 1.0) * 0.5
        smooth_sz = max(int(round(sigma * 5)) | 1, 3)

        if cur_flow is None:
            if use_init:
                cur_flow = resize_bilinear(flow, (lh, lw), channel_last=True) * scale
            else:
                cur_flow = jnp.zeros(batch + (lh, lw, 2), jnp.float32)
        else:
            cur_flow = (
                resize_bilinear(cur_flow, (lh, lw), channel_last=True) / pyr_scale
            )

        if _on_tpu():
            Cv, Ch = _prep_matrices(H, W, lh, lw, smooth_sz, sigma)
            Cv = as_operator(Cv)
            Ch = as_operator(Ch)

            def prep(img):
                t = jnp.einsum("oh,...hw->...ow", Cv, img,
                               preferred_element_type=jnp.float32)
                return jnp.einsum("...hw,pw->...hp", t, Ch,
                                  preferred_element_type=jnp.float32)
        else:
            def prep(img):
                blurred = _sepconv(
                    img,
                    gaussian_kernel_1d(smooth_sz, sigma),
                    gaussian_kernel_1d(smooth_sz, sigma),
                    "reflect101",
                )
                return resize_bilinear(blurred, (lh, lw))

        R0 = poly_exp(prep(prev), poly_n, poly_sigma)
        R1 = poly_exp(prep(next), poly_n, poly_sigma)
        R1p = _pack_taps(R1)

        for _ in range(iterations):
            M = _update_matrices(R0, R1p, cur_flow)
            cur_flow = _solve_flow(M, winsize, use_gauss)
    return cur_flow


def farneback_batched(prev: jax.Array, next: jax.Array, **kwargs) -> jax.Array:
    """Batched Farneback: [B, H, W] x2 -> [B, H, W, 2].  The implementation is
    batch-native (NOT vmap — vmapped gathers lower ~3x slower on TPU), so this
    is just the documented batch entry point (BASELINE config 3); jit-wrap at
    the call site with static kwargs."""
    return calc_optical_flow_farneback(prev, next, **kwargs)


def farneback_stream_planes(gray: jax.Array, pyr_scale: float = 0.5,
                            levels: int = 3, poly_n: int = 5,
                            poly_sigma: float = 1.2, share: str = "all",
                            **_unused):
    """Per-level padded expansion planes of one frame — the device-resident
    state for :func:`farneback_stream_step`.  ``gray`` is [H, W] f32.

    ``share="all"`` (default): returns a tuple (coarsest..finest) of
    [1, 5, rows, cols] bf16 planes in the block-warp padded layout.

    ``share="finest"``: returns ``(gray [N, H, W] f32, finest planes)`` —
    the large-frame stream state.  Above ~1.5 Mpx the composed all-levels
    shared program hits the XLA R0-slice fusion blowup at the coarse levels
    (round-2 1080p finding: +52 ms/field from the coarsest level alone), so
    only the finest level — which carries most of the expansion traffic —
    is shared; the coarse levels re-expand pairwise from the stored gray."""
    H, W = gray.shape[-2], gray.shape[-1]
    n_levels = _num_levels(H, W, levels, pyr_scale)
    bh, bwd = BLOCK_WARP_BLOCK
    pad_y, pad_x = BLOCK_WARP_PAD
    lead = gray.shape[:-2] if gray.ndim > 2 else (1,)
    g = gray.reshape(lead + (H, W)).astype(jnp.float32)
    ks = (0,) if share == "finest" else tuple(range(n_levels, -1, -1))
    out = []
    for k in ks:
        scale = pyr_scale**k
        lh, lw = _level_size(H, W, scale)
        sigma = (1.0 / scale - 1.0) * 0.5
        smooth_sz = max(int(round(sigma * 5)) | 1, 3)
        mats1 = _poly_direct_matrices(
            H, W, lh, lw, smooth_sz, float(sigma), poly_n,
            float(poly_sigma), pad_y, pad_x, _round_up(lh, bh),
            _round_up(lw, bwd))
        out.append(_poly_planes_direct(g, mats1, out_dtype=BLOCK_WARP_DTYPE))
    if share == "finest":
        return (g, out[0])
    return tuple(out)


def farneback_stream_step(prev_planes, gray: jax.Array,
                          pyr_scale: float = 0.5, levels: int = 3,
                          winsize: int = 15, iterations: int = 3,
                          poly_n: int = 5, poly_sigma: float = 1.2,
                          flags: int = 0, share: str = "all"):
    """One streaming Farneback step with the previous frame's polynomial
    expansion carried as device state: ``(prev_planes, gray [H, W]) ->
    (flow [H, W, 2], planes)``; batched form ``gray [N, H, W] ->
    flow [N, H, W, 2]`` with [N, ...] plane leaves (multi-stream state).  The returned ``planes`` feed the next call,
    so each streamed frame is expanded exactly once (the pairwise entry
    re-expands the previous frame every call — cv2's per-call contract, and
    the reference hot loop's cost, reference lfn3_node.py:145-210).  State
    layout matches :func:`farneback_stream_planes` (same ``share``); frame
    t-1's R0 role is the core slice of its padded planes (exact — see
    :func:`_blockwarp_flow`).

    ``share="finest"`` (large frames, above the all-levels share gate):
    state is ``(prev_gray, finest planes)``; the coarse levels re-expand
    both frames pairwise (cheap at 2x+ downsampled sizes) and only the
    finest level — most of the expansion traffic — reuses stored planes."""
    H, W = gray.shape[-2], gray.shape[-1]
    n_levels = _num_levels(H, W, levels, pyr_scale)
    use_gauss = bool(flags & OPTFLOW_FARNEBACK_GAUSSIAN)
    bh, bwd = BLOCK_WARP_BLOCK
    pad_y, pad_x = BLOCK_WARP_PAD
    batched = gray.ndim > 2
    N = gray.shape[0] if batched else 1
    g = gray.reshape(N, H, W).astype(jnp.float32)
    finest = share == "finest"
    if finest:
        prev_gray, finest_planes = prev_planes
        prev_gray = prev_gray.reshape(N, H, W)
    new_planes = []
    u = v = None
    for i, k in enumerate(range(n_levels, -1, -1)):
        scale = pyr_scale**k
        lh, lw = _level_size(H, W, scale)
        sigma = (1.0 / scale - 1.0) * 0.5
        smooth_sz = max(int(round(sigma * 5)) | 1, 3)
        if u is None:
            u = jnp.zeros((N, lh, lw), jnp.float32)
            v = jnp.zeros((N, lh, lw), jnp.float32)
        else:
            u = resize_bilinear(u, (lh, lw)) / pyr_scale
            v = resize_bilinear(v, (lh, lw)) / pyr_scale
        rows_out, cols_out = _round_up(lh, bh), _round_up(lw, bwd)
        mats1 = _poly_direct_matrices(
            H, W, lh, lw, smooth_sz, float(sigma), poly_n,
            float(poly_sigma), pad_y, pad_x, rows_out, cols_out)
        if finest and k > 0:
            # coarse level, pair-mode: both frames expanded fresh (the
            # composed all-levels share program blows up here — see
            # farneback_stream_planes)
            mats0 = _poly_direct_matrices(
                H, W, lh, lw, smooth_sz, float(sigma), poly_n,
                float(poly_sigma), 0, 0, rows_out, cols_out)
            R0 = _poly_planes_direct(prev_gray, mats0, out_dtype=R0_DTYPE)
            R1p = _poly_planes_direct(
                g, mats1, out_dtype=BLOCK_WARP_DTYPE,
                phases=BLOCK_WARP_PHASES if BLOCK_WARP_FUSE else None)
            for _ in range(iterations):
                M = _update_matrices_planes(R0, R1p, u, v, (lh, lw),
                                            src_prestacked=BLOCK_WARP_FUSE)
                u, v = _solve_flow_planes(M, winsize, use_gauss)
            continue
        R1p = _poly_planes_direct(g, mats1, out_dtype=BLOCK_WARP_DTYPE)
        new_planes.append(R1p)
        stored = finest_planes if finest else prev_planes[i]
        R0 = jax.lax.slice(
            stored, (0, 0, pad_y, pad_x),
            (N, 5, pad_y + rows_out, pad_x + cols_out))
        for _ in range(iterations):
            M = _update_matrices_planes(R0, R1p, u, v, (lh, lw))
            u, v = _solve_flow_planes(M, winsize, use_gauss)
    flow = jnp.stack([u, v], axis=-1)
    state = (g, new_planes[0]) if finest else tuple(new_planes)
    return (flow if batched else flow[0]), state


def farneback_traffic_breakdown(H: int, W: int, levels: int = 3,
                                pyr_scale: float = 0.5, iterations: int = 3,
                                clip_frames: int | None = 5) -> dict:
    """Analytic HBM traffic per computed flow field on the TPU block-warp
    path, broken down by stage AND by pyramid level — the roofline numerator
    plus the per-stage table tools/stage_roofline.py measures against.

    Counts the arrays each stage actually moves: patch DMAs at their true
    tile-quantized patch sizes (XLA's cost analysis instead charges the
    pallas custom call its whole declared source operand), banded-matmul
    intermediates once (measured fusion behavior), the phase-copy stack and
    R0 slice materializations that feed the kernel.  Boundary effects and
    the small banded-operator literals are ignored, so treat it as a
    careful estimate (+-15%), not an exact meter.

    Returns ``{"poly": b, "update": b, "solve": b, "resize": b, "total": b,
    "levels": [{"k": k, "lh": lh, "lw": lw, "poly": b, "update_per_iter": b,
    "solve_per_iter": b, ...}, ...]}`` (bytes per FIELD; per-iteration stage
    entries are also given un-multiplied for isolated-stage probes)."""
    from ..ops.blockwarp import _geometry

    bh, bwd = BLOCK_WARP_BLOCK
    pad_y, pad_x = BLOCK_WARP_PAD
    _, _, _, _, ph, pw = _geometry(BLOCK_WARP_BLOCK, BLOCK_WARP_SLACK,
                                   BLOCK_WARP_PAD, BLOCK_WARP_PHASES)
    n_levels = _num_levels(H, W, levels, pyr_scale)
    T = clip_frames
    if T is not None and T < 2:
        # a clip needs at least 2 frames for 1 field; a falsy-zero slipping
        # through would silently model pair traffic, T=1 would divide by zero
        raise ValueError(f"clip_frames={T}: need >= 2 frames (T-1 fields)")
    share_all = T is not None and H * W <= CLIP_SHARE_ALL_MAX_PIXELS
    # expansions per field: clip mode expands each of T frames once for T-1
    # fields at shared levels; pair levels/modes expand both frames per field
    exp_per_field_shared = (T / (T - 1.0)) if T else 2.0
    f32, bf16 = 4, 2

    out = {"poly": 0.0, "update": 0.0, "solve": 0.0, "resize": 0.0,
           "levels": []}
    for k in range(n_levels, -1, -1):
        scale = pyr_scale**k
        lh, lw = _level_size(H, W, scale)
        rows_out, cols_out = _round_up(lh, bh), _round_up(lw, bwd)
        rows_p, cols_p = rows_out + 2 * pad_y, cols_out + 2 * pad_x
        core = rows_out * cols_out
        padded = rows_p * cols_p
        shared = share_all or (T is not None and k == 0)
        exp = exp_per_field_shared if shared else 2.0
        r0src = (shared and (BLOCK_WARP_R0SRC == "all"
                             or (BLOCK_WARP_R0SRC == "finest" and k == 0)))

        # poly-direct expansion (8+ banded matmuls, full-res image in):
        # 3 vertical-pass reads of the image, 3 t-intermediate writes +
        # 6 reads ([rows_p, W] in POLY_T_DTYPE), plus the warp kernel's
        # phase copies:
        # on r0src levels emitted DIRECTLY by row-shifted horizontal
        # operators (BLOCK_WARP_PHASES x 5 padded bf16 planes out, no stack
        # round-trip, and R0 blocks are DMA'd from phase copy 1 in-kernel —
        # no R0 slice materializes); other levels emit 5 planes then the
        # wrapper stacks the phase copies (1 read + PHASES writes) and clip
        # shared levels materialize the R0 core slice
        t_bytes = (jnp.dtype(POLY_T_DTYPE).itemsize
                   if POLY_T_DTYPE is not None else f32)
        poly = (3 * H * W * f32
                + 9 * rows_p * W * t_bytes
                + BLOCK_WARP_PHASES * 5 * padded * bf16)
        if not r0src:
            # emit write (5*padded) + stack read (5*padded) on top of the
            # PHASES stack writes already counted above
            poly += 2 * 5 * padded * bf16
            if shared:
                poly += 5 * core * bf16  # R0 slice materialization

        nblocks = (rows_out // bh) * (cols_out // bwd)
        patch = nblocks * 5 * ph * pw * bf16
        upd = (patch                      # patch DMAs (true overfetch)
               + 5 * core * bf16         # R0 read
               + 2 * core * f32          # u, v read
               + 5 * core * bf16)        # M write
        slv = (5 * lh * lw * bf16        # M read (core slice)
               + 2 * 5 * lh * lw * bf16  # Bv intermediate write + read
               + 2 * lh * lw * f32)      # u, v write
        rsz = 2 * 2 * lh * lw * f32  # inter-level flow resize: r+w u, v
        out["poly"] += exp * poly
        out["update"] += iterations * upd
        out["solve"] += iterations * slv
        out["resize"] += rsz
        out["levels"].append({
            "k": k, "lh": lh, "lw": lw,
            "poly": exp * poly, "poly_per_expansion": poly,
            "update_per_iter": upd, "patch_per_iter": patch,
            "solve_per_iter": slv, "resize": rsz,
        })
    out["total"] = out["poly"] + out["update"] + out["solve"] + out["resize"]
    return out


def farneback_bytes_per_field(H: int, W: int, levels: int = 3,
                              pyr_scale: float = 0.5, iterations: int = 3,
                              clip_frames: int | None = 5) -> float:
    """Total analytic HBM bytes per flow field (see
    :func:`farneback_traffic_breakdown` for the per-stage decomposition)."""
    return farneback_traffic_breakdown(
        H, W, levels=levels, pyr_scale=pyr_scale, iterations=iterations,
        clip_frames=clip_frames)["total"]


def farneback_clip(frames: jax.Array, **kwargs) -> jax.Array:
    """Dense flow over a clip: [T, H, W] -> [T-1, H, W, 2] for consecutive
    pairs, as one batched program (BASELINE config 3: batched Farneback over
    30-frame 720p clips).  On the TPU block-warp path each frame's polynomial
    expansion is computed once and shared between its next/prev roles
    (pairwise calls expand every interior frame twice)."""
    # validate up front: the clip branch reads kwargs via .get and would
    # otherwise silently ignore a typo that the pairwise fallback (which
    # forwards **kwargs to calc_optical_flow_farneback) rejects
    # 'flow' (OPTFLOW_USE_INITIAL_FLOW seed) always routes through the
    # pairwise fallback (the TPU gate below excludes that flag) but must
    # stay ACCEPTED here — it was valid before this validation existed
    supported = {"pyr_scale", "levels", "winsize", "iterations", "poly_n",
                 "poly_sigma", "flags", "flow"}
    unknown = set(kwargs) - supported
    if unknown:
        raise TypeError(
            f"farneback_clip got unexpected keyword(s) {sorted(unknown)}; "
            f"supported: {sorted(supported)}")
    if (_on_tpu() and BLOCK_WARP and frames.ndim == 3
            and frames.shape[0] >= 4
            and not (kwargs.get("flags", 0) & OPTFLOW_USE_INITIAL_FLOW)):
        # frames.shape[0] >= 4: the shared-expansion program is an XLA
        # fusion lottery per (batch, resolution) — T=5/batch-4 measures 3.07
        # vs pair 3.19 ms/field at 720p, but T=3/batch-2 measures 46 ms/field
        # (15x WORSE, reproducible interleaved); short clips take the
        # pairwise path (batch-1 streaming via farneback_stream_step is
        # separately measured good at 640x480: 2.12 ms/frame)
        T, H, W = frames.shape
        pyr_scale = kwargs.get("pyr_scale", 0.5)
        u, v = _blockwarp_flow(
            None, None, H, W,
            _num_levels(H, W, kwargs.get("levels", 3), pyr_scale),
            pyr_scale, kwargs.get("winsize", 15),
            kwargs.get("iterations", 3), kwargs.get("poly_n", 5),
            kwargs.get("poly_sigma", 1.2),
            bool(kwargs.get("flags", 0) & OPTFLOW_FARNEBACK_GAUSSIAN),
            frames_b=frames.astype(jnp.float32))
        return jnp.stack([u, v], axis=-1)
    if kwargs.get("flow") is not None and frames.ndim == 3:
        # an unbatched [H, W, 2] initial-flow seed applies to every field of
        # the clip — broadcast it to the T-1 pairwise-batched pairs (the
        # batched program needs flow shaped batch + (H, W, 2))
        f0 = jnp.asarray(kwargs["flow"])
        if f0.ndim == 3:
            kwargs = dict(kwargs, flow=jnp.broadcast_to(
                f0, (frames.shape[0] - 1,) + f0.shape))
    return farneback_batched(frames[:-1], frames[1:], **kwargs)
