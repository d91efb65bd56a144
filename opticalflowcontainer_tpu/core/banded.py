"""Banded-compressed embedding of dense operator matrices into jit graphs.

The TPU fast paths express separable convolutions, bilinear resizes and the
Farneback pyramid/poly folds as dense [rows, cols] operator matrices consumed
by MXU matmuls (see ``core/filters.py``, ``classical/farneback.py``).  Built
with numpy at trace time, they used to enter the graph as full [N, N]
literals — at 1080p the per-level poly-direct matrices alone serialize to
hundreds of MB of HLO constants, which broke remote compiles outright
(HTTP 413 through the axon compile tunnel) and inflated every compile upload.

Every one of these operators is exactly banded: row i has a single contiguous
run of nonzeros (a convolution/interp footprint with the border fold
accumulating out-of-range taps into the edge columns).  ``as_operator``
embeds only the per-row run start and the run values — O(rows·bandwidth)
constants — and materializes the dense matrix ON DEVICE with iota compares.
The materialization is pure select/placement (no arithmetic on the values),
so the resulting matrix is BIT-IDENTICAL to the numpy original and every
downstream matmul is unchanged.  XLA either constant-folds the expansion at
compile time or hoists it out of scan loops as loop-invariant; both cost
nothing per frame.

The reference has no analogue (its CUDA kernels take scalar params); this is
infrastructure for the TPU-native matmul formulation.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

# Matrices at or below this many elements stay plain literals: the compressed
# form only pays off once the dense literal dominates the serialized HLO.
_EMBED_THRESHOLD_ELEMS = 256 * 1024
# Maximum band width for the compressed form.  The on-device expansion is a
# ``bw``-pass where-add chain over the full [R, n_cols] matrix; XLA folds or
# fuses it for narrow bands, but for the wide-band coarse-pyramid operators
# (720p k3: bw=100) the chain sometimes survives into the executed program
# as ~100 sequential full-matrix passes — measured 24.8 ms/field vs 0.025
# with a literal (1000x, round-4 stage-roofline bisect; the same pathology
# caused round-2's "+52 ms/field from the 1080p coarsest level" share-gate
# workaround).  Wide bands go literal: those matrices are small (coarse
# levels), so the HLO growth is bounded (~3-7 MB each).
_BANDED_MAX_BW = 48
# Size ceiling on the wide-band literal fallback: above this the dense
# literal itself becomes the serialized-HLO blowup (a 4096-col operator is
# ~67 MB f32 — past the axon remote-compile request limit that caused the
# round-2 HTTP-413 failures), so huge wide-band operators expand as summed
# <=_BANDED_MAX_BW-wide placement passes instead (ADVICE r4).  1080p's
# wide-band coarse operators (~1.5-7 MB) stay comfortably literal.
_WIDE_LITERAL_MAX_ELEMS = 4 * 1024 * 1024


def _compress_banded(M: np.ndarray) -> tuple[np.ndarray, np.ndarray] | None:
    """Per-row contiguous-run compression: (starts [R] int32, band [R, bw]).

    Returns None when the matrix is not usefully banded (max row span wider
    than half the columns) — callers fall back to the dense literal.
    """
    R, C = M.shape
    nz = M != 0.0
    any_nz = nz.any(axis=1)
    first = np.where(any_nz, nz.argmax(axis=1), 0)
    last = np.where(any_nz, C - 1 - nz[:, ::-1].argmax(axis=1), 0)
    span = np.where(any_nz, last - first + 1, 0)
    bw = int(span.max()) if R else 0
    if bw == 0 or bw > max(C // 2, 1):
        return None
    starts = np.minimum(first, C - bw).astype(np.int32)
    band = np.zeros((R, bw), M.dtype)
    for i in range(R):
        s = int(starts[i])
        band[i] = M[i, s : s + bw]
    return starts, band


def materialize_banded(starts: jax.Array, band: jax.Array, n_cols: int) -> jax.Array:
    """[R] run starts + [R, bw] run values -> dense [R, n_cols] (on device).

    Placement-only: each output element receives exactly one band value (runs
    are contiguous and within [start, start+bw)), so the result is
    bit-identical to the dense original the band was compressed from.
    """
    R, bw = band.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n_cols), 1)
    s = starts[:, None]
    out = jnp.zeros((R, n_cols), band.dtype)
    for t in range(bw):
        out = out + jnp.where(col == s + t, band[:, t : t + 1], 0)
    return out


def as_operator(M: np.ndarray) -> jax.Array:
    """Trace-time replacement for ``jnp.asarray(operator_matrix)``.

    Small or non-banded matrices embed as plain literals; large banded ones
    embed as their (starts, band) compression plus an on-device expansion.
    """
    M = np.asarray(M)
    if M.ndim != 2 or M.size <= _EMBED_THRESHOLD_ELEMS:
        return jnp.asarray(M)
    packed = _compress_banded(M)
    if packed is None:
        return jnp.asarray(M)
    starts, band = packed
    bw = band.shape[1]
    if bw <= _BANDED_MAX_BW:
        return materialize_banded(jnp.asarray(starts), jnp.asarray(band),
                                  M.shape[1])
    if M.size <= _WIDE_LITERAL_MAX_ELEMS:
        # r4: wide-band materialize sometimes executes its where-add chain
        # unfused (~bw full-matrix passes — the coarse-level pathology);
        # small-enough wide operators go literal instead
        return jnp.asarray(M)
    # huge wide-band operator (e.g. offline 4K stills): a dense literal
    # would re-inflate the serialized HLO past the axon remote-compile
    # request limit (the r2 HTTP-413 failure the compression exists to
    # prevent) — expand as summed <=_BANDED_MAX_BW-wide placement passes.
    # Exact: each pass places disjoint band columns, zeros add nothing.
    # Slower than a literal at runtime, but it COMPILES (ADVICE r4).
    out = None
    for off in range(0, bw, _BANDED_MAX_BW):
        chunk = np.ascontiguousarray(band[:, off : off + _BANDED_MAX_BW])
        piece = materialize_banded(jnp.asarray(starts + np.int32(off)),
                                   jnp.asarray(chunk), M.shape[1])
        out = piece if out is None else out + piece
    return out


# --------------------------------------------------- row-block split matmuls
#
# A banded [R, C] operator's matmul does R*C contraction flops but only
# R*bandwidth of them are nonzero.  Splitting the OUTPUT rows into blocks and
# trimming each block's contraction slice to the columns its band actually
# touches cuts the flops ~nsplit-fold while each block stays a plain dense
# full-width einsum — unlike the block-tridiagonal batched forms that lost in
# rounds 2/3, nothing is batched or relaid.  Measured on v5e (r4 probes):
# isolated band-13 pair at 720p C=5: dense 0.304 ms, split2 0.283, split4
# 0.258, split8 0.280; COMPOSED farneback_clip 720p T=7 interleaved:
# unsplit 2.44, split2 2.14, split4 2.25 ms/field — split2 wins composed
# (split4's extra concat seams cost more than their flops save once fused).
# "auto" = 2 on TPU, off elsewhere (the CPU path's shifted-slice formulation
# never reaches these helpers' hot use anyway); set an int or None to force.
BANDED_SPLIT: int | str | None = "auto"


def _resolve_split() -> int | None:
    if BANDED_SPLIT == "auto":
        return 2 if jax.default_backend() == "tpu" else None
    return BANDED_SPLIT


def _operator_block(Mblk: np.ndarray) -> jax.Array:
    """Embed a split block: banded-compressed whenever compressible (the
    size threshold is waived — a split's blocks must never re-inflate the
    HLO the parent's compression was protecting)."""
    packed = _compress_banded(Mblk)
    if packed is None or packed[1].shape[1] > _BANDED_MAX_BW:
        return jnp.asarray(Mblk)
    starts, band = packed
    return materialize_banded(jnp.asarray(starts), jnp.asarray(band),
                              Mblk.shape[1])


def _split_plan(M: np.ndarray, nsplit: int):
    """(o0, o1, s0, s1) per output-row block; contraction cols trimmed to the
    block's true nonzero extent."""
    R, C = M.shape
    bounds = [round(i * R / nsplit) for i in range(nsplit + 1)]
    plan = []
    for o0, o1 in zip(bounds, bounds[1:]):
        if o1 <= o0:
            continue
        cols = np.flatnonzero((M[o0:o1] != 0.0).any(axis=0))
        s0, s1 = (int(cols[0]), int(cols[-1]) + 1) if cols.size else (0, 1)
        plan.append((o0, o1, s0, s1))
    return plan


def _split_ok(M: np.ndarray) -> bool:
    ns = _resolve_split()
    if ns is None or ns <= 1:
        return False
    if M.ndim != 2 or M.size <= _EMBED_THRESHOLD_ELEMS:
        return False  # small operators: dispatch overhead beats the flops
    packed = _compress_banded(M)
    return packed is not None and packed[1].shape[1] <= _BANDED_MAX_BW


def apply_banded_v(M: np.ndarray, x: jax.Array, *,
                   precision=None) -> jax.Array:
    """``einsum('oh,...hw->...ow', M, x)`` for a trace-time numpy operator,
    output-row-block split when ``BANDED_SPLIT`` is set and M qualifies."""
    M = np.asarray(M)
    mm = functools.partial(jnp.einsum, precision=precision,
                           preferred_element_type=jnp.float32)
    if not _split_ok(M):
        return mm("oh,...hw->...ow", as_operator(M), x)
    parts = [mm("oh,...hw->...ow", _operator_block(M[o0:o1, s0:s1]),
                x[..., s0:s1, :])
             for o0, o1, s0, s1 in _split_plan(M, _resolve_split())]
    return jnp.concatenate(parts, axis=-2)


def apply_banded_h(M: np.ndarray, x: jax.Array, *,
                   precision=None) -> jax.Array:
    """``einsum('...hw,pw->...hp', x, M)`` (M's columns contract x's last
    axis), split as :func:`apply_banded_v`."""
    M = np.asarray(M)
    mm = functools.partial(jnp.einsum, precision=precision,
                           preferred_element_type=jnp.float32)
    if not _split_ok(M):
        return mm("...hw,pw->...hp", x, as_operator(M))
    parts = [mm("...hw,pw->...hp", x[..., s0:s1],
                _operator_block(M[o0:o1, s0:s1]))
             for o0, o1, s0, s1 in _split_plan(M, _resolve_split())]
    return jnp.concatenate(parts, axis=-1)
