"""Banded-compressed operator embedding (core/banded.py).

These operators drive the TPU matmul formulation of blurs/resizes/poly
expansion; the compression must be BIT-exact or every parity bar in the
suite silently drifts.  (The remote-compile motivation: at 1080p the dense
literals serialized to hundreds of MB of HLO and broke compiles with
HTTP 413 — see the module docstring.)
"""
import numpy as np
import jax.numpy as jnp

from opticalflowcontainer_tpu.core.banded import (
    _compress_banded,
    as_operator,
    materialize_banded,
)
from opticalflowcontainer_tpu.classical.farneback import (
    _border_conv_matrix,
    _poly_direct_matrices,
)
from opticalflowcontainer_tpu.core.resize import _interp_matrix


def _roundtrip(M):
    M = np.asarray(M, np.float32)
    packed = _compress_banded(M)
    assert packed is not None
    starts, band = packed
    dense = np.asarray(
        materialize_banded(jnp.asarray(starts), jnp.asarray(band), M.shape[1])
    )
    np.testing.assert_array_equal(dense, M)
    return band.shape[1]


def test_blur_and_interp_matrices_roundtrip_bit_exact():
    k = (np.ones(15, np.float64) / 15).tobytes()
    assert _roundtrip(_border_conv_matrix(512, k, "replicate")) == 15
    assert _roundtrip(_border_conv_matrix(384, k, "reflect101")) == 15
    assert _roundtrip(_interp_matrix(192, 384, False)) == 2
    assert _roundtrip(_interp_matrix(384, 192, False)) == 2


def test_poly_direct_matrices_roundtrip_bit_exact():
    # level-2 fold (interp stride 4 widens the band): every V and H operator
    (Vs, Hs, _) = _poly_direct_matrices(
        480, 640, 120, 160, 3, 0.0, 5, 1.2, 8, 130, 144, 256
    )
    for M in (*Vs, *Hs):
        assert _roundtrip(M) <= 64


def test_as_operator_small_matrix_is_plain_literal():
    M = np.eye(8, dtype=np.float32)
    out = np.asarray(as_operator(M))
    np.testing.assert_array_equal(out, M)


def test_as_operator_dense_matrix_falls_back():
    # not banded: random dense — must fall back to the literal, not corrupt
    rng = np.random.default_rng(0)
    M = rng.normal(size=(600, 600)).astype(np.float32)
    out = np.asarray(as_operator(M))
    np.testing.assert_array_equal(out, M)


def test_as_operator_large_banded_matches():
    k = (np.ones(11, np.float64) / 11).tobytes()
    M = _border_conv_matrix(600, k, "replicate")  # 600^2 > threshold
    out = np.asarray(as_operator(M))
    np.testing.assert_array_equal(out, M)


def test_zero_rows_and_edge_runs():
    M = np.zeros((300, 2000), np.float32)
    M[0, :7] = 1.0          # run at left edge
    M[299, -7:] = 2.0       # run at right edge (start clamped)
    M[150, 1000:1004] = 3.0
    _roundtrip(M)


def test_row_block_split_matches_dense():
    """apply_banded_v/h with BANDED_SPLIT match the unsplit einsums to f32
    reassociation noise (the trimmed contraction drops only exact zeros; the
    MXU accumulation grouping differs, so equality is close, not bit)."""
    import opticalflowcontainer_tpu.core.banded as bd

    rng = np.random.default_rng(7)
    k = (np.ones(13, np.float64) / 13).tobytes()
    Mv = _border_conv_matrix(600, k, "replicate")
    Mh = _border_conv_matrix(640, k, "reflect101")
    x = jnp.asarray(rng.standard_normal((3, 600, 640)).astype(np.float32))
    assert bd.BANDED_SPLIT == "auto" and bd._resolve_split() is None  # cpu
    ref_v = np.asarray(bd.apply_banded_v(Mv, x))
    ref_h = np.asarray(bd.apply_banded_h(Mh, x))
    try:
        for ns in (2, 4, 5):
            bd.BANDED_SPLIT = ns
            np.testing.assert_allclose(
                np.asarray(bd.apply_banded_v(Mv, x)), ref_v,
                rtol=0, atol=1e-5)
            np.testing.assert_allclose(
                np.asarray(bd.apply_banded_h(Mh, x)), ref_h,
                rtol=0, atol=1e-5)
    finally:
        bd.BANDED_SPLIT = "auto"
    # small matrices bypass the split entirely (same object path as dense)
    bd.BANDED_SPLIT = 4
    try:
        small = _border_conv_matrix(64, k, "replicate")
        got = np.asarray(bd.apply_banded_v(small, x[:, :64, :64]))
        want = np.asarray(
            jnp.einsum("oh,chw->cow", jnp.asarray(small), x[:, :64, :64],
                       preferred_element_type=jnp.float32))
        np.testing.assert_array_equal(got, want)
    finally:
        bd.BANDED_SPLIT = "auto"


def test_as_operator_huge_wide_band_chunks_exactly():
    """A wide-band operator past _WIDE_LITERAL_MAX_ELEMS must NOT embed as a
    dense literal (serialized-HLO blowup, r2 HTTP-413) — it expands as summed
    <=48-wide placement passes, bit-identical to the dense original."""
    import opticalflowcontainer_tpu.core.banded as bd

    # wide band (bw=120 > _BANDED_MAX_BW) on a matrix forced over the size
    # ceiling by shrinking the ceiling (a real >4M-elem case is slow in CI)
    n = 900
    k = (np.ones(111, np.float64) / 111).tobytes()
    M = _border_conv_matrix(n, k, "replicate")
    bw = _roundtrip(M)
    assert bw > bd._BANDED_MAX_BW
    old = bd._WIDE_LITERAL_MAX_ELEMS
    bd._WIDE_LITERAL_MAX_ELEMS = n * n - 1
    try:
        out = np.asarray(as_operator(M))
    finally:
        bd._WIDE_LITERAL_MAX_ELEMS = old
    np.testing.assert_array_equal(out, M)
