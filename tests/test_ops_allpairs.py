"""RAFT all-pairs volume / pyramid / lookup tests."""
import numpy as np

from opticalflowcontainer_tpu.ops import (
    all_pairs_correlation,
    corr_pyramid,
    corr_lookup,
    pack_corr_pyramid,
)
from opticalflowcontainer_tpu.ops.allpairs import (
    _window_volume_sample_rows,
    _window_volume_sample_packed,
)


def _packed(pyr, r):
    """pack_corr_pyramid with the size gate forced open (the shipped default
    is 0 = packing OFF after the r4 A/B; these tests cover the kept path)."""
    import opticalflowcontainer_tpu.ops.allpairs as ap

    old = ap.PACK_MAX_BYTES
    try:
        ap.PACK_MAX_BYTES = 1 << 40
        return ap.pack_corr_pyramid(pyr, r)
    finally:
        ap.PACK_MAX_BYTES = old


def test_all_pairs_matches_brute(rng):
    H, W, C = 6, 8, 16
    f1 = rng.standard_normal((H, W, C)).astype(np.float32)
    f2 = rng.standard_normal((H, W, C)).astype(np.float32)
    vol = np.asarray(all_pairs_correlation(f1, f2))
    assert vol.shape == (H, W, H, W)
    ref = np.einsum("abc,dec->abde", f1, f2) / np.sqrt(C)
    np.testing.assert_allclose(vol, ref, rtol=1e-4, atol=1e-5)


def test_pyramid_shapes(rng):
    vol = rng.standard_normal((8, 8, 8, 8)).astype(np.float32)
    pyr = corr_pyramid(vol, 3)
    assert [p.shape for p in pyr] == [(8, 8, 8, 8), (8, 8, 4, 4), (8, 8, 2, 2)]
    np.testing.assert_allclose(
        np.asarray(pyr[1][0, 0, 0, 0]), vol[0, 0, :2, :2].mean(), rtol=1e-5
    )


def test_lookup_zero_flow_center(rng):
    H = W = 8
    f1 = rng.standard_normal((H, W, 4)).astype(np.float32)
    f2 = rng.standard_normal((H, W, 4)).astype(np.float32)
    vol = all_pairs_correlation(f1, f2)
    pyr = corr_pyramid(vol, 2)
    out = np.asarray(corr_lookup(pyr, np.zeros((H, W, 2), np.float32), radius=1))
    assert out.shape == (H, W, 2 * 9)
    # center tap of level 0 at zero flow == diagonal of the volume
    vol_np = np.asarray(vol)
    for y in range(1, H - 1):
        for x in range(1, W - 1):
            np.testing.assert_allclose(out[y, x, 4], vol_np[y, x, y, x], rtol=1e-5)


def test_lookup_integer_flow_shifts_center(rng):
    H = W = 8
    f1 = rng.standard_normal((H, W, 4)).astype(np.float32)
    f2 = rng.standard_normal((H, W, 4)).astype(np.float32)
    vol = all_pairs_correlation(f1, f2)
    pyr = corr_pyramid(vol, 1)
    flow = np.zeros((H, W, 2), np.float32)
    flow[..., 0] = 2.0  # u: target shifted right by 2
    out = np.asarray(corr_lookup(pyr, flow, radius=1))
    vol_np = np.asarray(vol)
    np.testing.assert_allclose(out[3, 3, 4], vol_np[3, 3, 3, 5], rtol=1e-5)


def test_packed_sample_matches_rows_path(rng):
    """The fat-row-packed sampler is bit-identical to the multi-row-gather
    TPU path (same bf16 source cast, same y/x bilinear math), including
    partial and fully-out-of-range windows."""
    H, W = 5, 6
    H2, W2 = 5, 6
    r = 2
    vol = rng.standard_normal((H, W, H2, W2)).astype(np.float32)
    # centers spanning in-range, edge-partial, and fully-out in both signs
    cx = rng.uniform(-2 * W2, 2 * W2, size=(H, W)).astype(np.float32)
    cy = rng.uniform(-2 * H2, 2 * H2, size=(H, W)).astype(np.float32)
    ref = np.asarray(_window_volume_sample_rows(vol, cx, cy, r))
    (packed,) = _packed([vol], r)
    n = 2 * r + 1
    assert packed.shape == (H * W, H2 + n, (n + 1) * W2)
    got = np.asarray(_window_volume_sample_packed(packed, cx, cy, r)).reshape(
        H, W, n * n
    )
    np.testing.assert_array_equal(got, ref)


def test_corr_lookup_packed_matches_unpacked(rng):
    """corr_lookup dispatches on the packed form and matches the CPU oracle."""
    H = W = 8
    f1 = rng.standard_normal((H, W, 4)).astype(np.float32)
    f2 = rng.standard_normal((H, W, 4)).astype(np.float32)
    vol = all_pairs_correlation(f1, f2)
    pyr = corr_pyramid(vol, 3)
    flow = rng.uniform(-3, 3, size=(H, W, 2)).astype(np.float32)
    ref = np.asarray(corr_lookup(pyr, flow, radius=2))
    got = np.asarray(corr_lookup(_packed(pyr, 2), flow, radius=2))
    # packed path reads a bf16 source (the TPU tactic); CPU oracle is f32
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-2)
    assert np.abs(got - ref).mean() < 3e-3


def test_pack_corr_pyramid_size_gate(rng):
    """Over-cap pyramids come back unpacked (rows path keeps working)."""
    import opticalflowcontainer_tpu.ops.allpairs as ap

    vol = rng.standard_normal((4, 4, 4, 4)).astype(np.float32)
    old = ap.PACK_MAX_BYTES
    try:
        ap.PACK_MAX_BYTES = 1
        out = ap.pack_corr_pyramid([vol], 2)
        assert out[0].ndim == 4
    finally:
        ap.PACK_MAX_BYTES = old
