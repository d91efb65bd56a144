"""RAFT all-pairs volume / pyramid / lookup tests."""
import numpy as np

from opticalflowcontainer_tpu.ops import all_pairs_correlation, corr_pyramid, corr_lookup


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
