"""cv2-parity tests for core filters."""
import cv2
import numpy as np
import pytest

from opticalflowcontainer_tpu.core import (
    gaussian_blur,
    box_filter,
    median_filter,
    pyr_down,
    resize_bilinear,
)


def _img(rng, h=48, w=64):
    return rng.uniform(0, 255, (h, w)).astype(np.float32)


def test_gaussian_blur_matches_cv2(rng):
    img = _img(rng)
    for ksize, sigma in [(5, 1.2), (7, 0.0), (3, 0.8), (15, 2.5)]:
        ours = np.asarray(gaussian_blur(img, ksize, sigma))
        ref = cv2.GaussianBlur(img, (ksize, ksize), sigma)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-2)


def test_box_filter_matches_cv2(rng):
    img = _img(rng)
    for ksize in [3, 5, 15]:
        ours = np.asarray(box_filter(img, ksize))
        ref = cv2.blur(img, (ksize, ksize))
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-2)


def test_median_filter_matches_cv2(rng):
    img = _img(rng).astype(np.uint8).astype(np.float32)
    ours = np.asarray(median_filter(img, 3))
    ref = cv2.medianBlur(img.astype(np.uint8), 3).astype(np.float32)
    # interior must match exactly; cv2 border handling differs for median
    np.testing.assert_allclose(ours[2:-2, 2:-2], ref[2:-2, 2:-2], atol=0)


def test_pyr_down_matches_cv2(rng):
    img = _img(rng, 48, 64)
    ours = np.asarray(pyr_down(img))
    ref = cv2.pyrDown(img)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=5e-3)


def test_pyr_down_odd_size(rng):
    img = _img(rng, 47, 63)
    ours = np.asarray(pyr_down(img))
    ref = cv2.pyrDown(img)
    assert ours.shape == ref.shape
    # cv2 handles odd sizes with border extrapolation; interior matches
    np.testing.assert_allclose(ours[1:-1, 1:-1], ref[1:-1, 1:-1], rtol=1e-4, atol=5e-3)


@pytest.mark.parametrize("dst", [(24, 32), (96, 128), (33, 57)])
def test_resize_matches_cv2(rng, dst):
    img = _img(rng)
    ours = np.asarray(resize_bilinear(img, dst))
    ref = cv2.resize(img, (dst[1], dst[0]), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=0.35)


def test_resize_batched(rng):
    img = rng.uniform(0, 1, (2, 3, 48, 64)).astype(np.float32)
    out = np.asarray(resize_bilinear(img, (24, 32)))
    assert out.shape == (2, 3, 24, 32)
    single = np.asarray(resize_bilinear(img[1, 2], (24, 32)))
    np.testing.assert_allclose(out[1, 2], single, atol=1e-6)
