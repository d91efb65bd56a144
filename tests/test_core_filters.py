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


def test_flow_to_hsv_matches_cv2_color_wheel():
    """Hue convention must match the reference's cv2.cartToPolar debug images
    (reference calcFishSpeed.py:355-356): angle in [0, 2pi) from +x, so
    rightward flow is RED — the arctan2+pi form had the wheel rotated 180deg."""
    import cv2

    from opticalflowcontainer_tpu.core.color import flow_to_hsv_rgb

    rng = np.random.default_rng(5)
    flow = rng.uniform(-4, 4, (32, 48, 2)).astype(np.float32)
    ours = np.asarray(flow_to_hsv_rgb(flow))  # RGB float [0,1]

    mag, ang = cv2.cartToPolar(flow[..., 0], flow[..., 1])
    hsv = np.zeros((32, 48, 3), np.uint8)
    hsv[..., 0] = (ang * 180 / np.pi / 2).astype(np.uint8)  # cv2 H in [0,180)
    hsv[..., 1] = 255
    hsv[..., 2] = np.clip(mag / max(mag.max(), 1e-6) * 255, 0, 255).astype(np.uint8)
    ref = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)[..., ::-1].astype(np.float32) / 255.0

    # uint8 quantization of H/V costs a few percent; a 180deg hue rotation
    # would push the mean error to ~0.3+
    err = np.abs(ours - ref).mean()
    assert err < 0.05, err

    # directional spot-check: rightward flow renders red
    right = np.zeros((4, 4, 2), np.float32)
    right[..., 0] = 3.0
    rgb = np.asarray(flow_to_hsv_rgb(right, max_mag=3.0))
    assert rgb[0, 0, 0] > 0.9 and rgb[0, 0, 1] < 0.1 and rgb[0, 0, 2] < 0.1
