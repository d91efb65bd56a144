"""Device-side ingest + prefetch tests."""
import numpy as np

from opticalflowcontainer_tpu.core.ingest import pad_to_multiple, preprocess_frames
from opticalflowcontainer_tpu.runtime.prefetch import DevicePrefetcher


def test_preprocess_gray_resize_matches_cv2(rng):
    import cv2

    frames = rng.integers(0, 255, (2, 48, 64, 3), dtype=np.uint8)
    out = np.asarray(preprocess_frames(frames, out_hw=(24, 32), to_gray=True))
    assert out.shape == (2, 24, 32)
    ref = cv2.resize(
        cv2.cvtColor(frames[0], cv2.COLOR_BGR2GRAY).astype(np.float32),
        (32, 24),
    ) / 255.0
    # BT.601 float gray vs cv2's uint8-rounded gray: sub-1/255 tolerance
    np.testing.assert_allclose(out[0], ref, atol=2.5 / 255.0)


def test_preprocess_rgb_mean(rng):
    frames = rng.integers(0, 255, (1, 16, 16, 3), dtype=np.uint8)
    out = np.asarray(
        preprocess_frames(frames, to_rgb=True, mean=(0.4, 0.4, 0.4))
    )
    expect = frames[0, ..., ::-1].astype(np.float32) / 255.0 - 0.4
    np.testing.assert_allclose(out[0], expect, atol=1e-6)


def test_pad_to_multiple(rng):
    x = rng.standard_normal((30, 50, 3)).astype(np.float32)
    padded, (H, W) = pad_to_multiple(x, 32)
    assert padded.shape == (32, 64, 3) and (H, W) == (30, 50)
    np.testing.assert_array_equal(np.asarray(padded)[:30, :50], x)
    # edge padding
    np.testing.assert_array_equal(np.asarray(padded)[31, :50], x[29])


def test_device_prefetcher_order_and_content(rng):
    items = [rng.standard_normal((8, 8)).astype(np.float32) for _ in range(5)]
    got = [np.asarray(x) for x in DevicePrefetcher(iter(items), depth=2)]
    assert len(got) == 5
    for a, b in zip(got, items):
        np.testing.assert_array_equal(a, b)
