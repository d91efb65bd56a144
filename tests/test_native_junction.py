"""Native junction detector tests: C++ vs python-fallback agreement on a
synthetic fishnet, and the detector node's topic contract."""
import numpy as np
import pytest

from opticalflowcontainer_tpu.native import detect_junctions, _load_native


def _fishnet(cell=24, H=240, W=320):
    import cv2

    img = np.full((H, W, 3), (180, 120, 60), np.uint8)  # blue-ish water
    for y in range(12, H, cell):
        cv2.line(img, (0, y), (W, y), (30, 40, 50), 2)
    for x in range(12, W, cell):
        cv2.line(img, (x, 0), (x, H), (30, 40, 50), 2)
    return img


def test_python_fallback_finds_grid():
    img = _fishnet()
    pts = detect_junctions(img, grid_area=22.0 * 22.0, force_python=True)
    assert len(pts) > 40
    # every detected junction should be near a true grid crossing
    xs = np.arange(12, 320, 24)
    ys = np.arange(12, 240, 24)
    for x, y in pts:
        assert min(abs(xs - x)) < 4.0 and min(abs(ys - y)) < 4.0


@pytest.mark.skipif(_load_native() is None, reason="native lib unavailable")
def test_native_matches_python():
    img = _fishnet()
    native = detect_junctions(img, grid_area=22.0 * 22.0)
    python = detect_junctions(img, grid_area=22.0 * 22.0, force_python=True)
    assert abs(len(native) - len(python)) <= 2
    # match each native point to the nearest python point
    if len(native) and len(python):
        d = np.linalg.norm(native[:, None] - python[None], axis=-1).min(axis=1)
        assert d.max() < 2.0


def test_no_junctions_on_blank():
    img = np.full((120, 160, 3), (180, 120, 60), np.uint8)
    pts = detect_junctions(img, force_python=True)
    assert len(pts) == 0


def test_junction_detector_node_contract():
    from opticalflowcontainer_tpu.runtime import Bus
    from opticalflowcontainer_tpu.runtime.messages import Header, ImageMsg
    from opticalflowcontainer_tpu.runtime.nodes import JunctionDetectorNode

    bus = Bus()
    node = JunctionDetectorNode(bus, grid_area=22.0 * 22.0, force_python=True)
    got = []
    bus.subscribe("/junction_detector/junctions", got.append)
    bus.publish("/camera/color/image_raw", ImageMsg(Header(1.0), _fishnet()))
    assert len(got) == 1 and len(got[0].points) >= 4
    # blank image -> below min_publish -> nothing published
    blank = np.full((120, 160, 3), (180, 120, 60), np.uint8)
    bus.publish("/camera/color/image_raw", ImageMsg(Header(2.0), blank))
    assert len(got) == 1
    del node
