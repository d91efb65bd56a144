"""Launch-preset integration: the full junction pipeline (native detector ->
time-synced mask -> masked velocity) recovers a known grid translation."""
import numpy as np


def _fishnet_frame(shift, H=240, W=320, cell=24):
    import cv2

    img = np.full((H, W + 64, 3), (180, 120, 60), np.uint8)
    for y in range(12, H, cell):
        cv2.line(img, (0, y), (W + 64, y), (30, 40, 50), 2)
    for x in range(12, W + 64, cell):
        cv2.line(img, (x, 0), (x, H), (30, 40, 50), 2)
    return img[:, 32 - shift : 32 - shift + W]


def test_bringup_junction_recovers_translation():
    from opticalflowcontainer_tpu.runtime.launch import bringup_junction
    from opticalflowcontainer_tpu.runtime.messages import Header, ImageMsg

    bus, node, detector = bringup_junction(
        grid_area=22.0 * 22.0, force_python_detector=True
    )
    node.vel.pixel_to_meter = 1.0  # px/frame units
    vels = []
    bus.subscribe("/optical_flow/JUNCTION_velocity", lambda m: vels.append(m.x))
    # warm the jit so every frame processes
    node.backend(
        _fishnet_frame(0).mean(-1).astype(np.float32),
        _fishnet_frame(2).mean(-1).astype(np.float32),
        0.1,
    )
    for f in range(5):
        bus.publish(
            "/camera/color/image_raw", ImageMsg(Header(float(f)), _fishnet_frame(f * 2))
        )
    assert len(vels) >= 3
    assert abs(np.mean(vels[1:]) - 2.0) < 0.3


def test_bringup_flow_smoke():
    from opticalflowcontainer_tpu.runtime.launch import bringup_flow
    from opticalflowcontainer_tpu.runtime.messages import Header, ImageMsg

    rng = np.random.default_rng(0)
    bus, node, depth = bringup_flow()
    vels = []
    bus.subscribe("/optical_flow/FLOW_velocity", lambda m: vels.append(m.x))
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    bus.publish("/camera/color/image_raw", ImageMsg(Header(1.0), img))
    bus.publish("/camera/color/image_raw", ImageMsg(Header(1.1), img))
    assert len(vels) == 1 and abs(vels[0]) < 1e-3  # identical frames -> ~0


def test_lk_velocity_node_tracks_translation(rng):
    import cv2

    from opticalflowcontainer_tpu.runtime import Bus
    from opticalflowcontainer_tpu.runtime.messages import Header, ImageMsg
    from opticalflowcontainer_tpu.runtime.nodes import LKVelocityNode, NodeParams

    bus = Bus()
    node = LKVelocityNode(
        bus, NodeParams(name="LK", pixel_to_meter=1.0, aggregate="median"),
        max_corners=100,
    )
    vels = []
    bus.subscribe("/optical_flow/LK_velocity", lambda m: vels.append(m.x))
    base = cv2.GaussianBlur(
        rng.uniform(0, 255, (160, 260)).astype(np.float32), (0, 0), 1.5
    )
    for f in range(4):
        frame = base[10:150, 40 - f * 2 : 240 - f * 2]  # content moves +2/frame
        bus.publish(
            "/camera/color/image_raw",
            ImageMsg(Header(float(f)), np.repeat(frame[..., None], 3, -1).astype(np.uint8)),
        )
    assert len(vels) >= 2
    assert abs(np.mean(vels) - 2.0) < 0.3, vels


def test_bringup_junction_remote_cross_process():
    """The reference's actual process composition: junction detector in its
    OWN OS process (detector_process.py) talking to the flow node over the
    TCP bus bridge (remote_bus ~= DDS) — the process-isolation fault
    boundary of SURVEY §2.3/§5 exercised for real (VERDICT r4 item 7)."""
    import time

    from opticalflowcontainer_tpu.runtime.launch import bringup_junction_remote
    from opticalflowcontainer_tpu.runtime.messages import Header, ImageMsg

    bus, node, server, child = bringup_junction_remote(
        grid_area=22.0 * 22.0, force_python_detector=True
    )
    try:
        node.vel.pixel_to_meter = 1.0  # px/frame units
        vels = []
        masks = []
        bus.subscribe("/optical_flow/JUNCTION_velocity",
                      lambda m: vels.append(m.x))
        bus.subscribe("/junction_detector/junctions",
                      lambda m: masks.append(len(m.points)))
        # warm the jit so every frame processes
        node.backend(
            _fishnet_frame(0).mean(-1).astype(np.float32),
            _fishnet_frame(2).mean(-1).astype(np.float32),
            0.1,
        )
        deadline = time.time() + 60.0
        f = 0
        while len(vels) < 3 and time.time() < deadline:
            bus.publish(
                "/camera/color/image_raw",
                ImageMsg(Header(float(f)), _fishnet_frame((f % 6) * 2)),
            )
            f += 1
            time.sleep(0.25)  # image -> TCP -> detect -> TCP -> sync join
        assert masks, "no junction clouds arrived from the detector process"
        assert len(vels) >= 3, f"only {len(vels)} masked velocities after {f} frames"
        assert abs(np.mean(vels[1:]) - 2.0) < 0.3
    finally:
        try:
            child.stdin.close()
            child.wait(timeout=10)
        except Exception:
            child.kill()
        server.close()
