"""Runtime layer tests: bus semantics, time sync, velocity math, end-to-end
streaming against the synthetic camera's ground truth."""
import time

import numpy as np

from opticalflowcontainer_tpu.runtime import (
    ApproximateTimeSynchronizer,
    Bus,
    DepthNode,
    FlowNode,
    JunctionMaskFlowNode,
    NodeParams,
    SyntheticCamera,
    VelocityEstimator,
)
from opticalflowcontainer_tpu.runtime.messages import (
    Header,
    ImageMsg,
    PointCloudMsg,
)
from opticalflowcontainer_tpu.runtime.nodes import make_farneback_backend
from opticalflowcontainer_tpu.runtime.velocity import junction_mask


def test_bus_pubsub_and_depth_limit():
    bus = Bus()
    got = []
    bus.subscribe("/t", got.append, depth=3)
    for i in range(5):
        bus.publish("/t", i)
    assert got == [0, 1, 2, 3, 4]  # direct mode delivers everything


def test_bus_latched():
    bus = Bus()
    bus.publish("/info", "hello", latch=True)
    got = []
    bus.subscribe("/info", got.append)
    assert got == ["hello"]


def test_time_synchronizer_joins_within_slop():
    bus = Bus()
    joins = []
    ApproximateTimeSynchronizer(
        bus, ["/a", "/b"], lambda a, b: joins.append((a, b)), slop=0.01
    )
    bus.publish("/a", ImageMsg(Header(1.000), np.zeros(1)))
    bus.publish("/b", ImageMsg(Header(1.005), np.zeros(1)))  # within slop
    bus.publish("/a", ImageMsg(Header(2.000), np.zeros(1)))
    bus.publish("/b", ImageMsg(Header(2.100), np.zeros(1)))  # outside slop
    assert len(joins) == 1
    assert joins[0][0].header.stamp == 1.000


def test_velocity_estimator_math():
    v = VelocityEstimator(pixel_to_meter=0.001, aggregate="mean", smooth_window=2)
    flow = np.zeros((4, 4, 2), np.float32)
    flow[..., 0] = 3.0
    vx, vs, vy = v.update(flow, dt=0.1)
    assert abs(vx - 0.03) < 1e-9
    # dt <= 0 guard
    vx2, _, _ = v.update(flow, dt=0.0)
    assert abs(vx2 - 3.0 * 0.001 / 1e-3) < 1e-9
    # dynamic pixel_to_meter = depth / fx
    v.set_fx(600.0)
    v.set_depth(1.2)
    assert abs(v.pixel_to_meter - 0.002) < 1e-12


def test_junction_mask_boxes():
    mask = junction_mask((20, 20), np.array([[10.0, 10.0]]), box=5)
    assert mask[10, 10] and mask[8, 8] and mask[12, 12]
    assert not mask[5, 5]
    assert mask.sum() == 25


def test_end_to_end_stream_velocity():
    """Full producer/consumer pipeline recovers the synthetic ground truth."""
    bus = Bus()
    gt = 0.05
    p2m = 0.000857
    cam = SyntheticCamera(
        bus, width=160, height=120, fps=15, n_frames=12,
        velocity_mps=gt, pixel_to_meter=p2m,
    )
    node = FlowNode(
        make_farneback_backend(levels=2, winsize=11, iterations=2),
        NodeParams(pixel_to_meter=p2m, name="FB", smooth_window=3),
        bus,
    )
    # warm the jit so the stream isn't dropped during compile
    f0, f1 = cam.frame_at(0), cam.frame_at(1)
    node.backend(f0.mean(-1).astype(np.float32), f1.mean(-1).astype(np.float32), 0.1)

    vels = []
    bus.subscribe("/optical_flow/FB_velocity", lambda m: vels.append(m.x))
    node.start_stream(cam)
    node.wait(timeout=30)
    node.stop()
    assert len(vels) >= 5
    # median: resilient to a single dt-glitch outlier when the host is loaded
    assert abs(np.median(vels[2:]) - gt) < 0.01


def test_topic_mode_and_depth_node():
    bus = Bus()
    node = FlowNode(
        make_farneback_backend(levels=1, winsize=11, iterations=1),
        NodeParams(pixel_to_meter=1.0, name="FB2", aggregate="median"),
    ).attach(bus)
    DepthNode(bus, depth_scale=0.001)

    vels = []
    bus.subscribe("/optical_flow/FB2_velocity", lambda m: vels.append(m))
    depth_vals = []
    bus.subscribe("/camera/depth/median_distance", lambda m: depth_vals.append(m.range))

    # depth image -> median distance -> updates pixel_to_meter via fx
    from opticalflowcontainer_tpu.runtime.messages import CameraInfoMsg

    bus.publish("/camera/color/camera_info", CameraInfoMsg(Header(0.0), fx=500.0))
    depth = np.full((100, 100), 2000, np.uint16)
    bus.publish(
        "/camera/aligned_depth_to_color/image_raw",
        ImageMsg(Header(0.0), depth, "16UC1"),
    )
    assert depth_vals == [2.0]
    assert abs(node.vel.pixel_to_meter - 2.0 / 500.0) < 1e-12

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (64, 64, 3)).astype(np.uint8)
    bus.publish("/camera/color/image_raw", ImageMsg(Header(1.0), img))
    bus.publish("/camera/color/image_raw", ImageMsg(Header(1.1), img))
    assert len(vels) == 1  # first frame primes, second estimates


def test_net_size_resize_keeps_source_pixel_units():
    """net_width/net_height run the backend at a fixed size (reference
    neuflow_node.py:50-51 fixed 768x432; sub-nodes' resize-to-param) while
    velocities stay in SOURCE-pixel units: a +4 px/frame shift at 320 wide
    is +2 px at net 160, scaled back to +4."""
    import cv2

    bus = Bus()
    seen_shapes = []

    def backend(prev, nxt, dt):
        seen_shapes.append(nxt.shape)
        flow = np.zeros(nxt.shape[:2] + (2,), np.float32)
        # phase-correlate-free oracle: known constant shift recovered by
        # matching columns; just return the true net-scale displacement
        flow[..., 0] = 2.0
        return flow

    node = FlowNode(
        backend,
        NodeParams(pixel_to_meter=1.0, name="NS", net_width=160,
                   net_height=120),
    ).attach(bus)
    vels = []
    bus.subscribe("/optical_flow/NS_velocity", lambda m: vels.append(m.x))
    rng = np.random.default_rng(0)
    base = cv2.GaussianBlur(
        rng.uniform(0, 255, (260, 340)).astype(np.float32), (0, 0), 2.0)
    for f in range(3):
        frame = base[10:250, 10 + 4 * f : 330 + 4 * f]  # 240x320 frames
        bus.publish(
            "/camera/color/image_raw",
            ImageMsg(Header(float(f)),
                     np.repeat(frame[..., None], 3, -1).astype(np.uint8)),
        )
    assert all(s == (120, 160) for s in seen_shapes)
    # backend reported 2 px/frame at net scale; dt=1 -> vx = 2 * (320/160)
    assert len(vels) == 2 and all(abs(v - 4.0) < 1e-5 for v in vels)


def test_junction_masked_node_sync():
    bus = Bus()
    node = JunctionMaskFlowNode(
        lambda prev, cur, dt: np.tile(
            np.array([2.0, 0.0], np.float32), (prev.shape[0], prev.shape[1], 1)
        ),
        NodeParams(pixel_to_meter=1.0, name="J"),
    ).attach(bus)
    vels = []
    bus.subscribe("/optical_flow/J_velocity", lambda m: vels.append(m.x))
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (32, 32, 3)).astype(np.uint8)
    pts = np.array([[16.0, 16.0]], np.float32)
    for t in (1.0, 2.0):
        bus.publish("/camera/color/image_raw", ImageMsg(Header(t), img))
        bus.publish("/junction_detector/junctions", PointCloudMsg(Header(t + 0.004), pts))
    assert len(vels) == 1
    assert abs(vels[0] - 2.0) < 1e-6


def test_bus_namespace_isolation():
    from opticalflowcontainer_tpu.runtime import Bus

    bus_a = Bus(namespace="/robot_a")
    bus_shared = Bus()
    got_a, got_plain = [], []
    bus_a.subscribe("/t", got_a.append)
    bus_shared.subscribe("/t", got_plain.append)
    bus_a.publish("/t", 1)
    bus_shared.publish("/t", 2)
    assert got_a == [1] and got_plain == [2]
    # same bus, namespaced both sides: round-trips
    bus_a.publish("/t", 3)
    assert got_a == [1, 3]


def test_bus_namespace_from_env(monkeypatch):
    """Deployment-level domain selection: $OFC_BUS_NAMESPACE seeds the
    default namespace (deploy/env.sh, the ROS_DOMAIN_ID equivalent)."""
    from opticalflowcontainer_tpu.runtime import Bus

    monkeypatch.setenv("OFC_BUS_NAMESPACE", "/dom22")
    assert Bus().namespace == "/dom22"
    assert Bus(namespace="").namespace == ""  # explicit empty overrides
    monkeypatch.delenv("OFC_BUS_NAMESPACE")
    assert Bus().namespace == ""


def test_color_backend_receives_bgr_classical_gets_bt601_gray():
    """Learned-model backends must see the original 3-channel frame (the
    reference feeds color to nets trained on color); classical backends get
    BT.601 gray, not an unweighted channel mean."""
    from opticalflowcontainer_tpu.runtime.nodes import make_model_backend

    frame = np.zeros((8, 8, 3), np.uint8)
    frame[..., 0] = 10   # B
    frame[..., 1] = 100  # G
    frame[..., 2] = 200  # R

    seen = {}

    def fake_estimate(i1, i2):
        seen["img"] = np.asarray(i2)
        return np.zeros(i2.shape[:2] + (2,), np.float32)

    node = FlowNode(make_model_backend(fake_estimate), NodeParams(name="M"))
    node._image_callback(ImageMsg(Header(0.0), frame))
    node._image_callback(ImageMsg(Header(0.1), frame))
    img = seen["img"]
    assert img.shape == (8, 8, 3)
    ch = img[0, 0] * 255.0
    assert not np.allclose(ch, ch[0])  # three DISTINCT channels survive
    np.testing.assert_allclose(ch, [10, 100, 200], atol=1e-4)  # BGR preserved

    got_gray = {}

    def gray_backend(prev, cur, dt):
        got_gray["img"] = np.asarray(cur)
        return np.zeros(cur.shape + (2,), np.float32)

    node2 = FlowNode(gray_backend, NodeParams(name="G"))
    node2._image_callback(ImageMsg(Header(0.0), frame))
    node2._image_callback(ImageMsg(Header(0.1), frame))
    g = got_gray["img"]
    assert g.shape == (8, 8)
    expected = 0.114 * 10 + 0.587 * 100 + 0.299 * 200  # BT.601, BGR order
    np.testing.assert_allclose(g[0, 0], expected, rtol=1e-5)


def test_velocity_update_from_displacement_smooths_and_clamps():
    est = VelocityEstimator(pixel_to_meter=0.001, smooth_window=3, max_speed=1.0)
    vx, sm = est.update_from_displacement(500.0, 0.5)  # 1 m/s -> at clamp
    assert vx == 1.0 and sm == 1.0
    vx, sm = est.update_from_displacement(2500.0, 0.5)  # 5 m/s -> clamped
    assert vx == 1.0
    vx, sm = est.update_from_displacement(0.0, -1.0)  # dt guard
    assert vx == 0.0 and np.isclose(sm, 2.0 / 3.0)


def test_bus_latched_delivery_releases_lock():
    """A direct subscriber callback may publish: latched delivery in
    subscribe() must happen OUTSIDE the bus lock (publish() already does) or
    the constructor-time callback deadlocks on the non-reentrant lock."""
    bus = Bus(namespace="")
    bus.publish("/a", 42, latch=True)
    got_b = []
    bus.subscribe("/b", got_b.append)
    bus.subscribe("/a", lambda msg: bus.publish("/b", msg + 1))
    assert got_b == [43]


def test_synthetic_camera_negative_velocity_keeps_moving():
    """Negative velocity_mps must keep translating for the whole clip (the
    old fixed start clamped after ~2 frames, freezing the scene while the
    advertised ground truth stayed nonzero)."""
    cam = SyntheticCamera(width=64, height=48, velocity_mps=-0.05,
                          n_frames=30)
    f0 = cam.frame_at(0).astype(np.float32)
    f10 = cam.frame_at(10).astype(np.float32)
    f20 = cam.frame_at(20).astype(np.float32)
    assert np.abs(f10 - f0).mean() > 1.0
    assert np.abs(f20 - f10).mean() > 1.0


def test_flow_node_stream_restartable():
    """start_stream must be callable again after the first source exhausts
    (the stop event latched forever before the fix)."""
    bus = Bus(namespace="restart")
    node = FlowNode(make_farneback_backend(),
                    NodeParams(name="t", fps=200.0, width=64, height=48),
                    bus=bus)
    for expect_growth in (False, True):
        before = node.frames_processed
        cam = SyntheticCamera(width=64, height=48, velocity_mps=0.05,
                              n_frames=4, fps=200.0, bus=bus)
        node.start_stream(cam)
        node.wait()
        if expect_growth:
            assert node.frames_processed > before


def test_fused_aggregate_empty_mask_falls_back_to_full_frame():
    """All-False mask -> full-frame aggregate (matching VelocityEstimator's
    mask.any() branch), never NaN/0."""
    import jax.numpy as jnp

    from opticalflowcontainer_tpu.runtime.fused import _aggregate_u

    u = jnp.arange(12.0).reshape(3, 4)
    empty = jnp.zeros((3, 4), bool)
    for agg in ("mean", "median"):
        val = float(_aggregate_u(u, empty, agg, True))
        full = float(jnp.mean(u) if agg == "mean" else jnp.median(u))
        assert abs(val - full) < 1e-6
    # a real mask still masks
    m = jnp.zeros((3, 4), bool).at[0, 0].set(True)
    assert float(_aggregate_u(u, m, "mean", True)) == 0.0
