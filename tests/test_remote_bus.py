"""Cross-process bus bridge: two Buses linked over TCP exchange typed
messages both ways without echo loops, over a data-only wire format."""
import time

import numpy as np
import pytest

from opticalflowcontainer_tpu.runtime import Bus
from opticalflowcontainer_tpu.runtime.messages import (
    CameraInfoMsg,
    FlowMsg,
    Header,
    ImageMsg,
    PointCloudMsg,
    RangeMsg,
    Vector3StampedMsg,
)
from opticalflowcontainer_tpu.runtime.remote_bus import (
    BusBridgeClient,
    BusBridgeServer,
    _decode,
    _encode,
)


def _wait_for(pred, timeout=5.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if pred():
            return True
        time.sleep(0.01)
    return False


def test_bridge_bidirectional():
    bus_a = Bus()
    bus_b = Bus()
    server = BusBridgeServer(
        bus_a, forward_topics=["/junction_detector/junctions"]
    )
    client = BusBridgeClient(
        bus_b, "127.0.0.1", server.port,
        forward_topics=["/optical_flow/X_velocity"],
    )
    time.sleep(0.1)  # accept handshake

    got_b = []
    bus_b.subscribe("/junction_detector/junctions", got_b.append)
    got_a = []
    bus_a.subscribe("/optical_flow/X_velocity", got_a.append)

    pts = np.array([[1.0, 2.0], [3.0, 4.0]], np.float32)
    bus_a.publish("/junction_detector/junctions", PointCloudMsg(Header(1.0), pts))
    assert _wait_for(lambda: len(got_b) == 1)
    np.testing.assert_array_equal(got_b[0].points, pts)

    bus_b.publish("/optical_flow/X_velocity", Vector3StampedMsg(Header(2.0), 0.5))
    assert _wait_for(lambda: len(got_a) == 1)
    assert got_a[0].x == 0.5

    # no echo storms: counts stay at 1
    time.sleep(0.2)
    assert len(got_b) == 1 and len(got_a) == 1
    client.close()
    server.close()


def test_wire_format_roundtrips_every_message_type():
    msgs = [
        ImageMsg(Header(1.5, "cam"), np.arange(24, dtype=np.uint8).reshape(2, 4, 3)),
        ImageMsg(Header(2.0), np.ones((3, 4), np.uint16), encoding="16UC1"),
        CameraInfoMsg(Header(0.0), fx=600.0, fy=601.0, width=640, height=480),
        RangeMsg(Header(3.0), range=1.25),
        Vector3StampedMsg(Header(4.0), x=0.125, y=-1.0),
        PointCloudMsg(Header(5.0), np.array([[1, 2], [3, 4]], np.float32)),
        FlowMsg(Header(6.0), np.zeros((2, 2, 2), np.float32)),
    ]
    for msg in msgs:
        topic, out = _decode(_encode("/t", msg))
        assert topic == "/t"
        assert type(out) is type(msg)
        for f in out.__dataclass_fields__:
            a, b = getattr(out, f), getattr(msg, f)
            if isinstance(b, np.ndarray):
                assert a.dtype == b.dtype
                np.testing.assert_array_equal(a, b)
            else:
                assert a == b


def test_wire_format_rejects_unregistered_and_malformed():
    class NotRegistered:
        pass

    with pytest.raises(TypeError):
        _encode("/t", NotRegistered())
    # decoding can only construct registered dataclasses
    import json
    import struct
    evil = json.dumps({"topic": "/t", "msg": {"__msg__": "Popen", "fields": {}}}).encode()
    with pytest.raises(ValueError):
        _decode(struct.pack(">I", len(evil)) + evil)
    evil2 = json.dumps(
        {"topic": "/t", "msg": {"__nd__": 0, "dtype": "object", "shape": [1]}}
    ).encode()
    with pytest.raises(ValueError):
        _decode(struct.pack(">I", len(evil2)) + evil2)


def test_server_refuses_non_loopback_bind():
    bus = Bus()
    with pytest.raises(ValueError):
        BusBridgeServer(bus, host="0.0.0.0")


def test_derived_topic_published_during_bridged_delivery_still_forwards():
    """A node that reacts to a bridged topic by synchronously publishing on
    another forwarded topic must have that derived message propagate (the
    round-1 blanket thread-local guard dropped it)."""
    bus_a = Bus()
    bus_b = Bus()
    server = BusBridgeServer(bus_a, forward_topics=["/img", "/vel"])
    client = BusBridgeClient(bus_b, "127.0.0.1", server.port,
                             forward_topics=["/img", "/vel"])
    time.sleep(0.1)

    # node on A: sees /img, synchronously publishes /vel
    bus_a.subscribe(
        "/img", lambda m: bus_a.publish("/vel", Vector3StampedMsg(m.header, 9.0))
    )
    got_vel_b = []
    bus_b.subscribe("/vel", got_vel_b.append)

    bus_b.publish("/img", ImageMsg(Header(1.0), np.zeros((2, 2, 3), np.uint8)))
    assert _wait_for(lambda: len(got_vel_b) == 1)
    assert got_vel_b[0].x == 9.0
    # and no echo storm on either topic
    time.sleep(0.2)
    assert len(got_vel_b) == 1
    client.close()
    server.close()
