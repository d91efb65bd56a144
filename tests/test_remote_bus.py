"""Cross-process bus bridge: two Buses linked over TCP exchange typed
messages both ways without echo loops."""
import time

import numpy as np

from opticalflowcontainer_tpu.runtime import Bus
from opticalflowcontainer_tpu.runtime.messages import Header, PointCloudMsg, Vector3StampedMsg
from opticalflowcontainer_tpu.runtime.remote_bus import BusBridgeClient, BusBridgeServer


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
