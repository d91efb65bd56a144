"""Launch presets: node compositions mirroring the reference's launch files
(reference pwc_net/launch/bringup.launch.py:13-38,
liteflownet3/launch/bringup_{lfn3,sublfn3,junction}.launch.py).

Each ``bringup_*`` wires nodes onto one Bus and returns them; callers attach a
source (camera-direct) or publish image topics (bag-replay style).
"""
from __future__ import annotations

from .bus import Bus
from .nodes import (
    DepthNode,
    FlowNode,
    JunctionDetectorNode,
    JunctionMaskFlowNode,
    NodeParams,
    make_farneback_backend,
)


def bringup_flow(
    bus: Bus | None = None,
    backend=None,
    params: NodeParams | None = None,
    with_depth: bool = True,
    direct: bool = True,
):
    """Plain flow pipeline: image topic -> FlowNode (+DepthNode).
    The reference's bringup_lfn3/sublfn3 shape."""
    bus = bus or Bus()
    backend = backend or make_farneback_backend(levels=2, winsize=13, iterations=2)
    node = FlowNode(backend, params or NodeParams(name="FLOW"), bus).attach(
        direct=direct
    )
    depth = DepthNode(bus, direct=direct) if with_depth else None
    return bus, node, depth


def bringup_junction(
    bus: Bus | None = None,
    backend=None,
    params: NodeParams | None = None,
    grid_area: float = 200.0,
    direct: bool = True,
    force_python_detector: bool = False,
):
    """Junction-masked pipeline: image topic -> junction detector (native C++)
    + time-synced junction-masked FlowNode.  The reference's
    bringup.launch.py composition (flow node + junction_point_detector)."""
    bus = bus or Bus()
    backend = backend or make_farneback_backend(levels=2, winsize=13, iterations=2)
    detector = JunctionDetectorNode(
        bus, grid_area=grid_area, direct=direct,
        force_python=force_python_detector,
    )
    node = JunctionMaskFlowNode(
        backend, params or NodeParams(name="JUNCTION", aggregate="median"), bus
    ).attach(direct=direct)
    return bus, node, detector


def bringup_junction_remote(
    bus: Bus | None = None,
    backend=None,
    params: NodeParams | None = None,
    grid_area: float = 200.0,
    force_python_detector: bool = False,
    spawn: bool = True,
    ready_timeout: float = 60.0,
):
    """Junction-masked pipeline with the detector in its OWN OS process,
    composed over the TCP bus bridge — the reference's actual process split
    (bringup.launch.py:13-38 launches the C++ `junction_point_detector`
    process next to the Python flow node over DDS; here
    :mod:`.detector_process` plays the detector process and
    :mod:`.remote_bus` plays DDS).

    Returns ``(bus, node, server, child)``; ``child`` is the detector
    ``subprocess.Popen`` (``None`` with ``spawn=False`` — then connect your
    own ``python -m ...runtime.detector_process --port server.port``).
    Close with ``child.stdin.close(); child.wait(); server.close()``.
    """
    import subprocess
    import sys

    from .remote_bus import BusBridgeServer

    bus = bus or Bus()
    backend = backend or make_farneback_backend(levels=2, winsize=13, iterations=2)
    node = JunctionMaskFlowNode(
        backend, params or NodeParams(name="JUNCTION", aggregate="median"), bus
    ).attach(direct=True)
    server = BusBridgeServer(
        bus, port=0, forward_topics=["/camera/color/image_raw"]
    )
    child = None
    if spawn:
        cmd = [sys.executable, "-m",
               "opticalflowcontainer_tpu.runtime.detector_process",
               "--port", str(server.port), "--grid-area", str(grid_area)]
        if force_python_detector:
            cmd.append("--force-python")
        child = subprocess.Popen(
            cmd, stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True)
        import threading

        got: list[str] = []
        reader = threading.Thread(
            target=lambda: got.append(child.stdout.readline().strip()),
            daemon=True)
        reader.start()
        reader.join(ready_timeout)
        if not got or got[0] != "READY":
            # tear down everything built above — a caller retrying bringup
            # must not accumulate leaked server sockets / attached nodes
            child.kill()
            child.wait(timeout=5.0)
            server.close()
            node.stop()
            raise RuntimeError(
                "detector process failed to start "
                f"(got {got[0] if got else 'timeout'!r})")
    return bus, node, server, child
