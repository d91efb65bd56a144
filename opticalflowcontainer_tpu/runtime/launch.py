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
