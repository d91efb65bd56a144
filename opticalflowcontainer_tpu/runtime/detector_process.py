"""Standalone junction-detector process: the reference's process split.

The reference runs its C++ junction detector as a separate OS process that
talks DDS to the Python flow node (`/root/reference/ros2_ws/src/pwc_net/
launch/bringup.launch.py:13-38` launches `junction_point_detector` next to
`pwc_net_node`).  This module is that detector process for this framework:
it connects a :class:`~.remote_bus.BusBridgeClient` to a parent's
:class:`~.remote_bus.BusBridgeServer`, receives `/camera/color/image_raw`
over the bridge, runs :class:`~.nodes.JunctionDetectorNode` (native C++
detector via ctypes unless ``--force-python``), and forwards
`/junction_detector/junctions` back — giving the composition the same
process-isolation fault boundary as the reference (SURVEY §2.3/§5).

Run:  python -m opticalflowcontainer_tpu.runtime.detector_process \
          --port <parent server port> [--grid-area A] [--force-python]

Prints ``READY`` on stdout once subscribed, then serves until stdin closes
(the parent owning the pipe exiting tears the child down) or SIGTERM.
"""
from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--grid-area", type=float, default=200.0)
    ap.add_argument("--area-tol", type=float, default=2.0)
    ap.add_argument("--cluster-eps", type=float, default=6.0)
    ap.add_argument("--min-publish", type=int, default=4)
    ap.add_argument("--force-python", action="store_true")
    ap.add_argument("--rotated", action="store_true")
    ap.add_argument("--verbose", action="store_true",
                    help="log every image received / junction cloud sent "
                         "to stderr (debugging the bridge composition)")
    args = ap.parse_args(argv)

    from .bus import Bus
    from .nodes import JunctionDetectorNode
    from .remote_bus import BusBridgeClient

    bus = Bus()
    if args.verbose:
        bus.subscribe("/camera/color/image_raw", lambda m: print(
            f"img t={m.header.stamp}", file=sys.stderr, flush=True))
        bus.subscribe("/junction_detector/junctions", lambda m: print(
            f"junctions n={len(m.points)} t={m.header.stamp}",
            file=sys.stderr, flush=True))
    detector = JunctionDetectorNode(
        bus, grid_area=args.grid_area, area_tol=args.area_tol,
        cluster_eps=args.cluster_eps, min_publish=args.min_publish,
        force_python=args.force_python, rotated=args.rotated,
    )
    client = BusBridgeClient(
        bus, args.host, args.port,
        forward_topics=["/junction_detector/junctions"],
    )
    print("READY", flush=True)
    try:
        # serve until the parent closes our stdin (its exit) or interrupts
        sys.stdin.read()
    except KeyboardInterrupt:
        pass
    finally:
        client.close()
        del detector
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
