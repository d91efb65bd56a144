"""Classical optical flow with cv2-parity APIs.

- :func:`calc_optical_flow_farneback` — dense flow,
  ``cv2.calcOpticalFlowFarneback`` signature & numerics.
- :func:`calc_optical_flow_pyr_lk` — sparse pyramidal Lucas-Kanade,
  ``cv2.calcOpticalFlowPyrLK`` signature & numerics.

These carry the capability of the reference's classical nodes
(``lucas_kanade_node`` / ``raft_*_node`` referenced by
scripts/monitor.sh:16-20 of the reference; BASELINE.json configs 1-3 make them
first-class requirements).
"""
from .farneback import (
    calc_optical_flow_farneback,
    farneback_batched,
    farneback_clip,
    farneback_stream_planes,
    farneback_stream_step,
)
from .lucas_kanade import calc_optical_flow_pyr_lk

OPTFLOW_USE_INITIAL_FLOW = 4
OPTFLOW_FARNEBACK_GAUSSIAN = 256

__all__ = [
    "calc_optical_flow_farneback",
    "farneback_batched",
    "farneback_clip",
    "farneback_stream_planes",
    "farneback_stream_step",
    "calc_optical_flow_pyr_lk",
    "OPTFLOW_USE_INITIAL_FLOW",
    "OPTFLOW_FARNEBACK_GAUSSIAN",
]
