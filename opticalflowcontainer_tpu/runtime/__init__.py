"""Streaming runtime: the ROS2-node-equivalent layer.

Mirrors the reference's node/topic contract (SURVEY.md §1 data-flow shape)
without ROS: a thread-safe pub/sub :class:`~.bus.Bus` with depth-limited
subscriptions and approximate-time joins stands in for DDS; sources
(synthetic camera / video file / frame directory) stand in for the RealSense;
nodes reproduce the per-frame pipeline — flow estimation, depth-driven
pixel-to-meter scaling, junction masking, velocity smoothing, debug
visualization topics, CSV timing.

Topic names follow the reference so a user of the original system finds the
same surface:

- ``/camera/color/image_raw``            (ImageMsg)
- ``/camera/color/camera_info``          (CameraInfoMsg: fx)
- ``/camera/aligned_depth_to_color/image_raw`` (ImageMsg uint16)
- ``/camera/depth/median_distance``      (RangeMsg)
- ``/junction_detector/junctions``       (PointCloudMsg)
- ``/optical_flow/<MODEL>_velocity`` and ``..._smooth_velocity``
  (Vector3StampedMsg, vx in m/s)
- ``/optical_flow/image_live_feed|image_flow|image_mask`` (ImageMsg)
"""
from .bus import Bus, Subscription, ApproximateTimeSynchronizer
from .messages import (
    ImageMsg,
    CameraInfoMsg,
    RangeMsg,
    Float32Msg,
    Vector3StampedMsg,
    PointCloudMsg,
    FlowMsg,
)
from .sources import SyntheticCamera, VideoFileSource, FrameDirectorySource
from .nodes import (
    FlowNode,
    DepthNode,
    JunctionMaskFlowNode,
    JunctionDetectorNode,
    LKVelocityNode,
    NodeParams,
    make_farneback_backend,
    make_model_backend,
)
from .multistream import (
    MultiStreamFlow,
    make_batched_farneback,
    make_batched_fused_farneback,
    make_stateful_batched_fused_farneback,
)
from .fused import (
    FusedFarnebackStream,
    FusedModelStream,
    make_fused_farneback_backend,
    make_fused_model_backend,
    measure_stream_latency,
)
from .junction_tracking import JunctionTracker
from .adaptive import AdaptiveParams, make_adaptive_backend
from .velocity import VelocityEstimator

__all__ = [
    "Bus",
    "Subscription",
    "ApproximateTimeSynchronizer",
    "ImageMsg",
    "CameraInfoMsg",
    "RangeMsg",
    "Float32Msg",
    "Vector3StampedMsg",
    "PointCloudMsg",
    "FlowMsg",
    "SyntheticCamera",
    "VideoFileSource",
    "FrameDirectorySource",
    "FlowNode",
    "DepthNode",
    "JunctionMaskFlowNode",
    "JunctionDetectorNode",
    "LKVelocityNode",
    "NodeParams",
    "make_farneback_backend",
    "make_model_backend",
    "MultiStreamFlow",
    "make_batched_farneback",
    "make_batched_fused_farneback",
    "make_stateful_batched_fused_farneback",
    "FusedFarnebackStream",
    "FusedModelStream",
    "make_fused_farneback_backend",
    "make_fused_model_backend",
    "measure_stream_latency",
    "JunctionTracker",
    "AdaptiveParams",
    "make_adaptive_backend",
    "VelocityEstimator",
]
