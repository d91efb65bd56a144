"""Runtime nodes: the per-frame pipeline stages.

:class:`FlowNode` is the centerpiece — the equivalent of the reference's
``*_node.py`` family.  One class covers both execution styles:

- topic-driven (``node.attach(bus)`` subscribes to the image topic —
  reference ``*_sub_node`` twins),
- producer/consumer streaming (``node.start_stream(source)`` runs capture and
  inference on separate threads joined by a bounded drop-newest
  ``Queue(maxsize=2)`` — reference lfn3_node.py:78-137).

Flow backends are callables ``(prev_gray_or_bgr, cur, dt) -> flow [H, W, 2]``;
:func:`make_farneback_backend` / :func:`make_model_backend` build jitted ones.
Velocity estimation, depth/fx-driven scaling, junction masking, smoothing,
debug-image topics and CSV timing hang off the node per the reference
contract.
"""
from __future__ import annotations

import dataclasses
import queue as queue_mod
import threading
import time
from typing import Callable

import numpy as np

from .bus import ApproximateTimeSynchronizer, Bus
from .messages import (
    FlowMsg,
    Header,
    ImageMsg,
    PointCloudMsg,
    RangeMsg,
    Vector3StampedMsg,
)
from .velocity import VelocityEstimator, junction_mask
from .timing import CsvTimer


@dataclasses.dataclass
class NodeParams:
    """declare_parameter-equivalent config (reference lfn3_node.py:22-44)."""

    width: int = 640
    height: int = 480
    fps: float = 30.0
    pixel_to_meter: float = 0.000857
    aggregate: str = "mean"  # mean | median
    smooth_window: int = 5
    max_speed: float | None = None
    name: str = "FLOW"
    write_csv: bool = False
    write_accel_csv: bool = False  # per-node HBM log (monitor.sh:67 gpu leg)
    csv_dir: str = "."
    publish_debug_images: bool = False
    junction_box: int = 11
    queue_size: int = 2
    # Fixed net input size (reference neuflow_node.py:50-51 runs at 768x432
    # regardless of camera size; sub-nodes resize frames to their width/
    # height params, pwc_sub_node.py:155-156).  None = run at frame size.
    # Unlike the reference (whose velocity silently changes units when the
    # resize factor != 1), the horizontal displacement is scaled back by
    # frame_w / net_w so velocities stay in SOURCE-pixel units.
    net_width: int | None = None
    net_height: int | None = None

    def __post_init__(self):
        # setting only one of net_width/net_height would silently run at
        # frame size (the resize guard needs both) — fail loudly instead
        if (self.net_width is None) != (self.net_height is None):
            raise ValueError(
                "net_width and net_height must be set together "
                f"(got net_width={self.net_width}, "
                f"net_height={self.net_height})")


class FlowNode:
    """image in -> velocity out.

    Topics out: /optical_flow/<NAME>_velocity, /optical_flow/<NAME>_smooth_velocity,
    plus image_live_feed / image_flow debug topics when enabled.
    Topics in (attach): /camera/color/image_raw, /camera/color/camera_info,
    /camera/depth/median_distance.

    Calibration: ``params.pixel_to_meter`` seeds the estimator at construction;
    at runtime it is owned by ``self.vel`` (updated dynamically from depth/fx
    topics) — change ``node.vel.pixel_to_meter``, not ``node.p``, after init.
    """

    def __init__(self, backend: Callable, params: NodeParams | None = None,
                 bus: Bus | None = None):
        self.backend = backend
        self.p = params or NodeParams()
        self.bus = bus or Bus()
        self.vel = VelocityEstimator(
            self.p.pixel_to_meter, self.p.aggregate, self.p.smooth_window,
            self.p.max_speed,
        )
        self.timer = CsvTimer(
            f"{self.p.csv_dir}/{self.p.name.lower()}_{self.p.width}x{self.p.height}.csv"
        ) if self.p.write_csv else None
        self._accel_stop = None
        if self.p.write_accel_csv:
            # accelerator leg of the reference's monitor.sh: a TPU is
            # process-exclusive, so the HBM sampler runs inside the node's
            # process (scripts/monitor.sh:67 samples nvidia-smi externally).
            from .tracing import start_memory_monitor

            self._accel_stop = start_memory_monitor(
                f"{self.p.csv_dir}/accel_usage_{self.p.name.lower()}.log"
            )
        self._prev: tuple[np.ndarray, float] | None = None
        self._subs = []
        self._stop = threading.Event()
        self._threads: list[threading.Thread] = []
        self._queue: queue_mod.Queue = queue_mod.Queue(maxsize=self.p.queue_size)
        self.frames_processed = 0

    # ---------------------------------------------------------- topic mode
    def attach(self, bus: Bus | None = None, direct: bool = True):
        if bus is not None:
            self.bus = bus
        self._subs.append(
            self.bus.subscribe("/camera/color/image_raw", self._image_callback,
                               depth=10, direct=direct)
        )
        self._subs.append(
            self.bus.subscribe("/camera/color/camera_info",
                               lambda m: self.vel.set_fx(m.fx), direct=direct)
        )
        self._subs.append(
            self.bus.subscribe("/camera/depth/median_distance",
                               lambda m: self.vel.set_depth(m.range), direct=direct)
        )
        return self

    def _image_callback(self, msg: ImageMsg, mask: np.ndarray | None = None):
        try:
            self._process(msg, mask)
        except Exception:  # per-frame fault boundary (reference style)
            import traceback

            traceback.print_exc()

    # ------------------------------------------------------- stream mode
    def start_stream(self, source):
        """Producer/consumer: capture thread fills a bounded queue (dropping
        the newest frame on overflow), inference thread drains it."""
        # _stop latches when a source exhausts (or on stop()); clear it so a
        # second start_stream on the same node processes frames again
        self._stop.clear()

        def producer():
            # pace at the source's fps, like a real camera delivers frames
            period = 1.0 / getattr(source, "fps", self.p.fps)
            t_next = time.monotonic()
            for frame in source.frames():
                if self._stop.is_set():
                    return
                msg = ImageMsg(Header(time.monotonic()), frame, "bgr8")
                try:
                    self._queue.put_nowait(msg)
                except queue_mod.Full:
                    pass  # drop: backpressure policy (reference lfn3_node.py:134-137)
                t_next += period
                delay = t_next - time.monotonic()
                if delay > 0:
                    time.sleep(delay)
            self._stop.set()

        def consumer():
            while not (self._stop.is_set() and self._queue.empty()):
                try:
                    msg = self._queue.get(timeout=0.1)
                except queue_mod.Empty:
                    continue
                self._image_callback(msg)

        self._threads = [
            threading.Thread(target=producer, daemon=True),
            threading.Thread(target=consumer, daemon=True),
        ]
        for t in self._threads:
            t.start()
        return self

    def wait(self, timeout: float | None = None):
        for t in self._threads:
            t.join(timeout)

    def stop(self):
        self._stop.set()
        for t in self._threads:
            t.join(timeout=2.0)
        for s in self._subs:
            self.bus.unsubscribe(s)
        if self._accel_stop is not None:
            self._accel_stop()
            self._accel_stop = None

    # ------------------------------------------------------------ core
    def _process(self, msg: ImageMsg, mask: np.ndarray | None = None):
        t0 = time.perf_counter()
        frame = msg.data
        if msg.encoding in ("jpeg", "compressed"):
            # CompressedImage path (reference opticalflow_comprerssed_node.py:44-49)
            import cv2

            frame = cv2.imdecode(
                np.frombuffer(frame, np.uint8), cv2.IMREAD_COLOR
            )
            if frame is None:
                return
        # Learned-model backends see the full color frame (the reference feeds
        # RGB to nets trained on RGB, lfn3_node.py:161-177); classical
        # backends get BT.601 grayscale (what cv2.cvtColor BGR2GRAY computes).
        wants_color = bool(getattr(self.backend, "wants_color", False))
        if frame.ndim == 3 and frame.shape[-1] == 3:
            obs = frame if wants_color else _bgr_to_gray_np(frame)
        elif frame.ndim == 3:
            obs = frame[..., 0].astype(np.float32)
        else:
            obs = frame.astype(np.float32)
        u_scale = v_scale = 1.0
        net_resized = False
        if (self.p.net_width is not None and self.p.net_height is not None
                and obs.shape[:2] != (self.p.net_height, self.p.net_width)):
            net_resized = True
            import cv2

            u_scale = obs.shape[1] / float(self.p.net_width)
            v_scale = obs.shape[0] / float(self.p.net_height)
            obs = cv2.resize(
                np.ascontiguousarray(obs, np.float32),
                (self.p.net_width, self.p.net_height),
                interpolation=cv2.INTER_AREA,
            )
            if mask is not None:
                mask = cv2.resize(
                    mask.astype(np.uint8),
                    (self.p.net_width, self.p.net_height),
                    interpolation=cv2.INTER_NEAREST,
                ).astype(bool)
        if self._prev is None:
            self._prev = (obs, msg.header.stamp)
            return
        prev, t_prev = self._prev
        self._prev = (obs, msg.header.stamp)
        dt = msg.header.stamp - t_prev

        if getattr(self.backend, "returns_displacement", False):
            # Fused device path (runtime.fused): the backend aggregates the
            # horizontal displacement ON DEVICE and returns one scalar — no
            # flow-field host transfer per frame.
            du = self.backend(prev, obs, dt, mask)
            vx, vx_smooth = self.vel.update_from_displacement(
                du * u_scale if net_resized else du, dt)
            flow = None
        else:
            flow = np.asarray(self.backend(prev, obs, dt))
            if net_resized:
                flow = flow * np.asarray([u_scale, v_scale], np.float32)
            vx, vx_smooth, _vy = self.vel.update(flow, dt, mask)
        name = self.p.name
        self.bus.publish(
            f"/optical_flow/{name}_velocity",
            Vector3StampedMsg(msg.header, vx),
        )
        self.bus.publish(
            f"/optical_flow/{name}_smooth_velocity",
            Vector3StampedMsg(msg.header, vx_smooth),
        )
        if flow is not None:
            self.bus.publish(f"/optical_flow/{name}_flow", FlowMsg(msg.header, flow))
        if self.p.publish_debug_images:
            self.bus.publish("/optical_flow/image_live_feed", ImageMsg(msg.header, frame))
            if flow is not None:
                from .viz import flow_to_bgr

                self.bus.publish(
                    "/optical_flow/image_flow",
                    ImageMsg(msg.header, flow_to_bgr(flow)),
                )
        if self.timer:
            self.timer.record(msg.header.stamp, time.perf_counter() - t0)
        self.frames_processed += 1


class DepthNode:
    """Depth image in -> median distance out (reference
    depth_subandpub_node.py:16-85): median over a central ROI (or the whole
    image), times depth_scale, published as RangeMsg."""

    def __init__(self, bus: Bus, depth_scale: float = 0.001, roi: int = 250,
                 depth_mode: str = "roi", direct: bool = True):
        self.bus = bus
        self.depth_scale = depth_scale
        self.roi = roi
        self.depth_mode = depth_mode
        self._sub = bus.subscribe(
            "/camera/aligned_depth_to_color/image_raw", self._callback, direct=direct
        )

    def _callback(self, msg: ImageMsg):
        depth = msg.data
        if self.depth_mode == "roi":
            H, W = depth.shape[:2]
            r = self.roi // 2
            cy, cx = H // 2, W // 2
            depth = depth[max(cy - r, 0) : cy + r, max(cx - r, 0) : cx + r]
        valid = depth[depth > 0]
        if valid.size == 0:
            return
        median = float(np.median(valid)) * self.depth_scale
        self.bus.publish(
            "/camera/depth/median_distance", RangeMsg(msg.header, median)
        )


class JunctionMaskFlowNode(FlowNode):
    """Junction-masked flow (reference sub_n_pub_lfn3_node.py:142-267):
    time-synchronized image + junction PointCloud, flow aggregated only over
    11x11 boxes around each junction."""

    def attach(self, bus: Bus | None = None, direct: bool = True):
        if bus is not None:
            self.bus = bus
        self._sync = ApproximateTimeSynchronizer(
            self.bus,
            ["/camera/color/image_raw", "/junction_detector/junctions"],
            self._synced_callback,
            queue_size=10,
            slop=0.01,
            direct=direct,
        )
        self._subs.extend(self._sync._subs)
        self._subs.append(
            self.bus.subscribe("/camera/color/camera_info",
                               lambda m: self.vel.set_fx(m.fx), direct=direct)
        )
        self._subs.append(
            self.bus.subscribe("/camera/depth/median_distance",
                               lambda m: self.vel.set_depth(m.range), direct=direct)
        )
        return self

    def _synced_callback(self, img_msg: ImageMsg, junc_msg: PointCloudMsg):
        mask = junction_mask(
            img_msg.data.shape[:2], junc_msg.points, self.p.junction_box
        )
        if self.p.publish_debug_images:
            self.bus.publish(
                "/optical_flow/image_mask",
                ImageMsg(img_msg.header, (mask * 255).astype(np.uint8), "mono8"),
            )
        self._image_callback(img_msg, mask)


# ---------------------------------------------------------------- backends

def make_farneback_backend(**kwargs):
    """Jitted Farneback backend; kwargs forwarded to
    classical.calc_optical_flow_farneback."""
    import functools
    import jax

    from ..classical import calc_optical_flow_farneback

    fn = jax.jit(functools.partial(calc_optical_flow_farneback, **kwargs))

    def backend(prev, cur, dt):
        return np.asarray(fn(prev, cur))

    return backend


def _bgr_to_gray_np(frame: np.ndarray) -> np.ndarray:
    """Host-side BT.601 gray (matches core.color.bgr_to_gray / cv2 BGR2GRAY)."""
    f = frame.astype(np.float32)
    return 0.114 * f[..., 0] + 0.587 * f[..., 1] + 0.299 * f[..., 2]


def make_model_backend(estimate_fn, bgr_to_rgb: bool = False):
    """Wrap a model ``estimate``-style callable (img1, img2) -> flow.  The
    node delivers the original uint8 BGR frame (``backend.wants_color``); this
    converts to float [0,1] HWC for the net — the reference's per-frame
    preprocessing (lfn3_node.py:161-177).  Our model ``estimate`` contracts
    take BGR (the sniklaus-checkpoint convention, models/liteflownet.py:132),
    so the default keeps BGR; pass ``bgr_to_rgb=True`` for RGB-trained nets.
    Grayscale inputs are stacked to 3 channels as a fallback.  NaN/Inf outputs
    are scrubbed to zero (the reference does the same for its fp16 NeuFlow
    path, neuflow_node.py:145)."""

    def backend(prev, cur, dt):
        def prep(x):
            x = x.astype(np.float32) / 255.0
            if x.ndim == 2:
                return np.repeat(x[..., None], 3, -1)
            return x[..., ::-1] if bgr_to_rgb else x

        flow = np.asarray(estimate_fn(prep(prev), prep(cur)))
        return np.nan_to_num(flow, nan=0.0, posinf=0.0, neginf=0.0)

    backend.wants_color = True
    return backend


class JunctionDetectorNode:
    """Image in -> junction PointCloud out (the C++ detector's node wrapper;
    reference fishnet_detector_ros.cpp:29-93).  Publishes only when >= 4
    junctions are found, like the reference."""

    def __init__(self, bus: Bus, grid_area: float = 200.0, area_tol: float = 2.0,
                 cluster_eps: float = 6.0, min_publish: int = 4,
                 direct: bool = True, force_python: bool = False,
                 rotated: bool = False):
        from ..native import detect_junctions

        self._detect = detect_junctions
        self.bus = bus
        self.grid_area = grid_area
        self.area_tol = area_tol
        self.cluster_eps = cluster_eps
        self.min_publish = min_publish
        self.force_python = force_python
        self.rotated = rotated
        self._sub = bus.subscribe("/camera/color/image_raw", self._callback,
                                  direct=direct)

    def _callback(self, msg: ImageMsg):
        img = msg.data
        if img.ndim != 3 or img.shape[2] != 3:
            return
        pts = self._detect(
            img, grid_area=self.grid_area, area_tol=self.area_tol,
            cluster_eps=self.cluster_eps, force_python=self.force_python,
            rotated=self.rotated,
        )
        if len(pts) >= self.min_publish:
            self.bus.publish(
                "/junction_detector/junctions", PointCloudMsg(msg.header, pts)
            )


class LKVelocityNode:
    """Sparse Lucas-Kanade velocity node: track good features between frames
    and publish mean/median point displacement as metric velocity — the
    reference's classical ``lucas_kanade_node`` capability (named by
    scripts/monitor.sh:16-20; BASELINE config 2).

    Corners are re-detected every ``redetect_every`` frames (cv2
    goodFeaturesToTrack on host), tracked with the jitted pyramidal-LK in
    between.  The point count is padded static so one compile serves the
    stream.
    """

    def __init__(self, bus: Bus, params: NodeParams | None = None,
                 max_corners: int = 200, redetect_every: int = 10,
                 win_size: int = 21, max_level: int = 3, direct: bool = True):
        self.bus = bus
        self.p = params or NodeParams(name="LK", aggregate="median")
        self.vel = VelocityEstimator(
            self.p.pixel_to_meter, self.p.aggregate, self.p.smooth_window,
            self.p.max_speed,
        )
        self.max_corners = max_corners
        self.redetect_every = redetect_every
        self.win_size = win_size
        self.max_level = max_level
        self._prev: tuple[np.ndarray, float] | None = None
        self._pts: np.ndarray | None = None
        self._since_detect = 0
        self.frames_processed = 0
        self._subs = [
            bus.subscribe("/camera/color/image_raw", self._callback, direct=direct),
            bus.subscribe("/camera/color/camera_info",
                          lambda m: self.vel.set_fx(m.fx), direct=direct),
            bus.subscribe("/camera/depth/median_distance",
                          lambda m: self.vel.set_depth(m.range), direct=direct),
        ]

    def _detect(self, gray: np.ndarray) -> np.ndarray:
        import cv2

        pts = cv2.goodFeaturesToTrack(
            gray.astype(np.uint8), self.max_corners, 0.01, 8
        )
        pts = np.zeros((0, 2), np.float32) if pts is None else pts.reshape(-1, 2)
        # pad to a static count so the jit compiles once (padding tracks a
        # harmless interior point and is masked out of the velocity)
        n = len(pts)
        out = np.full((self.max_corners, 2), np.nan, np.float32)
        out[:n] = pts[: self.max_corners]
        H, W = gray.shape
        out[n:] = (W / 2.0, H / 2.0)
        self._n_valid = min(n, self.max_corners)
        return out

    def _callback(self, msg: ImageMsg):
        try:
            from ..classical import calc_optical_flow_pyr_lk

            frame = msg.data
            gray = (
                _bgr_to_gray_np(frame)
                if frame.ndim == 3 else frame.astype(np.float32)
            )
            if self._prev is None or self._pts is None or self._since_detect >= self.redetect_every:
                self._pts = self._detect(gray)
                self._since_detect = 0
                if self._prev is None:
                    self._prev = (gray, msg.header.stamp)
                    return
            prev, t_prev = self._prev
            self._prev = (gray, msg.header.stamp)
            dt = msg.header.stamp - t_prev
            res = calc_optical_flow_pyr_lk(
                prev, gray, self._pts,
                win_size=(self.win_size, self.win_size),
                max_level=self.max_level,
            )
            tracked = np.asarray(res.pts)
            ok = np.asarray(res.status, bool)
            ok[self._n_valid:] = False
            disp = tracked[ok] - self._pts[ok]
            self._since_detect += 1
            if len(disp) < 4:
                self._pts = None  # force re-detect
                return
            agg = np.median if self.p.aggregate == "median" else np.mean
            vx, vx_smooth = self.vel.update_from_displacement(
                float(agg(disp[:, 0])), dt
            )
            name = self.p.name
            self.bus.publish(f"/optical_flow/{name}_velocity",
                             Vector3StampedMsg(msg.header, vx))
            self.bus.publish(
                f"/optical_flow/{name}_smooth_velocity",
                Vector3StampedMsg(msg.header, vx_smooth),
            )
            # keep tracking from the new positions
            new_pts = self._pts.copy()
            new_pts[ok] = tracked[ok]
            self._pts = new_pts
            self.frames_processed += 1
        except Exception:
            import traceback

            traceback.print_exc()
