"""Tests for the auxiliary capability set: adaptive pre/post processing,
junction tracking, offline tools, spike dumping, and sharded training."""
import os
import subprocess
import sys

import numpy as np
import pytest


def test_adaptive_backend_pre_and_post(rng):
    from opticalflowcontainer_tpu.runtime.adaptive import (
        AdaptiveParams,
        make_adaptive_backend,
    )

    calls = {}

    def backend(prev, cur, dt):
        calls["shapes"] = (prev.shape, cur.shape)
        flow = np.zeros(prev.shape + (2,), np.float32)
        flow[..., 0] = 2.0
        flow[10, 10] = (100.0, 0.0)  # outlier
        return flow

    wrapped = make_adaptive_backend(
        backend,
        AdaptiveParams(use_clahe=True, flow_median_ksize=3, flow_max_mag=50.0),
    )
    gray = rng.uniform(0, 255, (64, 64)).astype(np.float32)
    out = wrapped(gray, gray, 0.03)
    assert out.shape == (64, 64, 2)
    assert abs(out[32, 32, 0] - 2.0) < 1e-5
    assert out[10, 10, 0] < 50.0  # outlier removed by median+threshold


def test_junction_tracker_matches_displacement():
    from opticalflowcontainer_tpu.runtime.junction_tracking import JunctionTracker

    tr = JunctionTracker(match_gate_px=5.0, min_matches=4)
    pts = np.array([[10, 10], [30, 10], [10, 30], [30, 30], [50, 50]], np.float32)
    tr.add_detection(1.0, pts)
    tr.add_detection(2.0, pts + np.float32([3.0, -1.0]))
    flow = np.zeros((64, 64, 2), np.float32)
    flow[..., 0] = 3.0
    flow[..., 1] = -1.0
    disp, n = tr.track(flow, prev_stamp=1.0, cur_stamp=2.0)
    assert n == 5
    np.testing.assert_allclose(disp, [3.0, -1.0], atol=1e-5)
    # LRU eviction
    for t in range(3, 20):
        tr.add_detection(float(t), pts)
    assert len(tr.history) == 10


def test_run_pair_cli(tmp_path, rng):
    import cv2

    base = cv2.GaussianBlur(rng.uniform(0, 255, (140, 180)).astype(np.float32), (0, 0), 2)
    f1 = np.repeat(base[10:110, 10:150, None], 3, -1).astype(np.uint8)
    f2 = np.repeat(base[10:110, 13:153, None], 3, -1).astype(np.uint8)  # shift +3 in x... (crop shift)
    p1, p2 = str(tmp_path / "a.png"), str(tmp_path / "b.png")
    cv2.imwrite(p1, f1)
    cv2.imwrite(p2, f2)
    out_flo = str(tmp_path / "out.flo")
    out_png = str(tmp_path / "out.png")

    from opticalflowcontainer_tpu.tools.run_pair import main

    assert main([p1, p2, "--out-flo", out_flo, "--out-png", out_png]) == 0
    from opticalflowcontainer_tpu.utils import read_flo

    flow = read_flo(out_flo)
    assert flow.shape == (100, 140, 2)
    # window moved right over content => content moved left => u ~ -3
    assert abs(flow[20:-20, 20:-20, 0].mean() + 3.0) < 0.3
    assert os.path.exists(out_png)


def test_run_pair_delegates_to_eval_methods(monkeypatch, rng):
    """estimate_pair must route EVERY model through the shared eval method
    factory (so --ckpt / packaged weights are honored; the old raft branch
    silently ran random-init params) and convert BGR uint8 -> RGB [0,1]."""
    from opticalflowcontainer_tpu.eval import run_eval
    from opticalflowcontainer_tpu.tools.run_pair import estimate_pair

    seen = {}

    def fake_make(name, ckpt, quick):
        seen.update(name=name, ckpt=ckpt)

        def run(i1, i2):
            seen["rgb01"] = (i1.dtype == np.float32 and i1.max() <= 1.0)
            # input was BGR with a hot blue channel -> RGB puts it last
            seen["channel_order_ok"] = i1[..., 2].mean() > i1[..., 0].mean()
            return np.zeros(i1.shape[:2] + (2,), np.float32)

        return run

    monkeypatch.setattr(run_eval, "_make_method", fake_make)
    img = np.zeros((24, 32, 3), np.uint8)
    img[..., 0] = 200  # BGR blue
    out = estimate_pair(img, img, "raft", "cand.npz")
    assert seen == {"name": "raft", "ckpt": "cand.npz", "rgb01": True,
                    "channel_order_ok": True}
    assert out.shape == (24, 32, 2)


def test_fish_speed_cli(tmp_path, rng, capsys):
    import cv2

    base = cv2.GaussianBlur(rng.uniform(0, 255, (140, 180)).astype(np.float32), (0, 0), 2)
    f1 = np.repeat(base[10:110, 10:150, None], 3, -1).astype(np.uint8)
    f2 = np.repeat(base[10:110, 8:148, None], 3, -1).astype(np.uint8)  # content moves +2
    p1, p2 = str(tmp_path / "a.png"), str(tmp_path / "b.png")
    cv2.imwrite(p1, f1)
    cv2.imwrite(p2, f2)

    from opticalflowcontainer_tpu.tools.fish_speed import main

    assert main([p1, p2, "--dt", "0.1", "--pixel-to-meter", "0.001",
                 "--out-prefix", str(tmp_path / "fs")]) == 0
    out = capsys.readouterr().out
    assert "ROI speed" in out
    assert os.path.exists(str(tmp_path / "fs_flow.png"))


def test_spike_dumper(tmp_path, rng):
    from opticalflowcontainer_tpu.runtime.timing import SpikeDumper

    d = SpikeDumper(out_dir=str(tmp_path / "spikes"), threshold=0.5)
    frame = rng.uniform(0, 255, (32, 32, 3)).astype(np.uint8)
    flow = np.ones((32, 32, 2), np.float32)
    assert d.maybe_dump(frame, flow, vx=0.1) is None
    path = d.maybe_dump(frame, flow, vx=0.9)
    assert path is not None and os.path.exists(path)


def test_sharded_train_step_8dev():
    """The dryrun_multichip contract on the pytest virtual 8-CPU mesh."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_graft_entry_single():
    import jax

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (128, 128, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_accel_monitor_node_log_and_summary(tmp_path, rng):
    """Accelerator leg of the monitor (reference monitor.sh:67 nvidia-smi
    pmon): FlowNode with write_accel_csv samples per-device memory stats
    in-process; tools.monitor summarizes the logs."""
    import time

    from opticalflowcontainer_tpu.runtime import Bus, FlowNode, NodeParams
    from opticalflowcontainer_tpu.runtime.nodes import make_farneback_backend
    from opticalflowcontainer_tpu.tools.monitor import summarize_accel

    node = FlowNode(
        make_farneback_backend(levels=1, winsize=9, iterations=1),
        NodeParams(name="MON", write_accel_csv=True, csv_dir=str(tmp_path)),
        Bus(namespace=""),
    )
    time.sleep(1.5)  # a couple of 1 Hz samples
    node.stop()
    log = tmp_path / "accel_usage_mon.log"
    assert log.exists()
    lines = log.read_text().strip().splitlines()
    assert lines[0].startswith("timestamp,device,")
    assert len(lines) >= 2  # header + >=1 sample row per device
    rows = summarize_accel([str(log)])
    # CPU backend exposes memory stats on recent jaxlib; tolerate absence
    for r in rows:
        assert r["samples"] >= 1 and r["peak_mb"] >= 0.0
