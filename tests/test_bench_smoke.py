"""Every bench leg's imports AND programs execute on tiny CPU shapes.

Round 4's driver bench recorded 0.0 fields/s because the multistream leg
imported names ``classical/__init__`` never exported — and no test imported
bench.py, while ``--quick`` (the builder's smoke mode) skipped exactly that
leg (VERDICT r4 weak #1).  ``bench.py --smoke`` runs EVERY leg — headline,
EPE check, roofline, LK, multistream (device + e2e), stream, LFN3 stream —
on tiny frames so a broken import or traced program in any leg fails CI,
not the driver's one recorded run per round.
"""
import json
import os
import sys

import pytest


def test_bench_smoke_all_legs(capsys):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    rc = bench._bench_main([
        "--smoke", "--json-only", "--height", "48", "--width", "64",
        "--reps", "2",
    ])
    out = capsys.readouterr().out.strip().splitlines()
    assert rc == 0
    rec = json.loads(out[-1])
    # headline leg measured something real
    assert rec["value"] > 0.0
    assert rec["metric"] == "farneback_48p_fields_per_sec"
    # EPE leg ran (tiny frames, so only sanity-bounded)
    assert "epe_vs_cv2_px" in rec
    # roofline leg
    assert rec.get("hbm_ceiling_gbps", 0) > 0 or \
        rec.get("roofline_ceiling_unreliable")
    # sparse-LK leg
    assert rec.get("lk_tracks_per_sec", 0) > 0
    # multistream leg: device number AND the e2e MultiStreamFlow run
    assert rec.get("multistream_2x1080p_device_fields_per_sec", 0) > 0
    assert "multistream_2x1080p_e2e_fields_per_sec" in rec
    assert isinstance(rec.get("multistream_meets_120"), bool)
    # streaming legs
    assert rec.get("stream_device_ms_per_frame", 0) > 0
    assert rec.get("lfn3_device_ms_per_frame", 0) > 0


def test_bench_crash_handler_emits_measured_record(capsys, monkeypatch):
    """An exception in a LATE leg must emit the record-so-far (with the
    measured headline), not a fresh zeroed record (VERDICT r4 weak #2)."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench
    from opticalflowcontainer_tpu.runtime import fused

    def boom(*a, **kw):
        raise RuntimeError("injected late-leg failure")

    # the stream leg runs AFTER the headline + multistream legs
    monkeypatch.setattr(fused, "measure_stream_latency", boom)
    rc = bench.main([
        "--smoke", "--json-only", "--height", "48", "--width", "64",
        "--reps", "2", "--no-multistream", "--no-lk", "--no-roofline",
        "--no-check-epe",
    ])
    out = capsys.readouterr().out.strip().splitlines()
    assert rc == 1
    rec = json.loads(out[-1])
    assert "injected late-leg failure" in rec.get("error", "")
    # the already-measured headline survived the crash
    assert rec["value"] > 0.0
