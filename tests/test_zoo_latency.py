"""CI smoke for tools/zoo_latency.py: the table generator's imports AND its
chain programs must execute on tiny CPU shapes (the bench-crash lesson,
VERDICT r4 weak #1 — an untested leg is how a 0.0 gets recorded)."""


def test_zoo_latency_quick_cpu():
    from opticalflowcontainer_tpu.tools.zoo_latency import main

    rows = main(["--cpu", "--quick", "--models", "neuflow_lite"])
    assert len(rows) == 1
    row = rows[0]
    assert row["model"] == "neuflow_lite"
    assert row["dtype"] == "fp32"
    assert row["device_ms_per_frame"] > 0
    assert row["backend"] == "cpu"


def test_zoo_latency_quick_bf16_cpu():
    from opticalflowcontainer_tpu.tools.zoo_latency import main

    rows = main(["--cpu", "--quick", "--bf16", "--models", "neuflow_lite"])
    assert rows and rows[0]["dtype"] == "bf16"
    assert rows[0]["device_ms_per_frame"] > 0
