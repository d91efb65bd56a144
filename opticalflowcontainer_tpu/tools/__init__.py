"""Offline analysis tools (the reference's L6 tooling layer, SURVEY.md §1):

- ``python -m opticalflowcontainer_tpu.tools.run_pair`` — two-image flow CLI
  with .flo / HSV-PNG outputs (reference pytorch_pwc_master/run.py).
- ``python -m opticalflowcontainer_tpu.tools.fish_speed`` — ROI-based object
  speed from a still pair (reference calcFishSpeed.py).
- ``python -m opticalflowcontainer_tpu.tools.record`` — frame capture from a
  video source to AVI / PNG (reference record_video.py / capture_frame.py,
  sans RealSense).
- ``python -m opticalflowcontainer_tpu.tools.monitor`` — per-process CPU/RSS
  sampling to CSV logs (reference scripts/monitor.sh).
"""
