"""Middlebury .flo flow-file IO.

The reference writes .flo with the 'PIEH' float magic (bytes 80,73,69,72)
followed by int32 width/height and HWC float32 data (reference
pytorch_pwc_master/run.py:318-330)."""
from __future__ import annotations

import numpy as np

_MAGIC = 202021.25  # 'PIEH' interpreted as float32


def write_flo(path: str, flow: np.ndarray) -> None:
    flow = np.asarray(flow, np.float32)
    assert flow.ndim == 3 and flow.shape[2] == 2, "flow must be [H, W, 2]"
    H, W = flow.shape[:2]
    with open(path, "wb") as f:
        np.float32(_MAGIC).tofile(f)
        np.int32(W).tofile(f)
        np.int32(H).tofile(f)
        flow.tofile(f)


def read_flo(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        magic = np.fromfile(f, np.float32, 1)[0]
        assert magic == np.float32(_MAGIC), f"bad .flo magic {magic}"
        W = int(np.fromfile(f, np.int32, 1)[0])
        H = int(np.fromfile(f, np.int32, 1)[0])
        data = np.fromfile(f, np.float32, H * W * 2)
    return data.reshape(H, W, 2)
