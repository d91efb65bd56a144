"""Multi-chip scale-out: device mesh, sharding rules, sharded steps.

The reference is single-GPU; its only concurrency is a per-node process model
and a capture/inference thread pair (SURVEY.md §2.3).  The TPU-native
scale-out story replaces that with SPMD over an ICI mesh:

- **data axis**: frame pairs / camera streams sharded across chips (the
  multi-stream batching of BASELINE config 5),
- **model axis**: spatial sharding of the image height for big frames —
  XLA's SPMD partitioner inserts the halo exchanges convolutions need, so the
  same model code runs 1-chip or N-chip.

``make_mesh`` builds a mesh from the available devices;
``train.train_step``/``train.make_sharded_train_step`` give RAFT-small a
pjit-sharded supervised training step (sequence EPE loss).
"""
from .mesh import make_mesh, batch_sharding, replicated
from .train import make_train_state, train_step, make_sharded_train_step
from .infer import (
    make_sharded_flow_fn,
    make_sharded_stream_fn,
    make_spatial_sharded_flow_fn,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "make_train_state",
    "train_step",
    "make_sharded_train_step",
    "make_sharded_flow_fn",
    "make_sharded_stream_fn",
    "make_spatial_sharded_flow_fn",
]
