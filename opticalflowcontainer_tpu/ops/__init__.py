"""Flow-specific compute ops.

- :func:`local_correlation` — the generalized local cost volume covering every
  correlation config in the reference model zoo (FlowNet2-style CUDA extension
  and both sniklaus CuPy kernels).
- :func:`all_pairs_correlation`, :func:`corr_pyramid`, :func:`corr_lookup` —
  the RAFT correlation-volume path.
- :func:`unfold` — patch extraction (torch ``F.unfold`` analogue) for the
  LiteFlowNet regularization module.

Each op has a pure-lax implementation (differentiable, CPU-testable).
``correlation_pallas`` holds a Pallas TPU correlation kernel that measured
~11% SLOWER than XLA's lax form at the model shapes (both bandwidth-bound),
so :func:`local_correlation` ships the lax form unconditionally — the Pallas
kernel is kept, tested, and honestly demoted, not dispatched.
"""
from .correlation import local_correlation, correlation_lax
from .allpairs import (
    all_pairs_correlation,
    corr_pyramid,
    corr_lookup,
    pack_corr_pyramid,
)
from .unfold import unfold

__all__ = [
    "local_correlation",
    "correlation_lax",
    "all_pairs_correlation",
    "corr_pyramid",
    "corr_lookup",
    "pack_corr_pyramid",
    "unfold",
]
