"""Flow-specific compute ops.

- :func:`local_correlation` — the generalized local cost volume covering every
  correlation config in the reference model zoo (FlowNet2-style CUDA extension
  and both sniklaus CuPy kernels).
- :func:`all_pairs_correlation`, :func:`corr_pyramid`, :func:`corr_lookup` —
  the RAFT correlation-volume path.
- :func:`unfold` — patch extraction (torch ``F.unfold`` analogue) for the
  LiteFlowNet regularization module.

Each op has a pure-lax implementation (differentiable, CPU-testable); the hot
configs also have Pallas TPU kernels (``correlation_pallas``) selected
automatically on TPU backends via :func:`local_correlation`'s dispatcher.
"""
from .correlation import local_correlation, correlation_lax
from .allpairs import all_pairs_correlation, corr_pyramid, corr_lookup
from .unfold import unfold

__all__ = [
    "local_correlation",
    "correlation_lax",
    "all_pairs_correlation",
    "corr_pyramid",
    "corr_lookup",
    "unfold",
]
