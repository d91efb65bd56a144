"""Backend detection shared by every module that splits its implementation
between the TPU-fast form (banded-matmul sepconvs/resizes, packed gathers)
and the CPU-fast form (shifted slices) — one definition so a new TPU platform
name can never silently route some modules to the slow path."""
from __future__ import annotations

import jax

# platform names that mean "a real TPU is executing" — the sandbox's axon
# tunnel registers as its own platform name rather than "tpu"
_TPU_PLATFORMS = ("tpu", "axon")


def on_tpu() -> bool:
    try:
        return jax.default_backend() in _TPU_PLATFORMS
    except Exception:  # pragma: no cover — backend probing never raised yet
        return False
