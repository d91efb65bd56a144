"""Patch extraction (torch ``F.unfold`` analogue) in NHWC.

Needed by the LiteFlowNet/LFN3 Regularization modules, which compute
distance-weighted local averages of flow over k x k neighborhoods
(reference liteflownet.py:192-204).  SURVEY.md flags the materialized
[k^2, H, W] unfold as memory-heavy; callers on TPU should prefer fusing the
weighted sum (XLA fuses the stack+multiply+reduce chain), which this layout
makes straightforward.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def unfold(x: jax.Array, ksize: int, padding: int | None = None) -> jax.Array:
    """[..., H, W, C] -> [..., H, W, k*k, C]: the k x k neighborhood of each
    pixel (zero padding, default pad = k//2 keeps spatial dims)."""
    if padding is None:
        padding = ksize // 2
    H, W = x.shape[-3], x.shape[-2]
    cfg = [(0, 0)] * (x.ndim - 3) + [(padding, padding), (padding, padding), (0, 0)]
    xp = jnp.pad(x, cfg)
    patches = []
    for dy in range(ksize):
        for dx in range(ksize):
            patches.append(xp[..., dy : dy + H, dx : dx + W, :])
    return jnp.stack(patches, axis=-2)
