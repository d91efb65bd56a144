"""Mesh + sharding helpers."""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None, data: int | None = None, model: int = 1
) -> Mesh:
    """('data', 'model') mesh over the first data*model devices.

    Defaults: all devices on the data axis (pure DP — the right default for
    frame-pair streaming throughput)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model <= n, f"need {data * model} devices, have {n}"
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, ("data", "model"))


def batch_sharding(mesh: Mesh, spatial_dim: int | None = None) -> NamedSharding:
    """Batch on 'data'; optionally shard one spatial dim on 'model'."""
    if spatial_dim is None:
        return NamedSharding(mesh, P("data"))
    spec = [None] * (spatial_dim + 1)
    spec[0] = "data"
    spec[spatial_dim] = "model"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
