"""Device mesh and sharding helpers.

The reference's only distribution strategy is DDP data parallelism over
NCCL (train_bd.py:145-159; SURVEY.md §2.6). The TPU-native equivalent is
a jax.sharding.Mesh with a `data` axis: batches are sharded over it and
GSPMD inserts the gradient all-reduce. An optional `model` axis shards
the source-view axis of the matching/warp stage (all-gathered into the
volume by XLA) for very large resolutions — an axis the reference does
not have.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence] = None,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"{data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Places a pytree of host arrays with batch-axis sharding."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def view_sharding(mesh: Mesh) -> NamedSharding:
    """(batch, views, ...) arrays: batch on data, views on model."""
    return NamedSharding(mesh, P("data", "model"))
