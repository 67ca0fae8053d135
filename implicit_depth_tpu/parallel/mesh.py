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


def replicate(mesh: Mesh, tree):
    """Replicates a pytree of host values onto the mesh.

    Single-process: a plain device_put. Multi-process: built with
    `jax.make_array_from_process_local_data` — each process supplies its
    own (identical, by construction: same seed / same checkpoint) copy
    and NO communication happens. device_put of an uncommitted value
    onto a sharding spanning every process would instead run a
    cross-host `assert_equal` collective (jax dispatch.py) — typically
    the program's FIRST collective, which also bootstraps the gloo/ICI
    transport under its ~30 s key-value timeout; ranks reaching it far
    apart (serialized compiles on a shared core) kill the run."""
    s = replicated(mesh)
    if jax.process_count() == 1:
        return jax.device_put(tree, s)

    def put(x):
        return jax.make_array_from_process_local_data(s, np.asarray(x))

    return jax.tree.map(put, tree)


def shard_batch(mesh: Mesh, batch):
    """Places a pytree of host arrays with batch-axis sharding."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def view_sharding(mesh: Mesh) -> NamedSharding:
    """(batch, views, ...) arrays: batch on data, views on model."""
    return NamedSharding(mesh, P("data", "model"))
