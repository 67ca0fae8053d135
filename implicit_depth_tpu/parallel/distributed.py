"""Multi-host (multi-process) execution (SURVEY.md §2.6).

The reference trains on "any #GPUs" via Lightning DDP over NCCL
(train_bd.py:145-159) with one process per device and DataLoader workers
per process. The TPU-native equivalent here:

- `initialize()` wraps `jax.distributed.initialize` (TPU pods auto-detect
  coordinator/process counts from the environment; explicit args cover
  CPU clusters and tests — gloo collectives are selected automatically
  for the CPU backend),
- a single global `Mesh` spans every chip of every host
  (`parallel.mesh.make_mesh` over `jax.devices()`),
- each process loads only its own shard of every global batch
  (`BatchLoader(shard_id=process_index, num_shards=process_count)`) and
  `global_batch` assembles the per-process host arrays into one global
  jax.Array via `jax.make_array_from_process_local_data` — XLA's psum
  then rides ICI within a slice and DCN across slices.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    shutdown_timeout_seconds: Optional[int] = None,
) -> None:
    """Joins (or forms) the jax.distributed cluster.

    On TPU pods all three args come from the runtime environment and may
    be None. On CPU clusters (tests, CI) pass them explicitly; the gloo
    collectives implementation is selected for cross-process CPU
    collectives.
    """
    # NOTE: no jax.devices()/process_count() here — touching the backend
    # before jax.distributed.initialize is an error. Peek at the
    # distributed client state instead.
    from jax._src import distributed as _dist_state

    if getattr(_dist_state.global_state, "client", None) is not None:
        return  # already initialised
    platforms = str(jax.config.jax_platforms or "")
    if "cpu" in platforms or num_processes is not None:
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass  # option renamed/absent: fall through to jax defaults
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if shutdown_timeout_seconds is not None:
        kwargs["shutdown_timeout_seconds"] = shutdown_timeout_seconds
    jax.distributed.initialize(**kwargs)


def process_info() -> tuple[int, int]:
    """(process_index, process_count)."""
    return jax.process_index(), jax.process_count()


def barrier(name: str, timeout_s: int = 900) -> None:
    """Cross-process rendezvous through the coordination service (NOT an
    XLA collective — safe to call while other ranks are still compiling,
    where a gloo/ICI collective would hit its own op timeout). No-op in
    single-process runs."""
    from jax._src import distributed as _dist_state

    client = getattr(_dist_state.global_state, "client", None)
    if client is not None and jax.process_count() > 1:
        client.wait_at_barrier(name, timeout_s * 1000)


def global_batch(mesh: Mesh, local_batch, spec: P = P("data")):
    """Assembles per-process host arrays into global, mesh-sharded
    jax.Arrays. Each process passes ITS shard of the global batch
    (global_batch_size / process_count leading rows); the result behaves
    like a device_put of the concatenated global batch."""
    sharding = NamedSharding(mesh, spec)

    def put(x):
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree.map(put, local_batch)


