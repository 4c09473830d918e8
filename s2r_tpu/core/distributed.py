"""Multi-host (DCN) process-group initialization.

The reference is strictly single-process (SURVEY.md §2.2: no
torch.distributed anywhere); its multi-device story ends at one host.  The
TPU framework scales past one host with JAX's distributed runtime: every
host calls `maybe_initialize()` before first backend use, then the same
jitted, batch-sharded train step runs SPMD across all slices — in-slice
reductions ride ICI, cross-host coordination rides DCN.

Per-host input sharding: each process feeds its local slice of the global
batch.  The DataLoader derives sample RNG from (seed, epoch, index), so
hosts agree on the epoch permutation and take disjoint strided slices
(`process_index::process_count`).
"""

from __future__ import annotations

import os
from typing import Optional


def maybe_initialize(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when configured; returns True if a
    multi-process group was set up.

    Configuration comes from the arguments or standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or the
    TPU-pod auto-detection built into jax.distributed.initialize).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    num_processes = num_processes if num_processes is not None else (
        int(env_np) if env_np else None)
    process_id = process_id if process_id is not None else (
        int(env_pid) if env_pid else None)
    if not coordinator_address and num_processes is None:
        return False  # single-process run

    import jax

    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_count() > 1


def process_info():
    """(process_index, process_count) of the running JAX process group.

    (0, 1) for single-process runs.  Initializes the backend; call after
    maybe_initialize()."""
    import jax

    return jax.process_index(), jax.process_count()


def local_shard(index_range: int, process_id: int, process_count: int):
    """Strided per-host index assignment for input sharding."""
    return list(range(process_id, index_range, process_count))
