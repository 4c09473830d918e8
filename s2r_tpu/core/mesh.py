"""Device mesh + sharding helpers.

The reference's entire distributed substrate is single-process
nn.DataParallel with a thread-queue synchronized BatchNorm
(reference: modeling/sync_batchnorm/{batchnorm,comm,replicate}.py).

The TPU-native equivalent is SPMD over a jax.sharding.Mesh: the train step is
jitted once, the batch dimension carries a NamedSharding over the 'data' axis,
and every global reduction in the traced program (gradient means, BatchNorm
batch statistics) lowers to an XLA psum over ICI.  There is no replication
callback, no master/slave rendezvous, and no per-layer host synchronization.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"


def make_mesh(num_devices: Optional[int] = None,
              devices: Optional[Sequence[jax.Device]] = None,
              spatial: int = 1) -> Mesh:
    """Device mesh over local devices.

    `spatial == 1` (the reference scope, SURVEY.md §2.2): a 1-D pure
    data-parallel mesh.  `spatial > 1`: a 2-D ('data', 'space') mesh —
    batches shard N over 'data' and the image H axis over 'space', so one
    sample's activations are split across `spatial` chips (GSPMD inserts
    the conv halo exchanges; the analogue of sequence parallelism for this
    conv workload).  Train-time spatial sharding is how crops too large
    for one chip's HBM train at all.
    """
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    if spatial <= 1:
        return Mesh(np.asarray(devices), (DATA_AXIS,))
    if len(devices) % spatial:
        raise ValueError(f"spatial={spatial} must divide the device count "
                         f"({len(devices)})")
    arr = np.asarray(devices).reshape(len(devices) // spatial, spatial)
    return Mesh(arr, (DATA_AXIS, SPACE_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a [N, ...] array's leading (batch) dimension over the mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))


def leaf_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Batch sharding for one array: N over 'data', plus H (dim 1) over
    'space' when the mesh has a spatial axis and the array has an H dim
    ([N, H, W(, C)] images/labels; rank-1 per-sample leaves stay
    data-sharded only)."""
    if SPACE_AXIS in mesh.axis_names and ndim >= 3:
        return NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_global(x, sharding: NamedSharding):
    """Device-put a host array with `sharding`, multi-host aware.

    Single-process: plain device_put.  Multi-process (jax.distributed
    initialized, mesh spanning all hosts): `x` is this process's LOCAL
    slice for dims carrying a mesh axis (e.g. the per-host batch shard) and
    the full host-identical array for replicated dims; the global jax.Array
    is assembled without any cross-host data movement.
    """
    pc = jax.process_count()
    if pc == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    global_shape = list(x.shape)
    for d, axis in enumerate(sharding.spec):
        # Only the 'data' axis spans processes (loader slices are per-host
        # batch shards); a 'space' axis lives within each host's devices,
        # so H is host-complete and its global extent equals the local one.
        if axis == DATA_AXIS:
            global_shape[d] *= pc
    return jax.make_array_from_process_local_data(sharding, x,
                                                  tuple(global_shape))


def shard_batch(batch, mesh: Mesh):
    """Device-put a pytree of host arrays with batch-dim sharding (plus
    H-dim sharding on a 2-D ('data', 'space') mesh).

    Multi-host: each process passes its local batch shard (see
    data/loader.py per-host strided slicing); the result is the global
    batch."""
    return jax.tree.map(
        lambda x: put_global(x, leaf_sharding(mesh, np.ndim(x))), batch)


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the H (dim 1) axis of [N, H, ...] arrays over the mesh.

    Convolutions under GSPMD spatial partitioning get their halo exchanges
    inserted by XLA automatically, so a full-resolution (e.g. 2048x1024)
    image can be evaluated across chips that it would not fit on — the
    analogue of sequence parallelism for this conv workload (SURVEY.md §5).

    On a 2-D ('data', 'space') training mesh, H splits over BOTH axes —
    otherwise each 'space' pair would hold a replica and eval could OOM on
    images the train step fits (--spatial-shard x --eval-spatial-shard).
    """
    if SPACE_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P(None, (DATA_AXIS, SPACE_AXIS)))
    return NamedSharding(mesh, P(None, DATA_AXIS))


def shard_spatial(batch, mesh: Mesh):
    """Device-put eval batches with the image/label H axis sharded."""
    if jax.process_count() > 1:
        raise NotImplementedError(
            "--eval-spatial-shard is single-process; multi-host eval uses "
            "per-host batch sharding instead")
    sharding = spatial_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: put_global(x, sharding), tree)
