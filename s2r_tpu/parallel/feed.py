"""Host -> device feeding with overlap.

The reference pays a synchronous .cuda() copy at the top of every step
(train_adapt.py:129).  Here batches are device_put with the batch-dim
NamedSharding while the previous step is still executing (JAX transfers are
async), keeping a small in-flight window so the TPU never waits on PCIe/host.

String-valued keys (e.g. 'name') pass through on host.
"""

from __future__ import annotations

import collections
from typing import Dict, Iterable, Iterator

import numpy as np
from jax.sharding import Mesh

from s2r_tpu.core.mesh import leaf_sharding, put_global


def _put(batch: Dict, shardings: Dict):
    out = {}
    for k, v in batch.items():
        if isinstance(v, (list, str)):
            out[k] = v
        else:
            # multi-host aware: v is the per-host batch shard and the
            # result is the global batch array (core/mesh.py::put_global).
            # Per-leaf spec: N over 'data', H over 'space' on 2-D meshes.
            out[k] = put_global(v, shardings[np.ndim(v) >= 3])
    return out


def prefetch_to_device(iterator: Iterable[Dict], mesh: Mesh,
                       size: int = 2) -> Iterator[Dict]:
    """Yield device-resident, batch-sharded batches with `size` in flight."""
    # one NamedSharding per leaf-rank class, hoisted out of the hot loop
    shardings = {True: leaf_sharding(mesh, 3), False: leaf_sharding(mesh, 1)}
    it = iter(iterator)
    buf = collections.deque()
    try:
        for _ in range(size):
            buf.append(_put(next(it), shardings))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(_put(next(it), shardings))
        except StopIteration:
            pass
        yield out
