"""Checkpoint save/restore: one msgpack blob for the whole TrainState pytree.

The reference maintains two incompatible torch checkpoint schemas — a 4-model
dict (train.py:242-253) and a single state_dict (train_adapt.py:204-209).
Here every method's state is a single pytree (params + batch_stats + all
optimizer states + step), serialized with flax msgpack; reference-format
torch checkpoints are imported via s2r_tpu.io.torch_import.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import flax.serialization
import jax
import numpy as np


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state, epoch: int, best_pred: float,
                    extra: Optional[Dict[str, Any]] = None) -> None:
    payload = {
        "epoch": int(epoch),
        "best_pred": float(best_pred),
        "state": flax.serialization.to_state_dict(_to_host(state)),
        "extra": extra or {},
    }
    blob = flax.serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)  # atomic: no torn checkpoints on crash


def load_checkpoint(path: str, state_template=None) -> Dict[str, Any]:
    """Returns {'epoch', 'best_pred', 'state', 'extra'}; if a template
    TrainState is given, 'state' is restored onto it (dtypes/pytree
    structure validated)."""
    with open(path, "rb") as f:
        payload = flax.serialization.msgpack_restore(f.read())
    if state_template is not None:
        payload["state"] = flax.serialization.from_state_dict(
            state_template, payload["state"])
    return payload
