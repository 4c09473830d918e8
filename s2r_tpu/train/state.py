"""Train state pytrees.

One flax.struct dataclass holds everything a train step mutates: params,
BatchNorm running stats, optimizer states, the global step counter, and the
PRNG key for dropout.  The whole state is a single pytree — checkpointing is
one serialization (vs the reference's two incompatible checkpoint schemas,
SURVEY.md §2.6), donated buffer-for-buffer into the jitted step.

Layout of `params` / `opt_state` per training method:

- source-only / feature adaption (reference train.py:47-82):
    params = {'G': {'backbone', 'aspp', 'decoder'}, 'D': domain params}
    opt_state = {'task': opt over (f=backbone+aspp, y=decoder),
                 'd': opt over D, 'd_inv': opt over f, 'c': opt over (f, y)}
    ('c' is allocated for checkpoint parity but never stepped —
     train.py:202-204 steps only task/d/d_inv.)

- output-space adaption (reference train_adapt.py:45-60):
    params = {'G': deeplab params, 'D': discriminator params}
    opt_state = {'G': SGD(momentum) state, 'D': Adam state}
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax.numpy as jnp


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray          # global iteration counter (int32)
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jnp.ndarray           # PRNG key consumed/split by the step

    @classmethod
    def create(cls, params, batch_stats, opt_state, rng):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=batch_stats, opt_state=opt_state, rng=rng)
