"""Mixed-precision policy.

TPU MXU natively multiplies bf16 with f32 accumulation; the default policy is
bf16 activations/conv inputs, f32 parameters, f32 BatchNorm statistics and
loss arithmetic.  'f32' runs everything in float32 (used for parity tests
against the reference's float32 torch checkpoints).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    compute_dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @classmethod
    def from_name(cls, name: str) -> "Policy":
        if name == "bf16":
            return cls(compute_dtype=jnp.bfloat16)
        if name == "f32":
            return cls(compute_dtype=jnp.float32)
        raise ValueError(f"unknown precision policy: {name!r}")
