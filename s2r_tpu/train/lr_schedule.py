"""Per-iteration learning-rate schedules, traceable under jit.

Capability parity with reference utils/lr_scheduler.py:13-70 (LR_Scheduler):
- poly: lr * (1 - T/N)^0.9
- cos:  0.5 * lr * (1 + cos(T/N * pi))
- step: lr * 0.1^(epoch // lr_step)
- optional linear warmup over warmup_epochs
where T = epoch * iters_per_epoch + i is the global step and
N = epochs * iters_per_epoch.

The reference mutates optimizer param groups on the host every step
(train.py:173-176).  Here the schedule is a pure function of the step counter
evaluated *inside* the jitted train step — zero host work.  The reference's
1x/10x group rule (lr_scheduler.py:63-70) is applied via per-leaf LR
multipliers in s2r_tpu.train.optim.
"""

from __future__ import annotations

import jax.numpy as jnp


def make_lr_schedule(mode: str, base_lr: float, num_epochs: int,
                     iters_per_epoch: int, lr_step: int = 0,
                     warmup_epochs: int = 0):
    total = max(num_epochs * iters_per_epoch, 1)
    warmup_iters = warmup_epochs * iters_per_epoch
    if mode == "step" and not lr_step:
        raise ValueError("step schedule requires lr_step")

    def schedule(step) -> jnp.ndarray:
        t = jnp.asarray(step, jnp.float32)
        if mode == "poly":
            lr = base_lr * jnp.maximum(1.0 - t / total, 0.0) ** 0.9
        elif mode == "cos":
            lr = 0.5 * base_lr * (1.0 + jnp.cos(t / total * jnp.pi))
        elif mode == "step":
            epoch = jnp.floor(t / iters_per_epoch)
            lr = base_lr * 0.1 ** jnp.floor(epoch / lr_step)
        else:
            raise NotImplementedError(mode)
        if warmup_iters > 0:
            lr = jnp.where(t < warmup_iters, lr * t / warmup_iters, lr)
        return lr.astype(jnp.float32)

    return schedule
