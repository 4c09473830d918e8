"""Async-checkpoint probe: how long does a save stall the train loop?

Measures, on the session's real device, for a resnet101 output-adapt state
(the largest factory state, ~509 MB):
  - sync save:   full blocking cost (device->host pull + msgpack + write)
  - async save:  submit latency (on-device snapshot dispatch; first call
                 includes the snapshot jit compile) and that training steps
                 proceed while the write is in flight

The PARITY.md §Performance async-checkpointing numbers come from here.

Usage:
    PYTHONPATH=/root/repo:$PYTHONPATH python exp/async_save_probe.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp

    from s2r_tpu.config import Config
    from s2r_tpu.io.saver import Saver
    from s2r_tpu.train.setup import build_method

    cfg = Config(crop_size=128, base_size=128, batch_size=8, epochs=1,
                 precision="bf16", backbone="resnet101", dataset="synthetic",
                 checkname="t", run_root="/tmp/async_probe")
    m = build_method(cfg, iters_per_epoch=10, method="output_adapt")
    state = m.init_state(jax.random.PRNGKey(0))
    jax.block_until_ready(state)
    nbytes = sum(x.nbytes for x in jax.tree.leaves(state))
    print(f"state: {nbytes / 1e6:.0f} MB")

    rng = np.random.RandomState(0)
    batch = {
        "src_image": jnp.asarray(rng.randn(8, 128, 128, 3), jnp.float32),
        "src_label": jnp.asarray(rng.randint(0, 19, (8, 128, 128)),
                                 jnp.int32),
        "tgt_image": jnp.asarray(rng.randn(8, 128, 128, 3), jnp.float32),
    }
    step = jax.jit(m.step_fn, donate_argnums=0)
    state, _ = step(state, batch)
    jax.block_until_ready(state)  # compile

    sv_s = Saver(Config(**{**cfg.__dict__, "async_save": False,
                           "checkname": "s"}))
    t0 = time.perf_counter()
    sv_s.save_checkpoint(state, 1, 0.5, is_best=False)
    print(f"sync save blocks the loop for "
          f"{time.perf_counter() - t0:.2f}s")

    sv_a = Saver(Config(**{**cfg.__dict__, "checkname": "a"}))
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        state, _ = step(state, batch)
    jax.block_until_ready(state)
    t_steps = time.perf_counter() - t0

    t0 = time.perf_counter()
    sv_a.save_checkpoint(state, 1, 0.5, is_best=False)
    t_submit = time.perf_counter() - t0
    for _ in range(n):
        state, _ = step(state, batch)
    jax.block_until_ready(state)
    t_overlap = time.perf_counter() - t0
    sv_a.wait()
    t_all = time.perf_counter() - t0
    print(f"async submit returns in {t_submit:.2f}s "
          f"(first call includes the snapshot jit compile)")
    print(f"{n} steps alone: {t_steps:.2f}s; {n} steps with the save in "
          f"flight: {t_overlap:.2f}s; until the write hit disk: "
          f"{t_all:.2f}s")


if __name__ == "__main__":
    main()
