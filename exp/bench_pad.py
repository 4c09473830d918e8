"""Measure Config.batch_pad on the real TPU: batch-4 output-adapt
(the reference's default per-GPU batch) with pad auto vs off, for
mobilenet and resnet101 backbones."""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_prng_impl", "rbg")
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

from s2r_tpu.config import Config
from s2r_tpu.train.setup import build_method

H, W = 512, 1024


def bench(backbone, batch, pad, iters=10):
    cfg = Config(crop_size=H, base_size=H, batch_size=batch, epochs=200,
                 precision="bf16", backbone=backbone, batch_pad=pad)
    m = build_method(cfg, iters_per_epoch=1000, method="output_adapt")
    state = m.init_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    b = {"src_image": jnp.asarray(rng.randn(batch, H, W, 3), jnp.float32),
         "src_label": jnp.asarray(rng.randint(0, 19, (batch, H, W)),
                                  jnp.int32),
         "tgt_image": jnp.asarray(rng.randn(batch, H, W, 3), jnp.float32)}
    step = jax.jit(m.step_fn, donate_argnums=0)
    for _ in range(3):
        state, _ = step(state, b)
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, _ = step(state, b)
    jax.block_until_ready(state.params)
    dt = (time.perf_counter() - t0) / iters
    print(f"{backbone:12s} b{batch} pad={pad:4s}: {dt*1e3:8.2f} ms "
          f"{batch/dt:7.2f} img/s", flush=True)


if __name__ == "__main__":
    which = set(sys.argv[1:]) or {"mobilenet"}
    if "mobilenet" in which:
        bench("mobilenet", 4, "off")
        bench("mobilenet", 4, "auto")
    if "resnet101" in which:
        bench("resnet101", 4, "off")
        bench("resnet101", 4, "auto")
