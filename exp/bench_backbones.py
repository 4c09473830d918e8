"""Per-backbone output-adapt step throughput + full-res capability probe.

All timings use donated-state loops (the validated methodology — see
CLAUDE.md / exp/README.md).
"""

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


def bench(backbone, batch, h, w, remat=False, iters=8, method="output_adapt",
          logits_dtype="f32", batch_pad="auto", split_concat=False):
    cfg = Config(crop_size=h, base_size=h, batch_size=batch, epochs=200,
                 precision="bf16", backbone=backbone, remat=remat,
                 logits_dtype=logits_dtype, batch_pad=batch_pad,
                 split_concat=split_concat)
    m = build_method(cfg, iters_per_epoch=1000, method=method)
    state = m.init_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    b = {"src_image": jnp.asarray(rng.randn(batch, h, w, 3), jnp.float32),
         "src_label": jnp.asarray(rng.randint(0, 19, (batch, h, w)),
                                  jnp.int32),
         "tgt_image": jnp.asarray(rng.randn(batch, h, w, 3), jnp.float32)}
    step = jax.jit(m.step_fn, donate_argnums=0)
    try:
        for _ in range(3):
            state, _ = step(state, b)
        jax.block_until_ready(state.params)
        t0 = time.perf_counter()
        for _ in range(iters):
            state, _ = step(state, b)
        jax.block_until_ready(state.params)
        dt = (time.perf_counter() - t0) / iters
        print(f"{backbone:10s} {h}x{w} b{batch} remat={int(remat)} "
              f"logits={logits_dtype} split={int(split_concat)}: "
              f"{dt*1e3:8.2f} ms {batch/dt:7.2f} img/s", flush=True)
    except Exception as e:
        print(f"{backbone:10s} {h}x{w} b{batch} remat={int(remat)} "
              f"logits={logits_dtype}: FAIL {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["xception", "drn"]
    if "resnet_split" in which:
        # same-window split-concat A/B on the resnet101 decoder/ASPP heads
        bench("resnet101", 8, 512, 1024)
        bench("resnet101", 8, 512, 1024, split_concat=True)
    if "xcept_split" in which:
        bench("xception", 8, 512, 1024)
        bench("xception", 8, 512, 1024, split_concat=True)
    if "drn_split" in which:
        bench("drn", 8, 512, 1024)
        bench("drn", 8, 512, 1024, split_concat=True)
    if "xception" in which:
        bench("xception", 8, 512, 1024)
    if "drn" in which:
        bench("drn", 8, 512, 1024)
    if "fullres" in which:
        # full-res Cityscapes train (the reference OOMs a V100 here)
        bench("mobilenet", 8, 1024, 2048, remat=False)
    if "fullres_remat" in which:
        bench("mobilenet", 8, 1024, 2048, remat=True)
