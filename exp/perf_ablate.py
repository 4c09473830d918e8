"""Perf ablation harness for the output-adapt step (run on the real TPU).

Times the full step plus component ablations so optimization targets are
measured, not guessed.  Usage:
    PYTHONPATH=/root/repo:$PYTHONPATH python exp/perf_ablate.py [names...]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_prng_impl", "rbg")
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from s2r_tpu.config import Config
from s2r_tpu.train.setup import build_method

H, W = 512, 1024


def make_batch(batch):
    rng = np.random.RandomState(0)
    return {
        "src_image": jnp.asarray(rng.randn(batch, H, W, 3), jnp.float32),
        "src_label": jnp.asarray(rng.randint(0, 19, (batch, H, W)), jnp.int32),
        "tgt_image": jnp.asarray(rng.randn(batch, H, W, 3), jnp.float32),
    }


def time_step(name, step, state, batch, iters=10, donate=True):
    step = jax.jit(step, donate_argnums=0 if donate else ())
    t0 = time.perf_counter()
    state2, _ = step(state, batch)
    jax.block_until_ready(state2.params)
    compile_s = time.perf_counter() - t0
    # warmup (donated: keep threading new state)
    for _ in range(2):
        state2, _ = step(state2, batch)
    jax.block_until_ready(state2.params)
    t0 = time.perf_counter()
    for _ in range(iters):
        state2, _ = step(state2, batch)
    jax.block_until_ready(state2.params)
    dt = (time.perf_counter() - t0) / iters
    b = batch["src_image"].shape[0]
    print(f"{name:28s} {dt * 1e3:8.2f} ms  {b / dt:7.2f} img/s "
          f"(compile {compile_s:.0f}s)", flush=True)
    return dt


def build(batch=8):
    cfg = Config(crop_size=H, base_size=H, batch_size=batch, epochs=200,
                 precision="bf16")
    m = build_method(cfg, iters_per_epoch=1000, method="output_adapt")
    state = m.init_state(jax.random.PRNGKey(0))
    return m, state


def main():
    names = set(sys.argv[1:]) or {"full8", "full16", "segonly"}
    m, state = build(8)
    batch = make_batch(8)

    if "full8" in names:
        time_step("full step b8", m.step_fn, state, batch)

    if "segonly" in names:
        import jax.numpy as jnp
        from s2r_tpu.train.losses import cross_entropy
        deeplab = m.deeplab

        def seg_step(state, b):
            def loss(pg, bs):
                v = {"params": pg, "batch_stats": bs}
                (logits, _), upd = deeplab.apply(
                    v, b["src_image"], True, mutable=["batch_stats"],
                    rngs={"dropout": jax.random.PRNGKey(1)})
                return cross_entropy(logits, b["src_label"]), upd
            (l, upd), g = jax.value_and_grad(loss, has_aux=True)(
                state.params["G"], state.batch_stats)
            # SGD-ish update to keep buffers comparable
            pg = jax.tree.map(lambda p, gr: p - 1e-4 * gr,
                              state.params["G"], g)
            ns = state.replace(params={**state.params, "G": pg},
                               batch_stats=upd["batch_stats"])
            return ns, {"l": l}
        time_step("seg-only fwd+bwd b8", seg_step, state, batch)

    if "two_fwd" in names:
        deeplab = m.deeplab
        from s2r_tpu.train.losses import cross_entropy

        def two_fwd_step(state, b):
            def loss(pg, bs):
                v = {"params": pg, "batch_stats": bs}
                (sl, _), upd = deeplab.apply(
                    v, b["src_image"], True, mutable=["batch_stats"],
                    rngs={"dropout": jax.random.PRNGKey(1)})
                v2 = {"params": pg, "batch_stats": upd["batch_stats"]}
                (tl, _), upd2 = deeplab.apply(
                    v2, b["tgt_image"], True, mutable=["batch_stats"],
                    rngs={"dropout": jax.random.PRNGKey(2)})
                return (cross_entropy(sl, b["src_label"])
                        + jnp.mean(tl.astype(jnp.float32)) * 0.001), upd2
            (l, upd), g = jax.value_and_grad(loss, has_aux=True)(
                state.params["G"], state.batch_stats)
            pg = jax.tree.map(lambda p, gr: p - 1e-4 * gr,
                              state.params["G"], g)
            ns = state.replace(params={**state.params, "G": pg},
                               batch_stats=upd["batch_stats"])
            return ns, {"l": l}
        time_step("src+tgt fwd+bwd b8", two_fwd_step, state, batch)

    if "full16" in names:
        m16, state16 = build(16)
        time_step("full step b16", m16.step_fn, state16, make_batch(16),
                  iters=6)


if __name__ == "__main__":
    main()
