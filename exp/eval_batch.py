"""eval_fullres batching A/B (round 3): per-image full-res eval cost vs
batch size.

The eval_fullres profile (PARITY.md §Performance) places batch-1 at 66% of
the logical HBM roofline; its [1, 1024, 2048, 19] tensors carry XLA's
N-sublane / C-minor layout, so N=1 pads the sublane dim 1 -> 8 (8x
physical:logical on every full-res activation).  Batching the val sweep
amortizes that padding: this script times the eval step (forward + argmax
+ on-device confusion matrix, exactly bench.py --mode eval_fullres) at
batch 1/2/4/8 and prints ms/image.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python exp/eval_batch.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_prng_impl", "rbg")
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from s2r_tpu.config import Config
from s2r_tpu.train.setup import build_method

H, W = 1024, 2048
ITERS = 20


def main():
    cfg = Config(crop_size=512, base_size=512, batch_size=8, epochs=200,
                 precision="bf16")
    m = build_method(cfg, 1000, method="output_adapt")
    state = m.init_state(jax.random.PRNGKey(0))
    params, bstats = m.eval_variables(state)
    fn = jax.jit(m.eval_step)
    rng = np.random.RandomState(0)
    for b in (1, 2, 4, 8):
        img = jnp.asarray(rng.randn(b, H, W, 3), jnp.float32)
        lbl = jnp.asarray(rng.randint(0, 19, (b, H, W)), jnp.int32)

        # single-dispatch scan + readback (the only valid axon timing for
        # non-donated chains — see CLAUDE.md); carry the confusion matrix
        # so iterations chain.  img/lbl are arguments, not closures — a
        # closed-over batch becomes an HLO constant and the 8x full-res
        # batch overflows the tunnel's compile-request limit (HTTP 413).
        # bench.py _bench_eval_fullres methodology: the image is the scan
        # carry with a loss*1e-30 feedback term, so iterations chain and
        # XLA cannot hoist the (otherwise loop-invariant) eval out of the
        # loop — which it demonstrably does with a plain invariant arg.
        def g_(im, lb):
            def body(carry, _):
                loss, cm, _aux = fn(params, bstats, carry, lb)
                return carry + loss * jnp.float32(1e-30), cm
            return jax.lax.scan(body, im, None, length=ITERS)

        g = jax.jit(g_, donate_argnums=0)
        t0 = time.perf_counter()
        img, cms = g(img, lbl)
        np.asarray(cms[-1])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        img, cms = g(img, lbl)
        np.asarray(cms[-1])
        dt = (time.perf_counter() - t0) / ITERS
        print(f"batch {b}: {dt * 1e3 / b:7.2f} ms/image "
              f"({dt * 1e3:7.2f} ms/step, compile {compile_s:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
