"""Benchmark: output-space-adaption train-step throughput on one chip.

Metric (BASELINE.md): 1024x512 train images/sec/chip — source images
processed per second by the full adversarial train step (G forward/backward
on source AND target + D update + optimizer application), DeepLab-V3+/
MobileNetV2 @ 512x1024, bf16 compute.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no speed numbers (SURVEY.md §6).  The
denominator is an estimated 8 img/s for the reference PyTorch DataParallel
loop on one V100-class GPU at this resolution (typical published
AdaptSegNet-style training rates) — a documented estimate, not a
measurement.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

REFERENCE_IMG_PER_SEC_ESTIMATE = 8.0
H, W = 512, 1024


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true",
                        help="fewer timing iterations")
    parser.add_argument("--batch-size", type=int, default=0,
                        help="0 = auto-pick")
    parser.add_argument("--precision", type=str, default="bf16")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_prng_impl", "rbg")

    from s2r_tpu.config import Config
    from s2r_tpu.core.mesh import make_mesh, replicate, shard_batch
    from s2r_tpu.train.setup import build_method

    n_dev = 1  # per-chip metric
    batch = args.batch_size or 8
    cfg = Config(crop_size=H, base_size=H, batch_size=batch, epochs=200,
                 precision=args.precision, dataset="synthetic")
    method = build_method(cfg, iters_per_epoch=1000, method="output_adapt")
    state = method.init_state(jax.random.PRNGKey(0))
    mesh = make_mesh(n_dev)
    state = replicate(state, mesh)

    rng = np.random.RandomState(0)
    host_batch = {
        "src_image": rng.randn(batch, H, W, 3).astype(np.float32),
        "src_label": rng.randint(0, 19, (batch, H, W)).astype(np.int32),
        "tgt_image": rng.randn(batch, H, W, 3).astype(np.float32),
    }
    dev_batch = shard_batch(host_batch, mesh)

    step = jax.jit(method.step_fn, donate_argnums=0)
    # compile + warmup
    for _ in range(2 if args.quick else 3):
        state, metrics = step(state, dev_batch)
    jax.block_until_ready(state.params)

    iters = 5 if args.quick else 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, dev_batch)
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0

    img_per_sec = batch * iters / dt
    print(json.dumps({
        "metric": "1024x512 train images/sec/chip (output-space adaption)",
        "value": round(img_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_sec / REFERENCE_IMG_PER_SEC_ESTIMATE, 2),
    }))


if __name__ == "__main__":
    main()
