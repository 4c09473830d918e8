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


def _bench_infer(args):
    """BASELINE config 1: DeepLab batch-1 inference @513x513."""
    import jax
    import jax.numpy as jnp

    from s2r_tpu.core.precision import Policy
    from s2r_tpu.models import DeepLab

    model = DeepLab(output_stride=16, num_classes=19,
                    dtype=Policy.from_name(args.precision).compute_dtype)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 513, 513, 3),
                    jnp.float32)
    v = jax.jit(lambda: model.init({"params": jax.random.PRNGKey(0)}, x,
                                   False))()
    fwd = jax.jit(lambda v, x: model.apply(v, x, False)[0])
    y = fwd(v, x)
    y.block_until_ready()
    iters = 10 if args.quick else 50
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fwd(v, x)
    y.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "metric": "513x513 batch-1 inference images/sec/chip",
        "value": round(1.0 / dt, 2), "unit": "images/sec/chip",
        "vs_baseline": None}))


def _bench_train_source(args):
    """BASELINE config 2: source-only supervised step, batch 4 @513x513."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_prng_impl", "rbg")
    from s2r_tpu.config import Config
    from s2r_tpu.train.setup import build_method

    batch = args.batch_size or 4
    s = 513
    cfg = Config(crop_size=s, base_size=s, batch_size=batch, epochs=50,
                 precision=args.precision, dataset="gtav")
    m = build_method(cfg, iters_per_epoch=1000, method="source_only")
    state = m.init_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    b = {"image": jnp.asarray(rng.randn(batch, s, s, 3), jnp.float32),
         "label": jnp.asarray(rng.randint(0, 19, (batch, s, s)), jnp.int32)}
    step = jax.jit(m.step_fn, donate_argnums=0)
    for _ in range(3):
        state, _ = step(state, b)
    jax.block_until_ready(state.params)
    iters = 5 if args.quick else 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, _ = step(state, b)
    jax.block_until_ready(state.params)
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "metric": "513x513 source-only train images/sec/chip",
        "value": round(batch / dt, 2), "unit": "images/sec/chip",
        "vs_baseline": None}))


def _bench_train_feature(args):
    """BASELINE config 3: feature-space adaption step (train.py method —
    3-optimizer summed-loss update with the domain classifier)."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_prng_impl", "rbg")
    from s2r_tpu.config import Config
    from s2r_tpu.train.setup import build_method

    batch = args.batch_size or 8
    cfg = Config(crop_size=H, base_size=H, batch_size=batch, epochs=200,
                 precision=args.precision)
    m = build_method(cfg, iters_per_epoch=1000, method="feature_adapt")
    state = m.init_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    b = {"src_image": jnp.asarray(rng.randn(batch, H, W, 3), jnp.float32),
         "src_label": jnp.asarray(rng.randint(0, 19, (batch, H, W)),
                                  jnp.int32),
         "tgt_image": jnp.asarray(rng.randn(batch, H, W, 3), jnp.float32)}
    step = jax.jit(m.step_fn, donate_argnums=0)
    for _ in range(2 if args.quick else 3):
        state, _ = step(state, b)
    jax.block_until_ready(state.params)
    iters = 5 if args.quick else 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, _ = step(state, b)
    jax.block_until_ready(state.params)
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "metric": "1024x512 train images/sec/chip (feature-space adaption)",
        "value": round(batch / dt, 2), "unit": "images/sec/chip",
        "vs_baseline": round(batch / dt / REFERENCE_IMG_PER_SEC_ESTIMATE,
                             2)}))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true",
                        help="fewer timing iterations")
    parser.add_argument("--batch-size", type=int, default=0,
                        help="0 = auto-pick")
    parser.add_argument("--precision", type=str, default="bf16")
    parser.add_argument("--mode", type=str, default="train_adapt",
                        choices=["train_adapt", "train_source",
                                 "train_feature", "infer"],
                        help="train_adapt = BASELINE config 4 (the tracked "
                             "metric); train_source = config 2; "
                             "train_feature = config 3; infer = "
                             "config 1 (batch-1 513x513)")
    args = parser.parse_args()
    if args.mode == "infer":
        return _bench_infer(args)
    if args.mode == "train_source":
        return _bench_train_source(args)
    if args.mode == "train_feature":
        return _bench_train_feature(args)

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
