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
    """BASELINE config 1: DeepLab batch-1 inference @513x513.

    Timing methodology: N forwards inside ONE jitted lax.scan whose carry
    feeds an epsilon of each output back into the next input (a true data
    dependency XLA cannot elide), then a host readback.  Independent
    repeated dispatches measure dispatch pipelining, not device time, on
    the axon tunnel (see CLAUDE.md)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from s2r_tpu.core.precision import Policy
    from s2r_tpu.models import DeepLab

    model = DeepLab(output_stride=16, num_classes=19,
                    dtype=Policy.from_name(args.precision).compute_dtype)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 513, 513, 3),
                    jnp.float32)
    v = jax.jit(lambda: model.init({"params": jax.random.PRNGKey(0)}, x,
                                   False))()
    iters = 10 if args.quick else 50

    def chain(v, x):
        def body(xc, _):
            y = model.apply(v, xc, False)[0]
            xc = xc + jnp.float32(1e-30) * y[..., :3].astype(jnp.float32)
            return xc, ()
        return lax.scan(body, x, None, length=iters)[0]

    run = jax.jit(chain, donate_argnums=1)
    x = run(v, x)
    _ = np.asarray(x[0, 0, 0, :])  # compile + settle
    t0 = time.perf_counter()
    x = run(v, x)
    _ = np.asarray(x[0, 0, 0, :])
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "metric": "513x513 batch-1 inference images/sec/chip",
        "value": round(1.0 / dt, 2), "unit": "images/sec/chip",
        "vs_baseline": None}))


def _bench_eval_fullres(args):
    """BASELINE config 5: full-res 2048x1024 eval step (forward + argmax +
    on-device confusion matrix) — the val/val_adapt sweep's inner loop.
    Batch 8 by default: exp/eval_batch.py measured 14.33 (b1) -> 10.72
    ms/image (b8) because N=1 pads the sublane dim; b1 remains the
    latency point (--eval-batch 1).  Same single-dispatch scan methodology
    as _bench_infer."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from s2r_tpu.config import Config
    from s2r_tpu.train.setup import build_method

    cfg = Config(crop_size=512, base_size=512, batch_size=2, epochs=1,
                 precision=args.precision)
    m = build_method(cfg, iters_per_epoch=10, method="output_adapt")
    state = m.init_state(jax.random.PRNGKey(0))
    params, bstats = m.eval_variables(state)
    h, w = 1024, 2048
    b = args.eval_batch
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.randn(b, h, w, 3), jnp.float32)
    label = jnp.asarray(rng.randint(0, 19, (b, h, w)), jnp.int32)
    iters = 5 if args.quick else 20

    def chain(params, bstats, image, label):
        def body(carry, _):
            img = carry
            loss, cm, _pred = m.eval_step(params, bstats, img, label)
            img = img + (loss * jnp.float32(1e-30))
            return img, cm
        return lax.scan(body, image, None, length=iters)

    run = jax.jit(chain, donate_argnums=2)
    image, cms = run(params, bstats, image, label)
    _ = np.asarray(cms[-1])
    t0 = time.perf_counter()
    image, cms = run(params, bstats, image, label)
    _ = np.asarray(cms[-1])
    dt = (time.perf_counter() - t0) / (iters * b)
    print(json.dumps({
        "metric": f"2048x1024 full-res eval ms/image b{b} (fwd + argmax + "
                  "confusion matrix)",
        "value": round(dt * 1e3, 2), "unit": "ms/image",
        "vs_baseline": None}))


def _bench_serve_fullres(args):
    """Deployment path: the exported StableHLO servable (weights baked in,
    rgb8 in -> labels out) at full-res 2048x1024, batch 8.  Scan chain with
    the output threaded into the carry + on-device output slice (the two
    axon timing traps — see CLAUDE.md)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from s2r_tpu.core.precision import Policy
    from s2r_tpu.io.serving import export_servable, load_servable
    from s2r_tpu.models import DeepLab

    n, h, w = (args.batch_size or 8), 1024, 2048
    model = DeepLab(output_stride=16, num_classes=19,
                    dtype=Policy.from_name(args.precision).compute_dtype)
    x0 = jnp.zeros((1, 129, 129, 3), jnp.float32)
    v = jax.jit(lambda: model.init({"params": jax.random.PRNGKey(0)}, x0,
                                   False))()
    path = "/tmp/bench_serve.shlo"
    export_servable(model, v["params"], v["batch_stats"], (n, h, w, 3),
                    path, output="labels", input="rgb8")
    serve = load_servable(path)

    image = jax.device_put(np.random.RandomState(0).randint(
        0, 256, (n, h, w, 3), np.uint8))
    iters = 5 if args.quick else 20

    def chain(img):
        def body(carry, _):
            lab = serve.exported.call(carry)
            bump = lab.ravel()[0].astype(jnp.float32) * jnp.float32(1e-30)
            return carry + bump.astype(carry.dtype), ()
        c, _ = lax.scan(body, img, None, length=iters)
        return c[0, 0, 0, :]

    run = jax.jit(chain)
    _ = np.asarray(run(image))  # compile + settle
    t0 = time.perf_counter()
    _ = np.asarray(run(image))
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "metric": "2048x1024 servable (rgb8->labels) ms/image",
        "value": round(dt * 1e3 / n, 2), "unit": "ms/image",
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


def _ensure_e2e_dataset(root: str, n_src: int = 48, n_tgt: int = 24):
    """Synthetic GTA5/Cityscapes-sized PNG triplets on disk (cached):
    source 1914x1052 RGB + labelIds, target 2048x1024 RGB."""
    import os

    from PIL import Image

    from s2r_tpu.data.datasets import VALID_CLASSES
    from s2r_tpu.data.synthetic import _scene

    stamp = os.path.join(root, f".stamp_{n_src}_{n_tgt}")
    dirs = {k: os.path.join(root, k) for k in ("src", "lbl", "tgt")}
    if os.path.exists(stamp):
        return dirs
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)
    inv = np.asarray(VALID_CLASSES, np.uint8)  # trainId -> raw labelId
    rng = np.random.RandomState(42)
    for i in range(n_src):
        img, lbl = _scene(rng, 1052, 1914)
        raw = np.where(lbl == 255, 0, inv[np.clip(lbl, 0, 18)]).astype(
            np.uint8)
        Image.fromarray(img).save(
            os.path.join(dirs["src"], f"{i:05d}.png"))
        Image.fromarray(raw).save(
            os.path.join(dirs["lbl"], f"{i:05d}.png"))
    for i in range(n_tgt):
        img, _ = _scene(rng, 1024, 2048)
        Image.fromarray(img).save(
            os.path.join(dirs["tgt"], f"{i:05d}.png"))
    with open(stamp, "w") as f:
        f.write("ok")
    return dirs


def _bench_train_e2e(args):
    """END-TO-END train throughput: PNGs on disk -> native C++ pipeline
    (decode + flip + RandomScaleCrop + normalize) -> device transfer ->
    the full output-adapt train step.  Reports e2e img/s plus the host
    pipeline's standalone capacity (this host has few cores; the pipeline
    scales with the thread pool on real TPU-VM hosts)."""
    import os

    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    from s2r_tpu.config import Config
    from s2r_tpu.core.mesh import make_mesh, replicate
    from s2r_tpu.data.native_loader import NativeTrainLoader
    from s2r_tpu.parallel.feed import prefetch_to_device
    from s2r_tpu.train.setup import build_method

    dirs = _ensure_e2e_dataset(os.environ.get("S2R_E2E_DATA",
                                              "/tmp/s2r_e2e_data"))
    batch = args.batch_size or 8
    threads = max(os.cpu_count() or 1, 1) * 2  # decode is zlib-bound
    src = sorted(os.path.join(dirs["src"], f)
                 for f in os.listdir(dirs["src"]))
    tgt = sorted(os.path.join(dirs["tgt"], f)
                 for f in os.listdir(dirs["tgt"]))
    # u8 staging: the pipeline ships uint8 (4x less H2D) and a jitted
    # device pass restores exact f32 normalization semantics
    loader = NativeTrainLoader(src, dirs["lbl"], tgt, base_size=H,
                               crop_size=(H, W), batch_size=batch,
                               threads=threads, blur=False, emit_u8=True)

    # host-only capacity (one epoch through the pipeline, no device)
    import itertools
    import time as _t

    it = iter(loader)
    next(it)  # warm page cache / lib
    t0 = _t.perf_counter()
    n_host = 0
    for b in itertools.islice(it, 4):
        n_host += len(b["src_image"])
    host_rate = n_host / (_t.perf_counter() - t0)

    cfg = Config(crop_size=H, base_size=H, batch_size=batch, epochs=200,
                 precision=args.precision, dataset="synthetic")
    method = build_method(cfg, iters_per_epoch=1000, method="output_adapt")
    state = replicate(method.init_state(jax.random.PRNGKey(0)), make_mesh(1))
    mesh = make_mesh(1)
    step = jax.jit(method.step_fn, donate_argnums=0)

    from s2r_tpu.data.device_aug import normalize_u8_batch
    finish = jax.jit(normalize_u8_batch)

    def epoch_batches():
        for ep in itertools.count():
            loader.set_epoch(ep)
            yield from prefetch_to_device(loader, mesh)

    it = epoch_batches()
    for _ in range(2):  # compile + warmup
        state, _m = step(state, finish(next(it)))
    jax.block_until_ready(state.params)
    iters = 5 if args.quick else 15
    t0 = time.perf_counter()
    for _ in range(iters):
        state, _m = step(state, finish(next(it)))
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0
    e2e = batch * iters / dt
    print(json.dumps({
        "metric": "1024x512 END-TO-END train images/sec/chip "
                  "(PNG disk -> native pipeline -> output-adapt step)",
        "value": round(e2e, 2), "unit": "images/sec/chip",
        "vs_baseline": round(e2e / REFERENCE_IMG_PER_SEC_ESTIMATE, 2),
        "host_pipeline_img_per_sec": round(host_rate, 2),
        "host_cores": os.cpu_count()}))


def _bench_train_e2e_cached(args):
    """END-TO-END with --data-cache (hostcrop path): frames are decoded
    once into the frame cache; steady-state epochs box-resample the crop
    directly from cached frames (no decode, no full-frame resize — see
    data/hostcrop.py), ship uint8 crops, and finish normalization on
    device.  Reports the steady-state (cache-warm) rate."""
    import itertools
    import os

    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    from s2r_tpu.config import Config
    from s2r_tpu.core.mesh import make_mesh, replicate
    from s2r_tpu.data.datasets import TrainSet
    from s2r_tpu.data.device_aug import normalize_u8_batch
    from s2r_tpu.data.loader import DataLoader
    from s2r_tpu.parallel.feed import prefetch_to_device
    from s2r_tpu.train.setup import build_method

    dirs = _ensure_e2e_dataset(os.environ.get("S2R_E2E_DATA",
                                              "/tmp/s2r_e2e_data"))
    batch = args.batch_size or 8
    ds = TrainSet(dirs["src"], dirs["lbl"], dirs["tgt"], H, (H, W),
                  cache=True)
    loader = DataLoader(ds, batch_size=batch, shuffle=True,
                        num_workers=max(os.cpu_count() or 1, 1) * 2)

    cfg = Config(crop_size=H, base_size=H, batch_size=batch,
                 precision=args.precision, dataset="synthetic", epochs=200)
    method = build_method(cfg, iters_per_epoch=1000, method="output_adapt")
    mesh = make_mesh(1)
    state = replicate(method.init_state(jax.random.PRNGKey(0)), mesh)
    step = jax.jit(method.step_fn, donate_argnums=0)
    finish = jax.jit(normalize_u8_batch)

    def batches():
        for ep in itertools.count():
            loader.epoch = ep
            for b in prefetch_to_device(loader, mesh):
                yield finish({k: v for k, v in b.items()
                              if not isinstance(v, list)})

    it = batches()
    warm = len(loader) + 2  # one full epoch fills the cache, + compile
    for _ in range(warm):
        state, _m = step(state, next(it))
    jax.block_until_ready(state.params)
    iters = 5 if args.quick else 15
    t0 = time.perf_counter()
    for _ in range(iters):
        state, _m = step(state, next(it))
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0
    e2e = batch * iters / dt
    print(json.dumps({
        "metric": "1024x512 END-TO-END train images/sec/chip (frame cache "
                  "-> hostcrop u8 -> output-adapt step)",
        "value": round(e2e, 2), "unit": "images/sec/chip",
        "vs_baseline": round(e2e / REFERENCE_IMG_PER_SEC_ESTIMATE, 2),
        "cache_gb": round(ds.cache.nbytes() / 1e9, 2),
        "host_cores": os.cpu_count()}))


def _require_tpu(timeout_s: float = 300.0):
    """Fail fast (with a JSON record) when the axon tunnel is down.

    Backend init on a healthy tunnel completes in seconds; during an
    outage `jax.devices()` hangs ~12 min and then raises UNAVAILABLE
    (CLAUDE.md).  Probing in a daemon thread bounds the wait so the
    driver's bench record is an explicit error line, not a crash."""
    import sys
    import threading

    result = {}

    def _probe():
        try:
            import jax
            result["devices"] = [str(d) for d in jax.devices()]
        except Exception as e:  # noqa: BLE001 - report any init failure
            result["error"] = f"{type(e).__name__}: {e}"

    t = threading.Thread(target=_probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "devices" in result:
        return
    err = result.get(
        "error", f"backend init exceeded {timeout_s:.0f}s "
                 "(axon tunnel down?)")
    print(json.dumps({
        "metric": "1024x512 train images/sec/chip (output-space adaption)",
        "value": None, "unit": "images/sec/chip", "vs_baseline": None,
        "error": f"TPU unavailable: {err}"}))
    sys.exit(1)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true",
                        help="fewer timing iterations")
    parser.add_argument("--batch-size", type=int, default=0,
                        help="0 = auto-pick")
    parser.add_argument("--precision", type=str, default="bf16")
    parser.add_argument("--eval-batch", type=int, default=8,
                        dest="eval_batch",
                        help="eval_fullres batch (8 = throughput record; "
                             "1 = the latency point, 14.33 ms/image)")
    parser.add_argument("--mode", type=str, default="train_adapt",
                        choices=["train_adapt", "train_source",
                                 "train_feature", "train_e2e",
                                 "train_e2e_cached", "infer",
                                 "eval_fullres", "serve_fullres"],
                        help="train_adapt = BASELINE config 4 (the tracked "
                             "metric); train_source = config 2; "
                             "train_feature = config 3; train_e2e = config "
                             "4 with the host input pipeline in the loop; "
                             "infer = config 1 (batch-1 513x513)")
    args = parser.parse_args()
    _require_tpu()
    if args.mode == "infer":
        return _bench_infer(args)
    if args.mode == "eval_fullres":
        return _bench_eval_fullres(args)
    if args.mode == "serve_fullres":
        return _bench_serve_fullres(args)
    if args.mode == "train_source":
        return _bench_train_source(args)
    if args.mode == "train_feature":
        return _bench_train_feature(args)
    if args.mode == "train_e2e_cached":
        return _bench_train_e2e_cached(args)
    if args.mode == "train_e2e":
        return _bench_train_e2e(args)

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
