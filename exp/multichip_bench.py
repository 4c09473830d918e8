"""Multi-chip scaling bench — day-one harness for real multi-chip hardware.

Measures output-adapt train throughput (img/s/chip) at each device count,
pure data-parallel by default or a 2-D data x spatial mesh with
``--spatial N``.  On today's 1-chip axon tunnel it degenerates to the
bench.py headline; when a multi-chip slice lands, the same command prints
the scaling curve with no code changes (CLAUDE.md round-4 backlog item 3).

The per-chip batch stays fixed (weak scaling, the deployment regime:
global batch = batch_per_chip * n_data_groups), so perfect scaling is a
flat img/s/chip line; `eff` column = img/s/chip at n vs at the smallest n
measured.

Timing uses the donated-argument loop (the only methodology validated on
the axon tunnel — see CLAUDE.md).  Harness-validation mode:
``S2R_PLATFORM=cpu python exp/multichip_bench.py --virtual 8`` provisions
8 virtual CPU devices and runs the full sweep (numbers meaningless, wiring
real).

Usage:
    PYTHONPATH=/root/repo:$PYTHONPATH python exp/multichip_bench.py \
        [--batch-per-chip 8] [--spatial 1] [--devices 1,2,4,8] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

H, W = 512, 1024


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--batch-per-chip", type=int, default=8)
    p.add_argument("--crop", type=int, default=0,
                   help="override HxW to crop x 2*crop (0 = 512x1024); "
                        "use a small crop for --virtual CPU validation")
    p.add_argument("--spatial", type=int, default=1,
                   help="spatial shard factor (2-D data x space mesh); "
                        "per-chip batch then rides the data axis only")
    p.add_argument("--devices", type=str, default="",
                   help="comma-separated device counts (default: powers "
                        "of 2 up to the available count)")
    p.add_argument("--quick", action="store_true")
    p.add_argument("--virtual", type=int, default=0,
                   help="provision N virtual CPU devices (harness "
                        "validation only — CPU timings are meaningless)")
    return p.parse_args()


def main():
    args = parse_args()
    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}")
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_prng_impl", "rbg")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from s2r_tpu.config import Config
    from s2r_tpu.core.mesh import make_mesh, replicate, shard_batch
    from s2r_tpu.train.setup import build_method

    global H, W
    if args.crop:
        H, W = args.crop, 2 * args.crop

    n_avail = len(jax.devices())
    if args.devices:
        counts = [int(x) for x in args.devices.split(",")]
    else:
        counts, c = [], args.spatial
        while c <= n_avail:
            counts.append(c)
            c *= 2
    counts = [c for c in counts if c <= n_avail and c % args.spatial == 0]
    if not counts:
        raise SystemExit(f"no valid device counts <= {n_avail} for "
                         f"spatial={args.spatial}")
    print(f"# devices available: {n_avail}  platform: "
          f"{jax.devices()[0].platform}  sweep: {counts} "
          f"(spatial={args.spatial})", flush=True)

    bpc = args.batch_per_chip
    cfg = Config(crop_size=H, base_size=H, batch_size=bpc, epochs=200,
                 precision="bf16", dataset="synthetic")
    method = build_method(cfg, iters_per_epoch=1000, method="output_adapt")
    # numpy snapshot: the per-n device state is donated by the step loop,
    # and device_put can alias (not copy) when the sharding already
    # matches — a jax-array template would be deleted after the first n.
    host_state = jax.tree.map(np.asarray,
                              method.init_state(jax.random.PRNGKey(0)))

    rng = np.random.RandomState(0)
    base = None  # img/s/chip at the smallest n
    rows = []
    for n in counts:
        ndata = n // args.spatial
        gbatch = bpc * ndata
        mesh = make_mesh(n, spatial=args.spatial)
        state = replicate(host_state, mesh)
        host_batch = {
            "src_image": rng.randn(gbatch, H, W, 3).astype(np.float32),
            "src_label": rng.randint(0, 19, (gbatch, H, W)).astype(np.int32),
            "tgt_image": rng.randn(gbatch, H, W, 3).astype(np.float32),
        }
        dev_batch = shard_batch(host_batch, mesh)
        step = jax.jit(method.step_fn, donate_argnums=0)
        t0 = time.perf_counter()
        for _ in range(2 if args.quick else 3):
            state, _ = step(state, dev_batch)
        jax.block_until_ready(state.params)
        compile_s = time.perf_counter() - t0
        iters = 5 if args.quick else 20
        t0 = time.perf_counter()
        for _ in range(iters):
            state, _ = step(state, dev_batch)
        jax.block_until_ready(state.params)
        dt = (time.perf_counter() - t0) / iters
        ips_chip = gbatch / dt / n
        if base is None:
            base = ips_chip
        eff = ips_chip / base
        rows.append({"devices": n, "spatial": args.spatial,
                     "global_batch": gbatch,
                     "ms_per_step": round(dt * 1e3, 2),
                     "img_per_sec_per_chip": round(ips_chip, 2),
                     "scaling_eff": round(eff, 3)})
        print(f"n={n:3d} (dp{ndata}xsp{args.spatial})  gbatch={gbatch:4d}  "
              f"{dt * 1e3:8.2f} ms/step  {ips_chip:7.2f} img/s/chip  "
              f"eff={eff:.3f}  (compile {compile_s:.0f}s)", flush=True)
        del state, dev_batch

    print(json.dumps({"sweep": rows,
                      "platform": jax.devices()[0].platform}))


if __name__ == "__main__":
    main()
