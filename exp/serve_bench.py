"""Serving-artifact throughput on the real chip.

Exports the full-res eval servable (weights baked in, labels out), loads
it back, and times it with the single-dispatch scan + final-readback
methodology (the only timing valid over the axon tunnel for non-donated
chains — see CLAUDE.md).  Also times the host->device ingest for rgb8 vs
normalized-f32 frames: the rgb8 artifact moves 4x fewer bytes per frame
over PCIe/tunnel and skips the host normalization pass entirely.

    python exp/serve_bench.py [--batch 8] [--size 1024 2048] [--iters 20]
        [--input rgb8] [--precision bf16] [--backbone mobilenet]

Context numbers (PARITY.md §Performance): the framework eval step at the
same shape (fwd + argmax + confusion matrix) measures 14.33 ms/image @b1,
10.72 @b8.  The servable is that forward minus the confusion matrix.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, nargs=2, default=[1024, 2048],
                    metavar=("H", "W"))
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--input", type=str, default="rgb8",
                    choices=["rgb8", "normalized"])
    ap.add_argument("--output", type=str, default="labels",
                    choices=["labels", "logits", "probs"])
    ap.add_argument("--argmax", type=str, default="full",
                    choices=["full", "decoder"],
                    help="labels only: 'decoder' = fast mode (argmax at "
                         "stride-4 res, nearest label upsample)")
    ap.add_argument("--label-dtype", type=str, default="int32",
                    choices=["int32", "uint8"], dest="label_dtype",
                    help="labels only: uint8 = byte label plane (4x fewer "
                         "D2H bytes; 4x less full-res HBM in decoder mode)")
    ap.add_argument("--quant", type=str, default="none",
                    choices=["none", "decoder-int8"],
                    help="int8 decoder tail (io/quant.py) — calibrated on "
                         "a small random batch (valid for timing; accuracy "
                         "evidence lives in tests/test_quant.py on the "
                         "trained checkpoint)")
    ap.add_argument("--requant", type=str, default="auto",
                    choices=["auto", "xla", "pallas"],
                    help="decoder-int8 only: lowering of the s32->s8 pass "
                         "between the two int8 convs (io/quant.py)")
    ap.add_argument("--precision", type=str, default="bf16")
    ap.add_argument("--backbone", type=str, default="mobilenet")
    ap.add_argument("--split-concat", action="store_true",
                    dest="split_concat",
                    help="concat-free ASPP/decoder head convs "
                         "(models/deeplab.py split_concat)")
    ap.add_argument("--stem-s2d", action="store_true", dest="stem_s2d",
                    help="space-to-depth stem lowering "
                         "(models/mobilenet.py stem_s2d)")
    ap.add_argument("--platforms", type=str, nargs="+", default=None,
                    help="default: current backend only")
    ap.add_argument("--direct", action="store_true",
                    help="also time the un-exported jitted closure (isolates "
                         "jax.export overhead from the serving formulation)")
    args = ap.parse_args()
    if args.argmax == "decoder" and args.output != "labels":
        ap.error("--argmax decoder requires --output labels")
    if args.label_dtype != "int32" and args.output != "labels":
        ap.error("--label-dtype requires --output labels")

    import jax
    import jax.numpy as jnp
    from jax import lax

    from s2r_tpu.core.precision import Policy
    from s2r_tpu.io.serving import export_servable, load_servable
    from s2r_tpu.models import DeepLab

    h, w = args.size
    n = args.batch
    model = DeepLab(backbone=args.backbone, output_stride=16, num_classes=19,
                    dtype=Policy.from_name(args.precision).compute_dtype,
                    split_concat=args.split_concat, stem_s2d=args.stem_s2d)
    x0 = jnp.zeros((1, 129, 129, 3), jnp.float32)
    v = jax.jit(lambda: model.init({"params": jax.random.PRNGKey(0)}, x0,
                                   False))()

    quant = args.quant.replace("-", "_")
    quant_scales = None
    if quant != "none":
        from s2r_tpu.io.quant import calibrate_decoder_int8

        # small random batch: activation magnitudes, not accuracy, are all
        # a timing calibration needs (accuracy bar: tests/test_quant.py)
        calib = [rng2.rand(1, 257, 513, 3).astype(np.float32)
                 for rng2 in [np.random.RandomState(1)]]
        t0 = time.time()
        quant_scales = calibrate_decoder_int8(model, v["params"],
                                              v["batch_stats"], calib)
        print(f"calibrate: {time.time() - t0:.1f}s  scales={quant_scales}")

    path = "/tmp/serve_bench.shlo"
    t0 = time.time()
    export_servable(model, v["params"], v["batch_stats"], (n, h, w, 3),
                    path, output=args.output, input=args.input,
                    argmax_res=args.argmax, label_dtype=args.label_dtype,
                    quant=quant, quant_scales=quant_scales,
                    quant_requant=args.requant,
                    platforms=args.platforms)
    print(f"export: {time.time() - t0:.1f}s")
    serve = load_servable(path)

    rng = np.random.RandomState(0)
    if args.input == "rgb8":
        host = rng.randint(0, 256, (n, h, w, 3), np.uint8)
    else:
        host = rng.randn(n, h, w, 3).astype(np.float32)

    # host->device ingest cost per frame (what rgb8 saves)
    for name, arr in (("rgb8-u8", host.astype(np.uint8)),
                      ("norm-f32", host.astype(np.float32))):
        x = jax.device_put(arr)
        x.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(3):
            jax.device_put(arr).block_until_ready()
        dt = (time.perf_counter() - t0) / 3
        print(f"ingest {name}: {1e3 * dt / n:.2f} ms/frame "
              f"({arr.nbytes / dt / 1e9:.2f} GB/s)")

    image = jax.device_put(host)

    def time_call(call, tag):
        # Thread the output back into the carry: without this XLA may hoist
        # the loop-invariant call out of the while loop and compute it ONCE
        # (observed: an un-threaded eval chain "measured" 0.66 ms/img).
        def chain(img):
            def body(carry, _):
                out = call(carry)
                bump = out.ravel()[0].astype(jnp.float32) * jnp.float32(
                    1e-30)
                if carry.dtype == jnp.uint8:
                    carry = carry + bump.astype(jnp.uint8)  # runtime 0
                else:
                    carry = carry + bump.astype(carry.dtype)
                return carry, ()
            c, _ = lax.scan(body, img, None, length=args.iters)
            # slice ON DEVICE: reading the full carry back through the
            # tunnel (~30 MB/s) would dominate the measurement
            return c[0, 0, 0, :]

        run = jax.jit(chain)
        out = run(image)
        _ = np.asarray(out)  # compile + settle, forced readback
        t0 = time.perf_counter()
        out = run(image)
        _ = np.asarray(out)
        dt = (time.perf_counter() - t0) / args.iters
        amax = "(argmax@decoder)" if args.argmax == "decoder" else ""
        amax += f"(int8-decoder/rq={args.requant})" if quant != "none" else ""
        print(f"{tag} {args.backbone} {h}x{w} b{n} {args.input}->"
              f"{args.output}{amax} [{args.precision}]: "
              f"{1e3 * dt / n:.2f} ms/image on-device "
              f"({n / dt:.1f} img/s/chip)")

    time_call(serve.exported.call, "servable")
    if args.direct:
        from s2r_tpu.io.serving import make_serving_fn
        time_call(make_serving_fn(model, v["params"], v["batch_stats"],
                                  output=args.output, input=args.input,
                                  argmax_res=args.argmax,
                                  label_dtype=args.label_dtype,
                                  quant=quant, quant_scales=quant_scales,
                                  quant_requant=args.requant),
                  "direct-jit")
        # weights as ARGUMENTS (the eval-step formulation) — isolates the
        # cost of baking weights in as HLO constants
        mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32) * 255.0
        std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32) * 255.0

        def args_fn(variables, image):
            if args.input == "rgb8":
                image = (image.astype(jnp.float32) - mean) / std
            logits, _ = model.apply(variables, image, False)
            logits = logits.astype(jnp.float32)
            return jnp.argmax(logits, -1).astype(jnp.int32) \
                if args.output == "labels" else logits

        def time_args_fn():
            def chain(variables, img):
                def body(carry, _):
                    out = args_fn(variables, carry)
                    bump = (out.ravel()[0].astype(jnp.float32)
                            * jnp.float32(1e-30))
                    return carry + bump.astype(carry.dtype), ()
                c, _ = lax.scan(body, img, None, length=args.iters)
                return c[0, 0, 0, :]
            run = jax.jit(chain)
            out = run(v, image)
            _ = np.asarray(out)
            t0 = time.perf_counter()
            out = run(v, image)
            _ = np.asarray(out)
            dt = (time.perf_counter() - t0) / args.iters
            print(f"weights-as-args {args.backbone} {h}x{w} b{n}: "
                  f"{1e3 * dt / n:.2f} ms/image ({n / dt:.1f} img/s/chip)")

        time_args_fn()


if __name__ == "__main__":
    main()
