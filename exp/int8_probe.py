"""Feasibility probes: would an int8 quantized serving path beat bf16?

The serving profile (PARITY.md §Performance, serve_decoder paragraph) is
dominated by bf16 elementwise/BN fusions over decoder-resolution
activations — bandwidth, not MXU.  A quantized inference path would halve
that traffic (int8 activations) and double MXU throughput (v5e: 394 int8
TOPS vs 197 bf16 TFLOPs), IF XLA/Mosaic emit efficient fused int8
conv+requant chains on this backend.  These probes measure that per op
class, before any framework work:

  conv3x3     3x3 256->256 @ [8,256,512]   (the decoder's two hot convs)
  dw          3x3 depthwise C=144 @ [8,256,512] (inverted-residual middle)
  pw_expand   1x1 24->144 @ [8,256,512]
  pw_project  1x1 144->24 @ [8,256,512]
  invres      the full expand->dw->project + residual chain, C=24/144

Each arm: bf16 conv + folded-BN scale/shift + relu6  VS  int8 conv (s32
accum) + f32 requant + clamped relu -> int8.  Timing: scan-of-iters with
the output threaded into the carry + on-device slice readback (the only
methodology valid over the axon tunnel — CLAUDE.md).

    python exp/int8_probe.py [--arms conv3x3 dw ...] [--iters 20]

Measured (v5e-1, 2026-08-19), int8 speedup per arm:
  conv3x3 1.72x (5.54 vs 9.52 ms)   dw 1.10x (4.23 vs 4.66)
  pw_expand 0.94x (3.53 vs 3.32)    pw_project 1.23x (3.33 vs 4.11)
  invres 0.98x (4.94 vs 4.81)

Interpretation (PARITY.md §Performance int8 lines): the decoder's
3x3/256-ch conv class is the only one that wins big — full-model PTQ is
refuted for mobilenet's inverted-residual mix (the extra requant
elementwise passes eat the halved conv traffic at these low channel
counts), but a DECODER-ONLY int8 path targets the two largest fusions in
the serve_decoder profile (8.7+6.4 ms/step of 55.1).
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--hw", type=int, nargs=2, default=[256, 512])
    ap.add_argument("--arms", type=str, nargs="+",
                    default=["conv3x3", "dw", "pw_expand", "pw_project",
                             "invres"],
                    choices=["conv3x3", "dw", "pw_expand", "pw_project",
                             "invres"])
    args = ap.parse_args()

    from s2r_tpu.config import apply_platform_override
    apply_platform_override()

    import jax
    import jax.numpy as jnp
    from jax import lax

    n, (h, w) = args.batch, args.hw
    rng = np.random.RandomState(0)

    def timed(fn, x0, tag, iters):
        def chain(x):
            def body(carry, _):
                out = fn(carry)
                bump = out.ravel()[0].astype(jnp.float32) * jnp.float32(1e-30)
                if carry.dtype == jnp.int8:
                    carry = carry + bump.astype(jnp.int8)  # runtime zero
                else:
                    carry = carry + bump.astype(carry.dtype)
                return carry, ()
            cfin, _ = lax.scan(body, x, None, length=iters)
            return cfin[0, 0, 0, :8]

        run = jax.jit(chain)
        t0 = time.perf_counter()
        _ = np.asarray(run(x0))
        print(f"  [{tag}] compile+1st: {time.perf_counter() - t0:.0f}s",
              flush=True)
        t0 = time.perf_counter()
        _ = np.asarray(run(x0))
        dt = (time.perf_counter() - t0) / iters
        print(f"  [{tag}] {dt * 1e3:.2f} ms/call", flush=True)
        return dt

    def conv(x, k, groups=1):
        dn = lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        acc = jnp.int32 if x.dtype == jnp.int8 else jnp.float32
        return lax.conv_general_dilated(x, k, (1, 1), "SAME",
                                        dimension_numbers=dn,
                                        feature_group_count=groups,
                                        preferred_element_type=acc)

    def make_pair(cin, cout, ksz, groups=1):
        """(bf16_block, int8_block, x_bf16, x_int8) for one conv+bn+act."""
        x_f = rng.randn(n, h, w, cin).astype(np.float32)
        k_f = (rng.randn(ksz, ksz, cin // groups, cout)
               / np.sqrt(ksz * ksz * cin / groups)).astype(np.float32)
        scale = rng.rand(cout).astype(np.float32) + 0.5
        shift = rng.randn(cout).astype(np.float32)

        kb = jnp.asarray(k_f, jnp.bfloat16)
        sb = jnp.asarray(scale, jnp.bfloat16)
        bb = jnp.asarray(shift, jnp.bfloat16)

        def bf16_block(x):
            y = conv(x, kb, groups).astype(jnp.bfloat16) * sb + bb
            return jnp.clip(y, 0, 6)

        k8 = jnp.asarray(np.clip(k_f * 512, -127, 127).astype(np.int8))
        m = jnp.asarray(scale / (32 * 512), jnp.float32)
        z = jnp.asarray(shift * 32, jnp.float32)

        def int8_block(x):
            y = conv(x, k8, groups)
            yf = y.astype(jnp.float32) * m + z
            return jnp.clip(jnp.round(yf), 0, 127).astype(jnp.int8)

        xb = jnp.asarray(x_f, jnp.bfloat16)
        x8 = jnp.asarray(np.clip(x_f * 32, -127, 127).astype(np.int8))
        return bf16_block, int8_block, xb, x8

    arms = {
        "conv3x3": dict(cin=256, cout=256, ksz=3),
        "dw": dict(cin=144, cout=144, ksz=3, groups=144),
        "pw_expand": dict(cin=24, cout=144, ksz=1),
        "pw_project": dict(cin=144, cout=24, ksz=1),
    }

    results = {}
    for name in args.arms:
        if name == "invres":
            continue
        spec = arms[name]
        bf, i8, xb, x8 = make_pair(**spec)
        g = spec.get("groups", 1)
        print(f"{name} [{n},{h},{w},{spec['cin']}]->{spec['cout']} "
              f"k{spec['ksz']}{' dw' if g > 1 else ''}:", flush=True)
        dt_a = timed(bf, xb, "bf16", args.iters)
        dt_b = timed(i8, x8, "int8", args.iters)
        results[name] = dt_a / dt_b
        print(f"  speedup: {dt_a / dt_b:.2f}x", flush=True)

    if "invres" in args.arms:
        # full inverted residual, C=24 t=6 (the stride-4 hot block):
        # expand 1x1 -> dw 3x3 -> project 1x1 (linear) + residual
        ebf, ei8, xb, x8 = make_pair(cin=24, cout=144, ksz=1)
        dbf, di8, _, _ = make_pair(cin=144, cout=144, ksz=3, groups=144)
        pf = rng.randn(1, 1, 144, 24).astype(np.float32) / 12.0
        ps, pz = rng.rand(24).astype(np.float32) + 0.5, \
            rng.randn(24).astype(np.float32)
        pkb = jnp.asarray(pf, jnp.bfloat16)
        psb, pbb = jnp.asarray(ps, jnp.bfloat16), jnp.asarray(pz,
                                                              jnp.bfloat16)

        def invres_bf16(x):
            y = dbf(ebf(x))
            y = conv(y, pkb).astype(jnp.bfloat16) * psb + pbb  # linear
            return x + y

        pk8 = jnp.asarray(np.clip(pf * 512, -127, 127).astype(np.int8))
        pm = jnp.asarray(ps / (32 * 512), jnp.float32)
        pzf = jnp.asarray(pz * 32, jnp.float32)

        def invres_int8(x):
            y = di8(ei8(x))
            yf = conv(y, pk8).astype(jnp.float32) * pm + pzf
            y8 = jnp.clip(jnp.round(yf), -127, 127).astype(jnp.int8)
            return jnp.clip(x.astype(jnp.int32) + y8.astype(jnp.int32),
                            -127, 127).astype(jnp.int8)

        print(f"invres [{n},{h},{w},24] t6 (expand+dw+project+residual):",
              flush=True)
        dt_a = timed(invres_bf16, xb, "bf16", args.iters)
        dt_b = timed(invres_int8, x8, "int8", args.iters)
        results["invres"] = dt_a / dt_b
        print(f"  speedup: {dt_a / dt_b:.2f}x", flush=True)

    print("summary:", {k: f"{v:.2f}x" for k, v in results.items()})


if __name__ == "__main__":
    main()
