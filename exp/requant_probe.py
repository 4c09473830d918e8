"""Why is the s32->s8 requant pass 8x off roofline, and can Pallas fix it?

The serve_decoder_int8 profile (PARITY.md §Performance decoder-int8
paragraph) shows ONE op — `clamp_convert_fusion s8[8,256,512,256]`, the
requant between the two int8 decoder convs — costing 24.25 ms/step,
~56 GB/s effective on a ~1.3 GB elementwise pass (v5e HBM is ~819 GB/s).
That single op is the whole end-to-end refutation: the two convs it sits
between got 1.72x faster, and it costs more than both combined.

Arms (all [8,256,512,256] s32 -> s8, the exact production shape):

  xla       z = s32*m + b (f32); clip(round(z/a1), 0, 127) -> s8
            (io/quant.py's chain, isolated)
  noround   same without the explicit round (convert does RNE anyway)
  convert   bare s32 -> s8 convert+clip (no arithmetic) — the lowering
            floor for a 32->8-bit pack on this backend
  pallas    ops/pallas/requant.py tile kernel, same arithmetic as `xla`

Timing: scan-of-iters with the output threaded into the carry + on-device
slice readback (CLAUDE.md methodology).

    python exp/requant_probe.py [--iters 20] [--arms xla pallas ...]

Measured (v5e-1, 2026-08-20), per call INCLUDING the scan's carry-add
(~2.1 GB of extra s32 traffic on top of the op's ~1.3 GB):

    xla 8.10 ms   noround 4.84   convert 5.02   pallas 6.84

Two findings: (1) the isolated requant is NOT the 24 ms in-context op —
the profile's `clamp_convert_fusion.1` must be the int8 CONV fused with
its requant epilogue (no convolution op appears anywhere else in its
top-ops list), running ~4x slower than the same conv+requant chain
measured standalone in exp/int8_probe.py (5.54 ms — the in-context
input is the 304-channel concat, which Mosaic lane-pads to 384, plus
whatever the fusion emitter does differently); (2) the explicit
round-nearest-even costs 1.7x over the bare convert on the VPU (the
Pallas kernel pays it too: 6.84 with round inside).  An earlier run of
this probe with `carry + bump*0` threading measured 1137 GB/s > HBM
roofline — integer *0 IS algebraically folded and the body hoisted;
the f32*1e-30 pattern is load-bearing (CLAUDE.md timing traps).
End-to-end A/B of the Pallas-requant boundary: PARITY.md §Performance.
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
    ap.add_argument("--channels", type=int, default=256)
    ap.add_argument("--arms", type=str, nargs="+",
                    default=["xla", "noround", "convert", "pallas"],
                    choices=["xla", "noround", "convert", "pallas"])
    args = ap.parse_args()

    from s2r_tpu.config import apply_platform_override
    apply_platform_override()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from s2r_tpu.ops.pallas.requant import requant_s32_to_s8

    n, (h, w), c = args.batch, args.hw, args.channels
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randint(-(2**20), 2**20, (n, h, w, c), np.int32))
    m = jnp.asarray(rng.rand(c).astype(np.float32) * 1e-4)
    b = jnp.asarray(rng.randn(c).astype(np.float32))
    inv_a1 = jnp.float32(1.0 / 0.09)
    nbytes = x0.size * (x0.itemsize + 1)

    def timed(fn, tag):
        def chain(x):
            def body(carry, _):
                out = fn(carry)
                # f32*1e-30 is not algebraically foldable (an int *0 IS, and
                # gets the whole body hoisted — measured 1137 GB/s > roofline)
                bump = out[0, 0, 0, 0].astype(jnp.float32) * jnp.float32(1e-30)
                return carry + bump.astype(carry.dtype), ()
            cfin, _ = lax.scan(body, x, None, length=args.iters)
            return cfin[0, 0, 0, :8]

        run = jax.jit(chain)
        t0 = time.perf_counter()
        _ = np.asarray(run(x0))
        print(f"  [{tag}] compile+1st: {time.perf_counter() - t0:.0f}s",
              flush=True)
        t0 = time.perf_counter()
        _ = np.asarray(run(x0))
        dt = (time.perf_counter() - t0) / args.iters
        print(f"  [{tag}] {dt * 1e3:.2f} ms/call  "
              f"({nbytes / dt / 1e9:.0f} GB/s)", flush=True)
        return dt

    def xla_arm(x):
        z = x.astype(jnp.float32) * m + b
        return jnp.clip(jnp.round(z * inv_a1), 0, 127).astype(jnp.int8)

    def noround_arm(x):
        z = x.astype(jnp.float32) * m + b
        return jnp.clip(z * inv_a1, 0, 127).astype(jnp.int8)

    def convert_arm(x):
        return jnp.clip(x, 0, 127).astype(jnp.int8)

    def pallas_arm(x):
        return requant_s32_to_s8(x, m, b, inv_a1)

    arms = {"xla": xla_arm, "noround": noround_arm, "convert": convert_arm,
            "pallas": pallas_arm}
    results = {}
    for name in args.arms:
        print(f"{name}:")
        results[name] = timed(arms[name], name)
    if "xla" in results and "pallas" in results:
        print(f"pallas speedup vs xla: "
              f"{results['xla'] / results['pallas']:.2f}x")


if __name__ == "__main__":
    main()
