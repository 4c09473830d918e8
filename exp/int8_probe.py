"""Feasibility probe: would an int8 quantized serving path beat bf16?

The serving profile (PARITY.md §Performance, serve_decoder paragraph) is
dominated by bf16 elementwise/BN fusions over decoder-resolution
activations — bandwidth, not MXU.  A quantized inference path would halve
that traffic (int8 activations) and double MXU throughput (v5e: 394 int8
TOPS vs 197 bf16 TFLOPs), IF XLA/Mosaic emit efficient fused int8
conv+requant chains on this backend.  This probe measures that directly,
before any framework work:

  arm A (bf16):  conv(3x3) -> scale+shift (folded BN) -> relu6, bf16 in/out
  arm B (int8):  conv(3x3, int8 in, s32 accum) -> rescale to int8 -> clamped
                 relu (the requantized int8 equivalent)

at the decoder-res serving shape [8,256,512,C].  Timing: scan-of-iters with
the output threaded into the carry + on-device slice readback (the only
methodology valid over the axon tunnel — CLAUDE.md).

    python exp/int8_probe.py [--iters 20] [--c 256] [--hw 256 512]

Interpretation: arm B at ~2x arm A says a PTQ servable is worth building;
arm B neutral-or-slower is a written refutation (the requant elementwise
work refuses to fuse, or Mosaic falls off its int8 path).
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--c", type=int, default=256)
    ap.add_argument("--hw", type=int, nargs=2, default=[256, 512])
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    n, (h, w), c = args.batch, args.hw, args.c
    rng = np.random.RandomState(0)
    x_f = rng.randn(n, h, w, c).astype(np.float32)
    k_f = (rng.randn(3, 3, c, c) / np.sqrt(9 * c)).astype(np.float32)
    scale = rng.rand(c).astype(np.float32) + 0.5
    shift = rng.randn(c).astype(np.float32)

    dn = lax.conv_dimension_numbers(x_f.shape, k_f.shape,
                                    ("NHWC", "HWIO", "NHWC"))

    def timed(fn, x0, tag, bytes_moved):
        def chain(x):
            def body(carry, _):
                out = fn(carry)
                bump = out.ravel()[0].astype(jnp.float32) * jnp.float32(1e-30)
                if carry.dtype == jnp.int8:
                    carry = carry + bump.astype(jnp.int8)  # runtime zero
                else:
                    carry = carry + bump.astype(carry.dtype)
                return carry, ()
            cfin, _ = lax.scan(body, x, None, length=args.iters)
            return cfin[0, 0, 0, :8]

        run = jax.jit(chain)
        t0 = time.perf_counter()
        _ = np.asarray(run(x0))
        print(f"  [{tag}] compile+1st: {time.perf_counter() - t0:.0f}s")
        t0 = time.perf_counter()
        _ = np.asarray(run(x0))
        dt = (time.perf_counter() - t0) / args.iters
        print(f"  [{tag}] {dt * 1e3:.2f} ms/call "
              f"({bytes_moved / dt / 1e9:.0f} GB/s effective)")
        return dt

    # --- arm A: bf16 conv + folded-BN + relu6 (the serving pattern) ---
    xb = jnp.asarray(x_f, jnp.bfloat16)
    kb = jnp.asarray(k_f, jnp.bfloat16)
    sb, bb = jnp.asarray(scale, jnp.bfloat16), jnp.asarray(shift,
                                                           jnp.bfloat16)

    def bf16_block(x):
        y = lax.conv_general_dilated(x, kb, (1, 1), "SAME",
                                     dimension_numbers=dn,
                                     preferred_element_type=jnp.float32)
        y = y.astype(jnp.bfloat16) * sb + bb
        return jnp.clip(y, 0, 6)

    io_bytes = 2 * (x_f.size * 2)  # bf16 in + out (weights stay resident)
    print(f"bf16 conv3x3+bn+relu6 [{n},{h},{w},{c}]:")
    dt_a = timed(bf16_block, xb, "bf16", io_bytes)

    # --- arm B: int8 conv (s32 accum) + requant + clamped relu ---
    x8 = jnp.asarray(np.clip(x_f * 32, -127, 127).astype(np.int8))
    k8 = jnp.asarray(np.clip(k_f * 512, -127, 127).astype(np.int8))
    # per-channel requant multiplier applied in f32 then rounded back;
    # this is the standard PTQ inference pattern
    m = jnp.asarray(scale / (32 * 512), jnp.float32)
    z = jnp.asarray(shift * 32, jnp.float32)

    def int8_block(x):
        y = lax.conv_general_dilated(x, k8, (1, 1), "SAME",
                                     dimension_numbers=dn,
                                     preferred_element_type=jnp.int32)
        yf = y.astype(jnp.float32) * m + z
        return jnp.clip(jnp.round(yf), 0, 127).astype(jnp.int8)

    print(f"int8 conv3x3+requant+relu [{n},{h},{w},{c}]:")
    dt_b = timed(int8_block, x8, "int8", 2 * x_f.size)

    print(f"speedup int8 vs bf16: {dt_a / dt_b:.2f}x "
          f"({'worth pursuing' if dt_a / dt_b > 1.4 else 'refuted'})")


if __name__ == "__main__":
    main()
