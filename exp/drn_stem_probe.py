"""DRN stem layout probe (round 3): is the C=16 full-resolution stem's
lane-padding cost recoverable by a logical-NCHW reformulation?

drn_b8 sits at 71% of the LOGICAL HBM roofline (PARITY.md §Performance);
the stem's [8, 512, 1024, 16] activations carry XLA's C-minor/N-sublane
layout with 16 of 128 lanes populated (8x physical:logical).  XLA exposes
no layout-assignment lever to JAX, but the LOGICAL shape is ours: with
[N, C, H, W] arrays and NCHW conv dimension numbers, the minor dims
become (H, W) and every lane is populated.

This times fwd+bwd of the stem (level1 conv3->16 s1 + BN + ReLU, level2
conv16->32 s2 + BN + ReLU, batch 8 @ 512x1024 bf16, f32 BN stats) in both
formulations, scan-of-ITERS + readback (valid axon timing).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python exp/drn_stem_probe.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

N, H, W = 8, 512, 1024
ITERS = 20


def stem(x, params, layout):
    """layout 'NHWC' or 'NCHW'; x in that layout; BN: batch stats, f32."""
    cax = 3 if layout == "NHWC" else 1
    red = tuple(i for i in range(4) if i != cax)
    dn = (layout, "HWIO", layout)
    for i, (k, g, b) in enumerate(params):
        stride = (1, 1) if i == 0 else (2, 2)
        x = jax.lax.conv_general_dilated(
            x, k, stride, ((1, 1), (1, 1)), dimension_numbers=dn)
        xf = x.astype(jnp.float32)
        mu = xf.mean(red, keepdims=True)
        var = (xf * xf).mean(red, keepdims=True) - mu * mu
        shape = [1] * 4
        shape[cax] = x.shape[cax]
        x = ((xf - mu) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype)
        x = x * g.reshape(shape) + b.reshape(shape)
        x = jnp.maximum(x, 0)
    return x


def run(layout):
    rng = np.random.RandomState(0)
    xs = (N, H, W, 3) if layout == "NHWC" else (N, 3, H, W)
    x = jnp.asarray(rng.randn(*xs), jnp.bfloat16)
    params = []
    for cin, cout in ((3, 16), (16, 32)):
        params.append((
            jnp.asarray(rng.randn(3, 3, cin, cout) * 0.1, jnp.bfloat16),
            jnp.ones((cout,), jnp.bfloat16),
            jnp.zeros((cout,), jnp.bfloat16)))

    def loss(params, x):
        return stem(x, params, layout).astype(jnp.float32).mean()

    grad = jax.value_and_grad(loss)

    def body(c, _):
        l, g = grad(params, x)
        # chain on a scalar digest of the grads so iterations serialize
        d = sum(gi.astype(jnp.float32).sum()
                for p in g for gi in p)
        return c + l + d, None

    f = jax.jit(lambda: jax.lax.scan(
        body, jnp.float32(0), None, length=ITERS)[0])
    t0 = time.perf_counter()
    jax.block_until_ready(f())
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(f())
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{layout} stem fwd+bwd: {dt * 1e3:7.2f} ms "
          f"(compile {compile_s:.0f}s)", flush=True)
    return dt


def main():
    a = run("NHWC")
    b = run("NCHW")
    print(f"NCHW/NHWC ratio: {b / a:.2f}x")


if __name__ == "__main__":
    main()
