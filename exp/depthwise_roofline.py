"""XLA depthwise-conv roofline check with VALID timing (donated chain).

On the axon tunnel, block_until_ready on non-donated call chains can return
before execution completes (measured 27 TB/s 'bandwidth'); donated-argument
chains + final readback give honest timings (validated against a
single-dispatch lax.scan of the full train step: 143.5 vs 145.2 ms/step).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

HBM_GBPS = 819.0
SHAPES = [
    (256, 512, 96, 1),
    (128, 256, 144, 1),
    (64, 128, 192, 1),
    (32, 64, 384, 1),
    (32, 64, 576, 2),
    (32, 64, 960, 2),
]
N = 8


def main(dtype=jnp.bfloat16):
    for h, w, c, d in SHAPES:
        x = jnp.asarray(np.random.RandomState(0).randn(N, h, w, c), dtype)
        k = jnp.asarray(np.random.RandomState(1).randn(3, 3, 1, c), dtype)

        @jax.jit
        def scan20(x, k):
            def body(xc, _):
                y = lax.conv_general_dilated(
                    xc, k, (1, 1), ((d, d), (d, d)), rhs_dilation=(d, d),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=c)
                return y * 0.1, ()
            y, _ = lax.scan(body, x, None, length=20)
            return y

        y = scan20(x, k)
        _ = np.asarray(y[0, 0, 0, :2])
        t0 = time.perf_counter()
        y = scan20(y, k)
        _ = np.asarray(y[0, 0, 0, :2])
        dt = (time.perf_counter() - t0) / 20
        bytes_moved = 2 * N * h * w * c * x.dtype.itemsize
        roofline = bytes_moved / (HBM_GBPS * 1e9)
        print(f"dw {h}x{w}x{c} d{d}: {dt*1e6:8.1f} us  "
              f"roofline {roofline*1e6:7.1f} us  "
              f"eff {roofline/dt*100:5.1f}%", flush=True)


if __name__ == "__main__":
    main()
