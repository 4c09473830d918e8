"""Space-to-depth reformulation of 4x4-stride-2 convolutions.

Motivation (TPU layouts): a convolution input must have its channel dim in
the 128-wide lane dimension.  The output-space discriminator
(models/discriminator.py; reference modeling/discriminator.py:6-35) consumes
full-resolution 19-channel softmax maps, which XLA pads 19 -> 128 lanes — a
6.7x physical-HBM blowup on a ~160 MB logical tensor.  Rewriting the first
4x4/s2 conv as a 3x3/s1 conv over the space-to-depth(2) input (76 channels)
is mathematically exact and cuts the padded traffic ~4x; the second conv
(64 -> 256 channels under s2d) removes a 2x lane pad the same way.

MEASURED RESULT (v5e-1, 512x1024 output-adapt step, batch 8): enabling s2d
on the discriminator's conv1+conv2 was SLOWER — 49.5 vs 55.1 img/s (conv1
alone: 52.0) — the relayout passes the s2d transpose introduces cost more
than the padded conv reads they replace, so the discriminator keeps direct
convs and this op stays available (Conv2d(s2d=True)) for configurations
where the trade differs.  Kept unit-tested (tests/test_ops.py).

Derivation: with pad=1, output row h reads input rows 2h-1..2h+2.  Under
s2d(2) (input row 2r+a -> s2d row r, sub-row a in {0,1}), those are s2d rows
h-1..h+1 — a 3-tap kernel with pad=1 in s2d space, where tap dr uses
original tap i = 2*dr - 1 + a when 0 <= i < 4 (and 0 otherwise).  Boundary
zeros agree: s2d pad row r=-1 holds input rows -2,-1, of which only -1 (a=1)
has nonzero kernel weight — exactly torch's zero-pad row.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def space_to_depth(x: jnp.ndarray, b: int = 2) -> jnp.ndarray:
    """[N, H, W, C] -> [N, H/b, W/b, b*b*C]; channel index = (a, b, c)."""
    n, h, w, c = x.shape
    assert h % b == 0 and w % b == 0, (h, w, b)
    x = x.reshape(n, h // b, b, w // b, b, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // b, w // b, b * b * c)


def s2d_kernel_4x4s2(k: jnp.ndarray) -> jnp.ndarray:
    """Scatter a [4,4,C,O] kernel into its [3,3,4C,O] s2d(2) equivalent."""
    kh, kw, c, o = k.shape
    assert kh == 4 and kw == 4, (kh, kw)
    out = jnp.zeros((3, 3, 2, 2, c, o), k.dtype)
    for dr in range(3):
        for a in range(2):
            i = 2 * dr - 1 + a
            if not 0 <= i < 4:
                continue
            for dc in range(3):
                for b in range(2):
                    j = 2 * dc - 1 + b
                    if not 0 <= j < 4:
                        continue
                    out = out.at[dr, dc, a, b].set(k[i, j])
    return out.reshape(3, 3, 4 * c, o)


def conv4x4s2_via_s2d(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Exact equivalent of
    lax.conv(x, kernel, strides=2, padding=1, NHWC/HWIO) for a 4x4 kernel,
    computed as a 3x3/s1 conv over the space-to-depth(2) input."""
    return lax.conv_general_dilated(
        space_to_depth(x, 2),
        s2d_kernel_4x4s2(kernel),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
