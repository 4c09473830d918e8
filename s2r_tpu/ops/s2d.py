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

MEASURED RESULT 2 (round 5): the 3x3/s2 STEM variant (conv3x3s2_via_s2d,
MobileNetV2(stem_s2d=True)) is also a refutation in-context — full-res
2048x1024 b8 decoder-mode serving measured 7.33 vs 7.22 ms/image in a
same-window A/B against the split-concat control, despite the input
copy (bf16[8,1024,2048,3], 3.14 ms/step, 6%) and the 5.40 ms stem being
the profile's targets.  The s2d pad+reshape+transpose of the full-res
frame is itself a full-res pass through the same 12->128-lane-padded
layout class it tries to avoid.  Third refutation of the relayout-attack
class (disc s2d, Pallas W-minor, stem s2d); the copies stand as the
formulation's ceiling.

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


def s2d_kernel_3x3s2(k: jnp.ndarray) -> jnp.ndarray:
    """Scatter a [3,3,C,O] kernel into its [2,2,4C,O] s2d(2) equivalent.

    With pad=1 and stride 2, output row h reads input rows 2h-1..2h+1 =
    s2d rows h-1 (sub-row a=1 only) and h (a in {0,1}) — a 2-tap kernel
    with pad (1, 0) in s2d space.  Tap (dr, a) uses original row
    i = 2*dr + a - 1 when 0 <= i < 3 (else zero); the s2d pad row holds
    input rows -2,-1 of which only -1 carries weight — exactly the
    original zero-pad row.  The bottom/right original pad rows are never
    read (2h+1 <= H-1 for h < H/2), so no s2d pad is needed there."""
    kh, kw, c, o = k.shape
    assert kh == 3 and kw == 3, (kh, kw)
    out = jnp.zeros((2, 2, 2, 2, c, o), k.dtype)
    for dr in range(2):
        for a in range(2):
            i = 2 * dr + a - 1
            if not 0 <= i < 3:
                continue
            for dc in range(2):
                for b in range(2):
                    j = 2 * dc + b - 1
                    if not 0 <= j < 3:
                        continue
                    out = out.at[dr, dc, a, b].set(k[i, j])
    return out.reshape(2, 2, 4 * c, o)


def conv3x3s2_via_s2d(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Exact equivalent of
    lax.conv(x, kernel, strides=2, padding=1, NHWC/HWIO) for a 3x3 kernel
    on even H/W, computed as a 2x2/s1 conv over the space-to-depth(2)
    input.  Motivation: a C=3 stem input pads 3 -> 128 lanes in the conv's
    operand layout (a ~42x physical blowup on the full-res frame); the
    s2d input carries 12 channels (~10.7x), cutting the relayout-copy and
    conv-read traffic ~4x."""
    return lax.conv_general_dilated(
        space_to_depth(x, 2),
        s2d_kernel_3x3s2(kernel),
        window_strides=(1, 1),
        padding=((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


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
