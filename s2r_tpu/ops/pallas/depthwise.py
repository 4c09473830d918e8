"""Pallas TPU kernel: 3x3 depthwise convolution (stride 1, any dilation).

MobileNetV2 is built on depthwise convs (reference mobilenet.py:40,54).  They
do no MXU work — each output element is 9 multiply-adds on the VPU — so their
cost is pure memory traffic, and XLA's generic conv lowering can spend more
time in layout shuffling than arithmetic.  This kernel streams NHWC tiles
through VMEM exactly once: for each (batch, row-tile, channel-tile) grid cell
it reads a haloed input tile (element-indexed overlapping blocks over the
pre-padded input) and accumulates the 9 taps as shifted VPU multiply-adds in
f32.

Layout: x [N, H, W, C], kernel [3, 3, C] (the HWIO depthwise kernel squeezed
of its singleton I axis), symmetric padding by `dilation` (= the reference's
fixed_padding, mobilenet.py:17-23).  Stride-2 blocks fall back to lax
(4 of 17 MobileNet blocks).

A custom VJP makes it trainable:
- dx = stride-1 depthwise correlation of the cotangent with the spatially
  flipped kernel — this same kernel again;
- dk[dy, dx, c] = sum_nhw x_shifted * g — 9 multiply-reduces left to XLA
  (tiny next to the conv itself and fused with neighbours).

STATUS: numerically verified in interpret mode (tests/test_pallas_depthwise
.py).  The Mosaic TPU lowering currently rejects this block spec (mixing
Element-indexed and Blocked dims; (8,128)-divisibility of trailing block
dims), so the kernel is not yet wired into the model — and the measured
payoff is bounded: the whole conv category is ~9% of step time in the
512x1024 profile, with XLA's depthwise lowering already adequate.  Revisit
with an all-Element block spec if depthwise ever dominates a profile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 6 * 1024 * 1024  # input-tile budget (bytes)


def _pick_tiles(h: int, w: int, c: int, d: int, itemsize: int):
    """(row tile, channel tile): channel tile divides C; row tile divides H;
    input tile (th + 2d, w + 2d, ct) fits the VMEM budget."""
    for ct in sorted({k for k in range(1, c + 1) if c % k == 0},
                     reverse=True):
        if ct > 512:
            continue
        for th in (32, 16, 8, 4, 2, 1):
            if h % th:
                continue
            if (th + 2 * d) * (w + 2 * d) * ct * itemsize <= _VMEM_BUDGET:
                return th, ct
    return 1, min(c, 128)


def _dw_kernel(x_ref, k_ref, o_ref, *, d: int, th: int):
    w = o_ref.shape[2]
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = x_ref[:, dy * d:dy * d + th, dx * d:dx * d + w, :]
            acc += tap.astype(jnp.float32) * k_ref[dy, dx, :].astype(
                jnp.float32)
    o_ref[:] = acc.astype(o_ref.dtype)


def _dw_forward(x, kernel, dilation, interpret=False):
    n, h, w, c = x.shape
    d = dilation
    xp = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
    th, ct = _pick_tiles(h, w, c, d, xp.dtype.itemsize)
    grid = (n, h // th, c // ct)
    return pl.pallas_call(
        functools.partial(_dw_kernel, d=d, th=th),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, pl.Element(th + 2 * d), pl.Element(w + 2 * d), ct),
                lambda i, j, k: (i, j * th, 0, k),
                memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, ct), lambda i, j, k: (0, 0, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w, ct), lambda i, j, k: (i, j, 0, k),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp, kernel)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def depthwise_conv3x3(x: jnp.ndarray, kernel: jnp.ndarray, dilation: int = 1,
                      interpret: bool = False) -> jnp.ndarray:
    """x [N, H, W, C], kernel [3, 3, C] -> [N, H, W, C] (stride 1, pad d)."""
    return _dw_forward(x, kernel, dilation, interpret)


def _dw_fwd(x, kernel, dilation, interpret):
    return _dw_forward(x, kernel, dilation, interpret), (x, kernel)


def _dw_bwd(dilation, interpret, res, g):
    x, kernel = res
    k_flip = kernel[::-1, ::-1, :]
    dx = _dw_forward(g.astype(x.dtype), k_flip, dilation, interpret)
    d = dilation
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (d, d), (d, d), (0, 0)))
    g32 = g.astype(jnp.float32)
    h, w = x.shape[1], x.shape[2]
    rows = []
    for dy in range(3):
        row = []
        for dx_ in range(3):
            tap = xp[:, dy * d:dy * d + h, dx_ * d:dx_ * d + w, :]
            row.append(jnp.sum(tap * g32, axis=(0, 1, 2)))
        rows.append(jnp.stack(row))
    dk = jnp.stack(rows).astype(kernel.dtype)
    return dx, dk


depthwise_conv3x3.defvjp(_dw_fwd, _dw_bwd)
