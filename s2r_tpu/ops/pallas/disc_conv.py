"""Pallas TPU kernel: the discriminator's conv1 consuming the W-minor
softmax layout directly (VERDICT r2 item 7).

The headline output-adapt step's device profile (PARITY.md §Performance)
itemizes ~8% layout copies, dominated by three full-resolution relayouts of
the 19-channel softmax maps between the W-minor layout the softmax/CE side
computes in and the C-minor (19->128 lane-padded) layout XLA assigns the
discriminator's first convolution (reference discriminator.py:6-35, a
4x4/stride-2/pad-1 Conv2d from num_classes->ndf).  The space-to-depth
reformulation attacked the same line and measured SLOWER (its own relayout
passes cost more — see models/discriminator.py).

This kernel removes the relayout at the source instead: it takes the
softmax maps as a logical [N, H, C, W] array — whose DEFAULT custom-call
operand layout (minor-to-major = W, C, H, N) IS the W-minor physical layout
the producer already holds, so the preceding NHWC->NHCW transpose is a
layout no-op — and computes conv1 directly from it, emitting the NHWC
[N, H/2, W/2, ndf] block the rest of the (unchanged, XLA-lowered)
discriminator expects.

Lowering: input stays in HBM (memory_space=ANY); each (batch, row-tile)
program DMAs a haloed slab of 2*th+2 full [C, W] rows into VMEM scratch (H
is an untiled dim, so odd row offsets are legal — same trick as
depthwise.py), zero-fills the pad rows at the image borders, then per
output row:
  - stacks the 16 (kh, kw) taps x 19 channels plus a ones-row (bias) into
    X [305, W] at FULL width — every tap is a stride-1 lane shift, so no
    lane deinterleave is needed (Mosaic cannot lower lane-strided loads;
    both tpu.strided_load and vector.extract_strided_slice reject a
    minor-dim stride of 2),
  - one MXU matmul Kmat[ndf, 305] @ X -> [ndf, W] accumulated in f32 (2x
    the stride-2 FLOPs — the odd output columns are computed and dropped;
    the matmul is MXU-cheap next to the relayouts this kernel deletes),
  - transposes to [W, ndf], parks it in a VMEM scratch, and keeps only the
    even rows via a SUBLANE-strided ref load (stride-2 on the second-minor
    dim, which Mosaic does support) -> the [W/2, ndf] output row.

Backward stays in XLA (jax.custom_vjp): dX is a transposed conv written
with NHCW output dimension numbers (so the cotangent flows back to the
softmax side in its own layout), dK/db are small reductions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 3 * 1024 * 1024

# Process-wide interpret default for callers that don't thread the flag
# (models/layers.py Conv2d.pallas_wminor); tests on the CPU mesh set True.
INTERPRET = False


def _pick_row_tile(h_out: int, c: int, w: int, itemsize: int) -> int:
    """Largest output-row tile <= 16 dividing H/2 whose haloed input slab
    fits the scratch budget."""
    cpad = -(-c // 8) * 8
    for th in (16, 8, 4, 2, 1):
        if h_out % th:
            continue
        if (2 * th + 2) * cpad * w * itemsize <= _VMEM_BUDGET:
            return th
    return 1


def _d1_kernel(x_hbm, kmat_ref, o_ref, scratch, ysc, sem, *, th: int,
               nj: int, h: int, c: int):
    """One (batch i, row-tile j) program: output rows [j*th, (j+1)*th)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    w = x_hbm.shape[3]
    nrows = 2 * th + 2  # input rows 2*j*th - 1 .. 2*(j+1)*th

    def copy(src_row0, n, dst_row0):
        dma = pltpu.make_async_copy(
            x_hbm.at[i, pl.ds(src_row0, n), :, :],
            scratch.at[pl.ds(dst_row0, n), :, :],
            sem)
        dma.start()
        dma.wait()

    if nj == 1:
        scratch[0:1] = jnp.zeros_like(scratch[0:1])
        scratch[nrows - 1:nrows] = jnp.zeros_like(scratch[nrows - 1:nrows])
        copy(0, h, 1)
    else:
        @pl.when(j == 0)
        def _first():
            scratch[0:1] = jnp.zeros_like(scratch[0:1])
            copy(0, nrows - 1, 1)

        @pl.when(j == nj - 1)
        def _last():
            scratch[nrows - 1:nrows] = jnp.zeros_like(
                scratch[nrows - 1:nrows])
            copy(h - (nrows - 1), nrows - 1, 0)

        @pl.when((j > 0) & (j < nj - 1))
        def _interior():
            copy(2 * j * th - 1, nrows, 0)

    zcol = jnp.zeros((c, 1), scratch.dtype)
    zcol2 = jnp.zeros((c, 2), scratch.dtype)
    ones = jnp.ones((1, w), scratch.dtype)
    for r in range(th):
        pieces = []
        for kh in range(4):
            row = scratch[2 * r + kh]
            # tap kw at output col x reads input col x + kw - 1:
            pieces.append(jnp.concatenate([zcol, row[:, :w - 1]], axis=1))
            pieces.append(row)
            pieces.append(jnp.concatenate([row[:, 1:], zcol], axis=1))
            pieces.append(jnp.concatenate([row[:, 2:], zcol2], axis=1))
        x = jnp.concatenate(pieces + [ones], axis=0)  # [16c + 1, W]
        y = jnp.dot(kmat_ref[:], x,
                    preferred_element_type=jnp.float32)  # [ndf, W]
        ysc[...] = y.T  # [W, ndf]
        o_ref[0, r] = ysc[0::2, :].astype(o_ref.dtype)


def _d1_forward(x, kernel, bias, interpret=False):
    """x [N, H, C, W], kernel HWIO [4, 4, C, ndf] -> [N, H/2, W/2, ndf].

    C is zero-padded to the sublane tile (8) before the pallas_call: the
    halo DMA slices rows of the [C, W] plane, and Mosaic requires DMA
    slice shapes on a tiled dim to be tile-aligned (19 is not).  The pad
    columns carry zero kernel taps, so the matmul is unchanged."""
    n, h, c, w = x.shape
    cpad = -(-c // 8) * 8
    if cpad != c:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, cpad - c), (0, 0)))
        kernel = jnp.pad(kernel, ((0, 0), (0, 0), (0, cpad - c), (0, 0)))
        c = cpad
    kmat = pack_kernel(kernel, bias)
    ndf = kmat.shape[0]
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    th = _pick_row_tile(h // 2, c, w, x.dtype.itemsize)
    nj = (h // 2) // th
    return pl.pallas_call(
        functools.partial(_d1_kernel, th=th, nj=nj, h=h, c=c),
        out_shape=jax.ShapeDtypeStruct((n, h // 2, w // 2, ndf), x.dtype),
        grid=(n, nj),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((ndf, 16 * c + 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w // 2, ndf),
                               lambda i, j: (i, j, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2 * th + 2, c, w), x.dtype),
            pltpu.VMEM((w, ndf), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x, kmat)


def pack_kernel(kernel: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    """HWIO [4, 4, C, ndf] + [ndf] -> the kernel's [ndf, 16*C + 1] matmul
    operand, rows ordered (kh, kw, ci) to match the tap stacking."""
    kh, kw, c, ndf = kernel.shape
    assert (kh, kw) == (4, 4), (kh, kw)
    km = kernel.reshape(16 * c, ndf).T  # [(kh,kw,ci) -> flat, ndf] -> T
    return jnp.concatenate([km, bias[:, None].astype(km.dtype)], axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def disc_conv1(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
               interpret: bool = False) -> jnp.ndarray:
    """4x4 / stride 2 / pad 1 convolution + bias, input [N, H, C, W]
    (W-minor — the softmax side's native layout), output NHWC
    [N, H/2, W/2, ndf].  kernel HWIO [4, 4, C, ndf], bias [ndf]."""
    return _d1_forward(x, kernel, bias, interpret)


def _d1_fwd(x, kernel, bias, interpret):
    return _d1_forward(x, kernel, bias, interpret), (x, kernel)


def _d1_dk(x, g32):
    """dK via patch extraction: exact, runs once per step, small output."""
    n, h, c, w = x.shape
    xp = jnp.pad(x.astype(jnp.float32),
                 ((0, 0), (1, 1), (0, 0), (1, 1)))
    h2, w2 = h // 2, w // 2
    taps = []
    for kh in range(4):
        rows = xp[:, kh:kh + 2 * h2:2]          # [N, H/2, C, W+2]
        for kw in range(4):
            taps.append(rows[:, :, :, kw:kw + 2 * w2:2])  # [N,H/2,C,W/2]
    xt = jnp.stack(taps)                         # [16, N, H/2, C, W/2]
    dk = jnp.einsum("tnhcw,nhwo->tco", xt, g32)  # [16, C, ndf]
    return dk.reshape(4, 4, c, -1)


def _d1_bwd_impl(interpret, res, g):
    x, kernel = res
    g32 = g.astype(jnp.float32)
    k32 = kernel.astype(jnp.float32)
    dx = jax.lax.conv_general_dilated(
        g32, k32[::-1, ::-1], window_strides=(1, 1),
        padding=((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWOI", "NHCW"),
    ).astype(x.dtype)
    dk = _d1_dk(x, g32).astype(kernel.dtype)
    db = jnp.sum(g32, axis=(0, 1, 2)).astype(kernel.dtype)
    return dx, dk, db


disc_conv1.defvjp(_d1_fwd, _d1_bwd_impl)
