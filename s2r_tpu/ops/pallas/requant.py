"""Pallas requantization: s32 conv accumulators -> int8, at roofline.

Motivation (exp/requant_probe.py + the serve_decoder_int8 profile in
PARITY.md §Performance): the profile's dominant op — a 24.25 ms/step
`clamp_convert_fusion s8[8,256,512,256]`, 37% of serving device time —
is the int8 conv FUSED with this requant epilogue, running ~4x slower
than the same conv+requant chain measured standalone
(exp/int8_probe.py: 5.54 ms).  This kernel exists to force a fusion
boundary there: the conv emits its s32 accumulators unfused, and the
requant streams flat [tm, C] tiles (s32 in, s8 out) with the f32
arithmetic on the VPU.  Isolated cost ~6.8 ms incl. probe overhead
(exp/requant_probe.py table).

END-TO-END VERDICT (round-5 three-arm A/B, PARITY.md §Performance
"Pallas-requant end-to-end A/B"): NEUTRAL — 8.82 ms/image with this
kernel vs 8.81 with the plain XLA chain (exact mode 7.60 in the same
window), full-res 2048x1024 b8 decoder-int8 serving on v5e.  Forcing
the fusion boundary moves the cost around without changing the total:
the loss lives in Mosaic's int8-conv lowering itself, not in where the
requant fuses.  `io/quant.py` therefore defaults requant='auto' to
'xla'; the kernel stays as the reproducible A/B arm.

Semantics (exact match of io/quant.py's requant line):

    out = clamp(round_nearest_even(x * m[c] + b[c]), 0, 127) -> int8

i.e. the per-output-channel dequant scale, the folded-BN bias, and the
next layer's activation quant scale are pre-folded into (m, b) by the
caller; the [0, 127] clamp doubles as the ReLU.

Falls back to the plain XLA chain when the flattened row count doesn't
tile cleanly or Pallas is unavailable (interpret mode covers CPU tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Nominal input-tile budget ~2 MB (CLAUDE.md: Mosaic double-buffers every
# input block; keep nominal tiles well under the 16 MB scoped-VMEM limit).
# _MAX_TM caps rows; _TILE_BYTES caps tm*C*4 so wide-channel callers
# (C >= 512) don't blow the scoped-VMEM budget either.
_MAX_TM = 2048
_TILE_BYTES = 2 * 1024 * 1024


def _requant_kernel(x_ref, m_ref, b_ref, o_ref):
    z = x_ref[...].astype(jnp.float32) * m_ref[...] + b_ref[...]
    z = jnp.clip(jnp.round(z), 0.0, 127.0)
    o_ref[...] = z.astype(jnp.int8)


def _pick_tm(m_rows: int, c: int) -> int:
    tm = 1
    while (tm < _MAX_TM and m_rows % (tm * 2) == 0
           and tm * 2 * c * 4 <= _TILE_BYTES):
        tm *= 2
    return tm


def requant_xla(x, m, b):
    """The plain-XLA reference chain (also the fallback path)."""
    z = x.astype(jnp.float32) * m + b
    return jnp.clip(jnp.round(z), 0, 127).astype(jnp.int8)


def requant_s32_to_s8(x, m, b, inv_a=None, *, interpret: bool = False):
    """clamp(round(x*m*inv_a + b*inv_a), 0, 127) -> int8, streaming tiles.

    x: s32 [..., C]; m, b: f32 [C] (per-channel dequant scale / bias);
    inv_a: optional extra scalar (the next layer's 1/activation-scale) —
    folded into m and b here so the kernel is one multiply-add.
    """
    mf = jnp.asarray(m, jnp.float32)
    bf = jnp.asarray(b, jnp.float32)
    if inv_a is not None:
        mf = mf * inv_a
        bf = bf * inv_a
    c = x.shape[-1]
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    tm = _pick_tm(rows, c)
    if not interpret and (tm < 32 or c % 128 != 0):
        return requant_xla(x, mf, bf)  # shapes Mosaic would pad anyway
    xf = x.reshape(rows, c)
    out = pl.pallas_call(
        _requant_kernel,
        grid=(rows // tm,),
        in_specs=[
            pl.BlockSpec((tm, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tm, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, c), jnp.int8),
        interpret=interpret,
    )(xf, mf.reshape(1, c), bf.reshape(1, c))
    return out.reshape(x.shape)
