"""Bilinear resize with torch `align_corners=True` semantics, as matmuls.

The reference upsamples with F.interpolate(..., mode='bilinear',
align_corners=True) in four places (reference: deeplab.py:31, assp.py:71,
decoder.py:39, train.py:184).  jax.image.resize has no align_corners mode, so
logit parity requires a custom op.

TPU-first design: separable 1-D interpolation expressed as two dense
matmuls —  out = M_h @ x @ M_w^T  per (batch, channel) — instead of gathers.
The interpolation matrices are built with numpy at trace time (static shapes),
so the whole op is two MXU matmuls that XLA can fuse with neighbours, and its
transpose (the VJP) is again two matmuls.  Each matrix has at most two
non-zeros per row; for the typical 4x-32x upsamples here the matmul cost is
negligible next to the convs and the MXU runs it at full tile utilization.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) align-corners bilinear interpolation matrix (f64;
    cast to the compute dtype at use).

    Row o holds the weights of input samples for output sample o at
    coordinate o * (in-1)/(out-1)  (torch align_corners=True convention;
    out_size==1 maps to coordinate 0, in_size==1 broadcasts).
    """
    m = np.zeros((out_size, in_size), dtype=np.float64)
    if in_size == 1:
        m[:, 0] = 1.0
        return m
    scale = 0.0 if out_size == 1 else (in_size - 1) / (out_size - 1)
    coords = np.arange(out_size, dtype=np.float64) * scale
    lo = np.floor(coords).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    w = coords - lo
    rows = np.arange(out_size)
    np.add.at(m, (rows, lo), 1.0 - w)
    np.add.at(m, (rows, hi), w)
    return m


def resize_bilinear_align_corners(x: jnp.ndarray, out_hw, dtype=None) -> jnp.ndarray:
    """Resize NHWC `x` to spatial size `out_hw` (h, w).

    Matches torch F.interpolate(mode='bilinear', align_corners=True) on the
    same input, up to float associativity.
    """
    n, h, w, c = x.shape
    oh, ow = int(out_hw[0]), int(out_hw[1])
    if (oh, ow) == (h, w):
        return x if dtype is None else x.astype(dtype)
    out_dtype = dtype if dtype is not None else x.dtype
    # Interpolate in >= f32 (f64 inputs keep f64 — precision tests): the two
    # matmuls accumulate on the MXU in f32 regardless of activation dtype.
    compute = jnp.promote_types(x.dtype, jnp.float32)
    mh = jnp.asarray(_interp_matrix(h, oh), compute)
    mw = jnp.asarray(_interp_matrix(w, ow), compute)
    y = x.astype(compute)
    y = jnp.einsum("oh,bhwc->bowc", mh, y, precision="highest")
    y = jnp.einsum("pw,bowc->bopc", mw, y, precision="highest")
    return y.astype(out_dtype)
