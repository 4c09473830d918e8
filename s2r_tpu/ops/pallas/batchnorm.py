"""Pallas TPU kernels for training-mode BatchNorm.

Profiling the train step (512x1024, batch 8, v5e) shows XLA's BN fusions —
forward (mean, var, normalize) and backward (dbeta/dgamma reductions + dx) —
running at ~100-150 GB/s, an ~8x slack against HBM, and together costing
~1/3 of the step.  Exact BN is two passes by nature; what Pallas buys is
each pass running at memcpy speed.

One kernel serves both directions:
    pair_sums(a, b) -> (sum(a), sum(a*b)) per channel, f32 accumulation
- forward stats:  pair_sums(x, x)  -> (sum x, sum x^2) => mean, biased var
- backward sums:  pair_sums(g, x)  -> (sum g, sum g*x)
  from which dbeta = sum g, dgamma = inv*(sum gx - mean*sum g), and dx is a
  cheap elementwise expression XLA fuses with its neighbours.

`batch_norm_train` is the custom-VJP composite used by
s2r_tpu.models.layers.BatchNorm when enabled.  The backward math matches
autodiff through the standard biased-variance BN:
    xhat = (x - mean) * inv
    dx   = gamma*inv * (g - mean_g - xhat * mean_g_xhat)
with mean_g = sum(g)/M, mean_g_xhat = sum(g*xhat)/M.

NOTE: these kernels see the *local* array.  Under a multi-chip GSPMD step
use the XLA path (or wrap in shard_map + psum of the two sums); the
BatchNorm module handles that switch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Budget for the two input tiles per grid step.  Pallas double-buffers each
# input for pipelining and Mosaic pads tiles to lane multiples, so the real
# scoped-VMEM footprint is ~4-5x this; keep well under the 16 MB limit.
_VMEM_BUDGET = 3 * 1024 * 1024


def _pick_tm(m: int, c: int, itemsize: int) -> int:
    best = 1
    for tm in (2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if m % tm == 0 and 2 * tm * c * itemsize <= _VMEM_BUDGET:
            return tm
        if m % tm == 0 and best == 1:
            best = tm
    return best


def _pair_sums_kernel(a_ref, b_ref, sa_ref, sab_ref, acc_a, acc_ab):
    i = pl.program_id(0)
    a = a_ref[...].astype(jnp.float32)
    b = b_ref[...].astype(jnp.float32)
    pa = jnp.sum(a, axis=0, keepdims=True)
    pab = jnp.sum(a * b, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        acc_a[...] = pa
        acc_ab[...] = pab

    @pl.when(i > 0)
    def _():
        acc_a[...] += pa
        acc_ab[...] += pab

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        sa_ref[...] = acc_a[...]
        sab_ref[...] = acc_ab[...]


def pair_sums(a: jnp.ndarray, b: jnp.ndarray, interpret: bool = False):
    """Per-channel (sum a, sum a*b) over all leading dims; f32 outputs.

    a, b: [..., C] with identical shapes.
    """
    c = a.shape[-1]
    a2 = a.reshape(-1, c)
    b2 = b.reshape(-1, c)
    m = a2.shape[0]
    tm = _pick_tm(m, c, a2.dtype.itemsize)
    grid = (m // tm,)
    sa, sab = pl.pallas_call(
        _pair_sums_kernel,
        out_shape=(jax.ShapeDtypeStruct((1, c), jnp.float32),
                   jax.ShapeDtypeStruct((1, c), jnp.float32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((1, c), lambda i: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, c), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((1, c), jnp.float32),
                        pltpu.VMEM((1, c), jnp.float32)],
        interpret=interpret,
    )(a2, b2)
    return sa[0], sab[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def batch_norm_train(x, scale, bias, eps: float = 1e-5,
                     interpret: bool = False):
    """Training-mode BN: returns (y, mean, biased_var).

    y is computed in x.dtype; mean/var are f32 (for running-stat updates).
    """
    y, mean, var, _ = _bn_fwd_impl(x, scale, bias, eps, interpret)
    return y, mean, var


def _bn_fwd_impl(x, scale, bias, eps, interpret):
    m = int(np.prod(x.shape[:-1]))
    sx, sxx = pair_sums(x, x, interpret)
    mean = sx / m
    var = sxx / m - jnp.square(mean)
    inv = jax.lax.rsqrt(var + eps)
    a = (inv * scale).astype(x.dtype)
    b = (bias - mean * inv * scale).astype(x.dtype)
    y = x * a + b
    return y, mean, var, inv


def _bn_fwd(x, scale, bias, eps, interpret):
    y, mean, var, inv = _bn_fwd_impl(x, scale, bias, eps, interpret)
    return (y, mean, var), (x, scale, mean, inv)


def _bn_bwd(eps, interpret, res, cts):
    gy, _, _ = cts  # cotangents of (y, mean, var); stats feed only
    # non-differentiated running-stat updates, so their cotangents are zero.
    x, scale, mean, inv = res
    m = int(np.prod(x.shape[:-1]))
    sg, sgx = pair_sums(gy, x, interpret)
    mean_g = sg / m
    # sum(g * xhat) = inv * (sum(g*x) - mean * sum(g))
    mean_g_xhat = inv * (sgx - mean * sg) / m
    xhat = (x.astype(jnp.float32) - mean) * inv
    dx = (scale * inv) * (gy.astype(jnp.float32) - mean_g
                          - xhat * mean_g_xhat)
    dscale = inv * (sgx - mean * sg)
    dbias = sg
    return (dx.astype(x.dtype), dscale.astype(scale.dtype),
            dbias.astype(scale.dtype))


batch_norm_train.defvjp(_bn_fwd, _bn_bwd)
