"""Pallas depthwise conv vs lax reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from s2r_tpu.ops.pallas.depthwise import depthwise_conv3x3


def _lax_dw(x, k3, dilation):
    c = x.shape[-1]
    kern = k3[:, :, None, :]  # HWIO with I=1
    return lax.conv_general_dilated(
        x, kern, window_strides=(1, 1),
        padding=((dilation, dilation), (dilation, dilation)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)


@pytest.mark.parametrize("shape,dilation", [
    ((2, 16, 24, 32), 1),
    ((1, 8, 16, 144), 1),   # C not a multiple of 128
    ((2, 16, 24, 32), 2),   # atrous
])
def test_forward_matches_lax(shape, dilation):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, shape[-1]), jnp.float32)
    ours = depthwise_conv3x3(x, k, dilation, True)
    ref = _lax_dw(x, k, dilation)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_lax():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 8, 16), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 16), jnp.float32)
    g = jnp.asarray(rng.randn(2, 8, 8, 16), jnp.float32)

    def ours(x, k):
        return jnp.sum(depthwise_conv3x3(x, k, 1, True) * g)

    def ref(x, k):
        return jnp.sum(_lax_dw(x, k, 1) * g)

    dx_o, dk_o = jax.grad(ours, argnums=(0, 1))(x, k)
    dx_r, dk_r = jax.grad(ref, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(dx_o), np.asarray(dx_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dk_o), np.asarray(dk_r),
                               rtol=1e-4, atol=1e-4)


def test_bf16():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 16, 32), jnp.bfloat16)
    k = jnp.asarray(rng.randn(3, 3, 32), jnp.bfloat16)
    ours = depthwise_conv3x3(x, k, 1, True)
    assert ours.dtype == jnp.bfloat16
    ref = _lax_dw(x.astype(jnp.float32), k.astype(jnp.float32), 1)
    np.testing.assert_allclose(np.asarray(ours, dtype=np.float32),
                               np.asarray(ref), rtol=0.05, atol=0.05)


@pytest.mark.parametrize("shape,dilation", [
    ((1, 9, 11, 4), 1),     # odd H (513-crop shape class): row tile 1/3
    ((2, 12, 20, 5), 1),    # multi-tile rows with boundary tiles
    ((1, 8, 8, 16), 2),     # single row tile (nj small) at dilation 2
])
def test_dma_halo_edges(shape, dilation):
    """The DMA-halo lowering's boundary tiles (clipped first/last-row DMAs
    + zeroed strips) must reproduce the conv's zero padding exactly."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(*shape), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, shape[-1]), jnp.float32)
    ours = depthwise_conv3x3(x, k, dilation, True)
    ref = _lax_dw(x, k, dilation)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="needs a real TPU (Mosaic lowering)")
def test_lowers_and_matches_highest_precision_on_tpu():
    """Non-interpret lowering on the real chip (128-aligned channels):
    bit-identical to lax conv at precision=HIGHEST (XLA's DEFAULT f32 conv
    is reduced-precision on TPU — see module docstring)."""
    rng = np.random.RandomState(0)
    c, d = 128, 1
    x = jnp.asarray(rng.randn(1, 16, 16, c), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, c), jnp.float32)
    got = jax.jit(lambda x, k: depthwise_conv3x3(x, k, d))(x, k)
    hi = jax.jit(lambda x, k: lax.conv_general_dilated(
        x, k[:, :, None, :].reshape(3, 3, 1, c), (1, 1), ((d, d), (d, d)),
        rhs_dilation=(d, d), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c, precision=lax.Precision.HIGHEST))(x, k)
    assert float(jnp.abs(got - hi).max()) == 0.0
