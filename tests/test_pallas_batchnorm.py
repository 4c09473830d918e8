"""Pallas BN kernels vs the XLA formulation (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2r_tpu.models import layers as L
from s2r_tpu.ops.pallas.batchnorm import batch_norm_train, pair_sums


def test_pair_sums():
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(2, 8, 16, 32), jnp.float32)
    b = jnp.asarray(rng.randn(2, 8, 16, 32), jnp.float32)
    sa, sab = pair_sums(a, b, interpret=True)
    np.testing.assert_allclose(np.asarray(sa),
                               np.asarray(a).sum((0, 1, 2)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sab),
                               (np.asarray(a) * np.asarray(b)).sum((0, 1, 2)),
                               rtol=1e-5)


def _xla_bn(x, scale, bias, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(0, 1, 2))
    var = jnp.mean(jnp.square(x32), axis=(0, 1, 2)) - jnp.square(mean)
    inv = jax.lax.rsqrt(var + eps) * scale
    return (x32 - mean) * inv + bias, mean, var


def test_bn_forward_matches_xla():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 16, 32) * 2 + 1, jnp.float32)
    scale = jnp.asarray(rng.rand(32) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(32), jnp.float32)
    y, mean, var = batch_norm_train(x, scale, bias, 1e-5, True)
    y_ref, mean_ref, var_ref = _xla_bn(x, scale, bias)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(mean_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)


def test_bn_gradients_match_autodiff():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 4, 8, 16), jnp.float32)
    scale = jnp.asarray(rng.rand(16) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(16), jnp.float32)
    g = jnp.asarray(rng.randn(2, 4, 8, 16), jnp.float32)

    def ours(x, s, b):
        y, _, _ = batch_norm_train(x, s, b, 1e-5, True)
        return jnp.sum(y * g)

    def ref(x, s, b):
        y, _, _ = _xla_bn(x, s, b)
        return jnp.sum(y * g)

    do = jax.grad(ours, argnums=(0, 1, 2))(x, scale, bias)
    dr = jax.grad(ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(do, dr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


def test_bn_module_pallas_impl_matches_xla_impl():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 8, 8, 8) * 3, jnp.float32)
    mod = L.BatchNorm()
    variables = mod.init(jax.random.PRNGKey(0), x, False)

    L.set_bn_impl("xla")
    y_x, upd_x = mod.apply(variables, x, False, mutable=["batch_stats"])
    L.set_bn_impl("pallas_interpret")
    try:
        y_p, upd_p = mod.apply(variables, x, False, mutable=["batch_stats"])
    finally:
        L.set_bn_impl("xla")
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x), rtol=1e-4,
                               atol=1e-5)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(upd_p["batch_stats"][k]),
            np.asarray(upd_x["batch_stats"][k]), rtol=1e-4, atol=1e-6)
