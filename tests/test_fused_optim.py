"""The fused (flat-buffer) optimizer must match the per-leaf torch-parity
implementation exactly — same math, different kernel structure."""

import numpy as np

import jax
import jax.numpy as jnp

from s2r_tpu.train.optim import (SGD, Adam, FusedOptimizer, apply_updates,
                                 lr_mult_tree)


def _params(rng):
    return {"backbone": {"a": jnp.asarray(rng.randn(4, 3), jnp.float32),
                         "b": jnp.asarray(rng.randn(5), jnp.float32)},
            "decoder": {"c": jnp.asarray(rng.randn(2, 2, 3), jnp.float32)}}


def _run_referenceleaf(opt, params, grads_seq, lrs, mult=None):
    state = opt.init(params)
    for g, lr in zip(grads_seq, lrs):
        d, state = opt.direction(g, state, params)
        params = apply_updates(params, d, jnp.float32(lr), mult)
    return params


def _run_fused(opt, params, grads_seq, lrs, mult=None):
    f = FusedOptimizer(opt, params, mult)
    state = f.init(params)
    for g, lr in zip(grads_seq, lrs):
        params, state = f.apply(g, state, params, jnp.float32(lr))
    return params


def _check(opt, mult=None):
    rng = np.random.RandomState(0)
    params = _params(rng)
    grads_seq = [jax.tree.map(
        lambda p: jnp.asarray(rng.randn(*p.shape), jnp.float32), params)
        for _ in range(4)]
    lrs = [0.1, 0.05, 0.02, 0.01]
    a = _run_referenceleaf(opt, params, grads_seq, lrs, mult)
    b = _run_fused(opt, params, grads_seq, lrs, mult)
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-6, atol=1e-7)


def test_fused_sgd_matches_per_leaf():
    _check(SGD(momentum=0.9, weight_decay=5e-4, nesterov=False))
    _check(SGD(momentum=0.9, weight_decay=5e-4, nesterov=True))


def test_fused_adam_matches_per_leaf():
    _check(Adam(b1=0.9, b2=0.99))


def test_fused_with_lr_mult():
    rng = np.random.RandomState(1)
    params = _params(rng)
    mult = lr_mult_tree(params, {"backbone": 1.0, "decoder": 10.0})
    _check(SGD(momentum=0.9, weight_decay=5e-4), mult)
