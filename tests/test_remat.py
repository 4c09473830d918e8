"""Remat must not change numerics — only the backward-pass schedule."""

import numpy as np

import jax
import jax.numpy as jnp

from s2r_tpu.config import Config
from s2r_tpu.train.setup import build_method

import pytest

pytestmark = pytest.mark.slow  # step-compile / e2e: full tier only

HW, N = 32, 2


def test_remat_step_matches_no_remat():
    batch = {
        "src_image": jnp.asarray(np.random.RandomState(0).randn(N, HW, HW, 3),
                                 jnp.float32),
        "src_label": jnp.asarray(
            np.random.RandomState(1).randint(0, 19, (N, HW, HW)), jnp.int32),
        "tgt_image": jnp.asarray(np.random.RandomState(2).randn(N, HW, HW, 3),
                                 jnp.float32),
    }
    states = {}
    for remat in (False, True):
        cfg = Config(crop_size=HW, base_size=HW, batch_size=N, epochs=2,
                     precision="f32", remat=remat)
        m = build_method(cfg, iters_per_epoch=10, method="output_adapt")
        state = m.init_state(jax.random.PRNGKey(0))
        state, metrics = jax.jit(m.step_fn)(state, batch)
        states[remat] = (state, metrics)

    s0, m0 = states[False]
    s1, m1 = states[True]
    for k in m0:
        np.testing.assert_allclose(float(m0[k]), float(m1[k]), rtol=1e-5,
                                   atol=1e-6, err_msg=k)
    for a, b in zip(jax.tree.leaves(s0.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-6)
    for a, b in zip(jax.tree.leaves(s0.batch_stats),
                    jax.tree.leaves(s1.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-6)
