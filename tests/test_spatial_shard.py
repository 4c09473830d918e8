"""Spatially-sharded (H-axis) evaluation == unsharded evaluation.

GSPMD inserts conv halo exchanges automatically; this is the multi-chip
path for full-resolution sweeps (BASELINE config 5 at 2048x1024)."""

import numpy as np

import jax
import jax.numpy as jnp

from s2r_tpu.config import Config
from s2r_tpu.core.mesh import make_mesh, replicate, shard_spatial
from s2r_tpu.train.setup import build_method

import pytest

pytestmark = pytest.mark.slow  # step-compile / e2e: full tier only


def test_spatially_sharded_eval_matches():
    cfg = Config(crop_size=64, base_size=64, batch_size=2, epochs=1,
                 precision="f32")
    m = build_method(cfg, iters_per_epoch=1, method="output_adapt")
    state = m.init_state(jax.random.PRNGKey(0))
    params, bstats = m.eval_variables(state)

    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.randn(1, 128, 128, 3), jnp.float32)
    label = jnp.asarray(rng.randint(0, 19, (1, 128, 128)), jnp.int32)
    eval_step = jax.jit(m.eval_step)
    loss_ref, cm_ref, pred_ref = eval_step(params, bstats, image, label)

    mesh = make_mesh()
    assert mesh.devices.size == 8
    sharded = shard_spatial({"image": image, "label": label}, mesh)
    params_r = replicate(params, mesh)
    bstats_r = replicate(bstats, mesh)
    loss, cm, pred = eval_step(params_r, bstats_r, sharded["image"],
                               sharded["label"])
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(cm), np.asarray(cm_ref))
    agree = (np.asarray(pred) == np.asarray(pred_ref)).mean()
    assert agree > 0.999, agree  # boundary ties may flip an isolated argmax


def test_spatially_sharded_eval_on_2d_mesh():
    """--eval-spatial-shard on the 2-D (data x space) training mesh: H must
    split over BOTH axes (all 8 devices), not replicate across 'space' —
    the --spatial-shard x --eval-spatial-shard interaction."""
    cfg = Config(crop_size=64, base_size=64, batch_size=2, epochs=1,
                 precision="f32")
    m = build_method(cfg, iters_per_epoch=1, method="output_adapt")
    state = m.init_state(jax.random.PRNGKey(0))
    params, bstats = m.eval_variables(state)

    rng = np.random.RandomState(1)
    image = jnp.asarray(rng.randn(1, 128, 128, 3), jnp.float32)
    label = jnp.asarray(rng.randint(0, 19, (1, 128, 128)), jnp.int32)
    eval_step = jax.jit(m.eval_step)
    loss_ref, cm_ref, pred_ref = eval_step(params, bstats, image, label)

    mesh = make_mesh(8, spatial=2)
    sharded = shard_spatial({"image": image, "label": label}, mesh)
    # H actually splits across every device (8-way), no 'space' replicas
    assert sharded["image"].sharding.spec == (None, ("data", "space"))
    assert len(sharded["image"].addressable_shards) == 8
    assert sharded["image"].addressable_shards[0].data.shape[1] == 16
    loss, cm, pred = eval_step(replicate(params, mesh),
                               replicate(bstats, mesh),
                               sharded["image"], sharded["label"])
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(cm), np.asarray(cm_ref))
    agree = (np.asarray(pred) == np.asarray(pred_ref)).mean()
    assert agree > 0.999, agree
