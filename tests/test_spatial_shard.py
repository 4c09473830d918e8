"""Spatially-sharded (H-axis) evaluation == unsharded evaluation.

GSPMD inserts conv halo exchanges automatically; this is the multi-chip
path for full-resolution sweeps (BASELINE config 5 at 2048x1024)."""

import numpy as np

import jax
import jax.numpy as jnp

from s2r_tpu.config import Config
from s2r_tpu.core.mesh import make_mesh, replicate, shard_spatial
from s2r_tpu.train.setup import build_method


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
