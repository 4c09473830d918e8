import os

import numpy as np

import jax
import jax.numpy as jnp

from s2r_tpu.config import Config
from s2r_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from s2r_tpu.io.saver import Saver
from s2r_tpu.train.setup import build_method


def _tiny_state():
    cfg = Config(crop_size=32, base_size=32, batch_size=2, epochs=1,
                 precision="f32")
    m = build_method(cfg, iters_per_epoch=2, method="output_adapt")
    return m, m.init_state(jax.random.PRNGKey(0))


def test_checkpoint_roundtrip(tmp_path):
    m, state = _tiny_state()
    path = str(tmp_path / "ckpt.msgpack")
    save_checkpoint(path, state, epoch=3, best_pred=0.25)
    payload = load_checkpoint(path, state_template=state)
    assert payload["epoch"] == 3
    assert payload["best_pred"] == 0.25
    restored = payload["state"]
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_resume_continues_training(tmp_path):
    m, state = _tiny_state()
    batch = {
        "src_image": jnp.zeros((2, 32, 32, 3), jnp.float32),
        "src_label": jnp.zeros((2, 32, 32), jnp.int32),
        "tgt_image": jnp.zeros((2, 32, 32, 3), jnp.float32),
    }
    step = jax.jit(m.step_fn)
    state1, _ = step(state, batch)
    path = str(tmp_path / "c.msgpack")
    save_checkpoint(path, state1, epoch=1, best_pred=0.0)
    restored = load_checkpoint(path, state_template=state)["state"]
    # stepping the restored state equals stepping the live state
    s_live, _ = step(state1, batch)
    s_rest, _ = step(restored, batch)
    for a, b in zip(jax.tree.leaves(s_live.params),
                    jax.tree.leaves(s_rest.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_saver_experiment_dirs_and_best_promotion(tmp_path, monkeypatch):
    cfg = Config(dataset="synthetic", checkname="deeplab-mobilenet",
                 run_root=str(tmp_path / "run"))
    m, state = _tiny_state()

    s0 = Saver(cfg)
    assert s0.experiment_dir.endswith("experiment_0")
    s0.save_experiment_config()
    assert os.path.exists(os.path.join(s0.experiment_dir, "parameters.txt"))
    s0.save_checkpoint(state, epoch=1, best_pred=0.30, is_best=True)
    s0.wait()
    best = os.path.join(s0.directory, "model_best.ckpt")
    assert os.path.exists(best)

    # a second experiment that does NOT beat 0.30 must not promote
    s1 = Saver(cfg)
    assert s1.experiment_dir.endswith("experiment_1")
    mtime = os.path.getmtime(best)
    s1.save_checkpoint(state, epoch=1, best_pred=0.20, is_best=True)
    s1.wait()
    assert os.path.getmtime(best) == mtime

    # a third experiment that beats it must promote
    s2 = Saver(cfg)
    s2.save_checkpoint(state, epoch=1, best_pred=0.40, is_best=True)
    s2.wait()
    payload = load_checkpoint(best)
    assert payload["best_pred"] == 0.40


def test_async_save_matches_sync_byte_identical(tmp_path):
    """Async mode (on-device snapshot + background writer) must produce a
    file byte-identical to a synchronous save of the same state."""
    m, state = _tiny_state()
    cfg_a = Config(dataset="synthetic", checkname="a",
                   run_root=str(tmp_path / "run"), async_save=True)
    cfg_s = Config(dataset="synthetic", checkname="s",
                   run_root=str(tmp_path / "run"), async_save=False)
    sa, ss = Saver(cfg_a), Saver(cfg_s)
    pa = sa.save_checkpoint(state, epoch=2, best_pred=0.5, is_best=True)
    ps = ss.save_checkpoint(state, epoch=2, best_pred=0.5, is_best=True)
    sa.wait()
    ss.wait()  # no-op in sync mode
    with open(pa, "rb") as f:
        ba = f.read()
    with open(ps, "rb") as f:
        bs = f.read()
    assert ba == bs and len(ba) > 0


def test_async_save_snapshot_survives_donation(tmp_path):
    """The state captured for an async save must not alias the buffers the
    (donating) train step consumes: mutate the live state by stepping after
    submitting the save — the written checkpoint holds the OLD values."""
    m, state = _tiny_state()
    cfg = Config(dataset="synthetic", checkname="d",
                 run_root=str(tmp_path / "run"), async_save=True)
    sv = Saver(cfg)
    before = [np.asarray(x).copy() for x in jax.tree.leaves(state)]
    path = sv.save_checkpoint(state, epoch=1, best_pred=0.1, is_best=False)
    batch = {
        "src_image": jnp.ones((2, 32, 32, 3), jnp.float32),
        "src_label": jnp.zeros((2, 32, 32), jnp.int32),
        "tgt_image": jnp.ones((2, 32, 32, 3), jnp.float32),
    }
    step = jax.jit(m.step_fn, donate_argnums=0)
    state, _ = step(state, batch)
    jax.block_until_ready(state)
    sv.wait()
    restored = load_checkpoint(path, state_template=state)["state"]
    for a, b in zip(before, jax.tree.leaves(restored)):
        np.testing.assert_array_equal(a, np.asarray(b))


def test_async_save_error_surfaces_on_wait(tmp_path):
    """A background write failure must raise (on wait), not pass silently."""
    import pytest

    m, state = _tiny_state()
    cfg = Config(dataset="synthetic", checkname="e",
                 run_root=str(tmp_path / "run"), async_save=True)
    sv = Saver(cfg)
    sv.save_checkpoint(state, epoch=1, best_pred=0.1, is_best=False,
                       filename="no_such_dir/x.ckpt")
    with pytest.raises(OSError):
        sv.wait()
