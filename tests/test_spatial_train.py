"""Train-time spatial sharding: the output-adapt step on a 2-D
(data x space) mesh — batch N over 'data', image H over 'space', GSPMD
halo exchanges inside every conv — matches single-device execution.

This is the --spatial-shard trainer path (core/mesh.py::make_mesh
spatial>1 + leaf_sharding), the conv analogue of sequence parallelism:
crops too large for one chip's HBM train by splitting each sample's
activations across chips.  The reference has no counterpart (its scope
is single-process nn.DataParallel, SURVEY.md §2.2); tolerances mirror
tests/test_steps.py::test_sharded_equals_single (same cancellation-noise
analysis)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2r_tpu.config import Config
from s2r_tpu.core.mesh import make_mesh, replicate, shard_batch
from s2r_tpu.train.setup import build_method

pytestmark = pytest.mark.slow  # step-compile / e2e: full tier only

HW = 64
N = 8


def test_spatial_sharded_step_equals_single():
    cfg = Config(crop_size=HW, base_size=HW, epochs=2, batch_size=N,
                 precision="f32", lr=0.01, pad_stats=False)
    m = build_method(cfg, iters_per_epoch=10, method="output_adapt")
    state = m.init_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(2)
    batch = {
        "src_image": jnp.asarray(rng.randn(N, HW, HW, 3), jnp.float32),
        "src_label": jnp.asarray(rng.randint(0, 19, (N, HW, HW)), jnp.int32),
        "tgt_image": jnp.asarray(rng.randn(N, HW, HW, 3), jnp.float32),
    }
    step = jax.jit(m.step_fn)
    ref_state, ref_metrics = step(state, batch)

    mesh = make_mesh(8, spatial=2)  # 4-way data x 2-way spatial
    assert mesh.shape == {"data": 4, "space": 2}
    sh_state = replicate(state, mesh)
    sh_batch = shard_batch(batch, mesh)
    # images/labels carry the 2-D spec; H is actually split across devices
    assert sh_batch["src_image"].sharding.spec == ("data", "space")
    new_state, metrics = step(sh_state, sh_batch)

    for k in ref_metrics:
        np.testing.assert_allclose(float(metrics[k]), float(ref_metrics[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)
    # Global G update direction (see test_steps.py for why elementwise
    # comparison is cancellation-noise-limited at random init).
    upd_ref = jnp.concatenate([
        (a - b).reshape(-1) for a, b in zip(
            jax.tree.leaves(ref_state.params["G"]),
            jax.tree.leaves(state.params["G"]))])
    upd_new = jnp.concatenate([
        (a - b).reshape(-1) for a, b in zip(
            jax.tree.leaves(new_state.params["G"]),
            jax.tree.leaves(state.params["G"]))])
    rel = float(jnp.linalg.norm(upd_new - upd_ref)
                / jnp.linalg.norm(upd_ref))
    assert rel < 0.05, rel
    for a, b in zip(jax.tree.leaves(ref_state.batch_stats),
                    jax.tree.leaves(new_state.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_pick_num_devices_spatial():
    from s2r_tpu.train.trainer import pick_num_devices

    # 8 devices, sp=2 -> 4 data rows; batch 4 divides 4 -> all 8 used
    assert pick_num_devices(4, None, spatial=2) == 8
    # batch 3 on 4 rows -> falls to 3 rows x 2 = 6 devices
    assert pick_num_devices(3, None, spatial=2) == 6
    # spatial must divide the device count
    import pytest
    with pytest.raises(ValueError):
        pick_num_devices(4, None, spatial=3)


def test_spatial_sharded_feature_step_equals_single():
    """The feature-adapt method (train.py path: domain classifier on the
    ASPP feature map) under the 2-D data x space mesh — the low-resolution
    feature tensors shard H across 'space' like the images do."""
    cfg = Config(crop_size=HW, base_size=HW, epochs=2, batch_size=N,
                 precision="f32", lr=0.01, pad_stats=False)
    m = build_method(cfg, iters_per_epoch=10, method="feature_adapt")
    state = m.init_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(5)
    batch = {
        "src_image": jnp.asarray(rng.randn(N, HW, HW, 3), jnp.float32),
        "src_label": jnp.asarray(rng.randint(0, 19, (N, HW, HW)), jnp.int32),
        "tgt_image": jnp.asarray(rng.randn(N, HW, HW, 3), jnp.float32),
    }
    step = jax.jit(m.step_fn)
    ref_state, ref_metrics = step(state, batch)

    mesh = make_mesh(8, spatial=2)
    new_state, metrics = step(replicate(state, mesh),
                              shard_batch(batch, mesh))
    for k in ref_metrics:
        np.testing.assert_allclose(float(metrics[k]), float(ref_metrics[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)
    for a, b in zip(jax.tree.leaves(ref_state.batch_stats),
                    jax.tree.leaves(new_state.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_spatial_shard_with_batch_pad(monkeypatch):
    """batch-pad x spatial-shard: an in-step-padded (pad_to=8) batch-4 step
    on a dp4 x sp2 mesh matches the same padded step on one device — the
    global-index pad masks are orthogonal to H sharding (BN stat masking
    reduces over N; the 'space' axis only splits H)."""
    from s2r_tpu.train import setup as setup_mod

    monkeypatch.setattr(setup_mod, "_step_pad_to", lambda cfg, n: 8)
    cfg = Config(crop_size=HW, base_size=HW, epochs=5, batch_size=4,
                 precision="f32", dataset="synthetic", pad_stats=False)
    m = build_method(cfg, 10, method="output_adapt")
    rng = np.random.RandomState(3)
    batch = {
        "src_image": jnp.asarray(rng.randn(4, HW, HW, 3), jnp.float32),
        "src_label": jnp.asarray(rng.randint(0, 19, (4, HW, HW)), jnp.int32),
        "tgt_image": jnp.asarray(rng.randn(4, HW, HW, 3), jnp.float32),
    }
    state = m.init_state(jax.random.PRNGKey(0))
    step = jax.jit(m.step_fn)
    ref_state, ref_met = step(state, batch)

    mesh = make_mesh(8, spatial=2)
    sh_state = replicate(state, mesh)
    sh_batch = shard_batch(batch, mesh)
    new_state, met = step(sh_state, sh_batch)

    for k in ref_met:
        np.testing.assert_allclose(float(met[k]), float(ref_met[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)
    for a, b in zip(jax.tree.leaves(ref_state.batch_stats),
                    jax.tree.leaves(new_state.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_trainer_spatial_shard_end_to_end(tmp_path):
    """--spatial-shard through the Trainer: 2-D mesh built, batches fed
    H-sharded, one train epoch + validation run finite."""
    from s2r_tpu.config import Config as C
    from s2r_tpu.train.trainer import Trainer

    cfg = C(dataset="synthetic", crop_size=64, base_size=64, batch_size=4,
            epochs=1, workers=2, precision="f32",
            run_root=str(tmp_path / "run"), spatial_shard=2)
    t = Trainer(cfg, method="output_adapt")
    assert t.mesh.shape == {"data": 4, "space": 2}
    means = t.training(0)
    assert np.isfinite(means["seg_loss"])
    miou = t.validation(0)
    assert 0.0 <= miou <= 1.0
