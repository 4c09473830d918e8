"""Masked batch padding (Config.batch_pad): the step computed on a batch
zero-padded to a TPU-friendly size must produce the SAME parameter update,
BN statistics and losses as the unpadded step.

The pad samples are masked out of BN stats (models/layers.py::bn_real_batch),
CE (ignore_index labels), the batch-axis adversarial softmax, and the
discriminator/domain means (train/steps.py).  Dropout masks for the real
rows agree because counter-based PRNGs assign bits row-major: the first k
rows of an [N, ...] draw use the same counters as a [k, ...] draw.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2r_tpu.config import Config
from s2r_tpu.train import setup as setup_mod
from s2r_tpu.train.setup import build_method

pytestmark = pytest.mark.slow  # step-compile / e2e: full tier only

CROP = 64
K = 3      # real batch (not a multiple of anything nice)
PAD = 4    # padded batch


def _cfg(**kw):
    return Config(crop_size=CROP, base_size=CROP, batch_size=K, epochs=5,
                  precision="f32", dataset="synthetic", **kw)


def _batch(source_only=False):
    rng = np.random.RandomState(0)
    if source_only:
        return {
            "image": jnp.asarray(rng.randn(K, CROP, CROP, 3), jnp.float32),
            "label": jnp.asarray(rng.randint(0, 19, (K, CROP, CROP)),
                                 jnp.int32),
        }
    return {
        "src_image": jnp.asarray(rng.randn(K, CROP, CROP, 3), jnp.float32),
        "src_label": jnp.asarray(rng.randint(0, 19, (K, CROP, CROP)),
                                 jnp.int32),
        "tgt_image": jnp.asarray(rng.randn(K, CROP, CROP, 3), jnp.float32),
    }


def _tree_allclose(a, b, rtol=1e-2, atol=1e-4):
    """The padded and unpadded steps are mathematically identical but
    reduce in different orders (masked sum over 4 rows vs mean over 3), and
    Adam's first-step update g/(sqrt(g^2)+eps) ~ sign(g) amplifies ~1e-8
    gradient noise to ~3e-5 in params where g ~ 0.  A real masking bug
    (e.g. BN stats including a pad sample) shifts means by ~25% and fails
    these bounds by orders of magnitude."""
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


@pytest.mark.parametrize("method,src_only", [
    ("output_adapt", False),
    ("feature_adapt", False),
    ("source_only", True),
])
def test_padded_step_matches_unpadded(monkeypatch, method, src_only):
    cfg = _cfg()
    batch = _batch(src_only)

    m_plain = build_method(cfg, 10, method=method)
    state = m_plain.init_state(jax.random.PRNGKey(0))
    s1, met1 = jax.jit(m_plain.step_fn)(state, batch)

    monkeypatch.setattr(setup_mod, "_step_pad_to", lambda cfg, n: PAD)
    m_pad = build_method(cfg, 10, method=method)
    state2 = m_pad.init_state(jax.random.PRNGKey(0))
    s2, met2 = jax.jit(m_pad.step_fn)(state2, batch)

    # Params sit on an f32 noise floor, not a semantic one: BN-bias
    # gradients are tiny residuals of near-total cancellation (downstream
    # BNs renormalize shifts), so reduction-order changes move them ~1e-3;
    # Adam's first step (D) turns 1e-8 gradient noise into +-lr sign flips.
    # The SHARP checks are the metrics below (1e-5 — a real masking bug
    # shifts BN means ~25% and the losses in the 2nd decimal) and
    # test_masked_bn_grads_exact_f64 (gradient exactness at 1e-12 in f64).
    _tree_allclose(s1.params["G"], s2.params["G"], atol=2e-3)
    _tree_allclose(s1.params["D"], s2.params["D"], atol=2e-3)
    _tree_allclose(s1.batch_stats, s2.batch_stats)
    for k in met1:
        np.testing.assert_allclose(np.asarray(met1[k]), np.asarray(met2[k]),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"metric {k}")


def test_pad_to_rounding():
    from s2r_tpu.train.setup import _step_pad_to

    # off / non-TPU auto -> None (tests run on CPU)
    assert _step_pad_to(_cfg(), 1) is None
    cfg = _cfg(batch_pad="off")
    assert _step_pad_to(cfg, 1) is None

    # force the TPU branch
    import s2r_tpu.train.setup as S

    class FakeCfg:
        batch_pad = "auto"
        batch_size = 4

    orig = S.jax.default_backend
    S.jax.default_backend = lambda: "tpu"
    try:
        assert _step_pad_to(FakeCfg, 1) == 8
        FakeCfg.batch_size = 8
        assert _step_pad_to(FakeCfg, 1) is None
        FakeCfg.batch_size = 12
        assert _step_pad_to(FakeCfg, 2) == 16
        FakeCfg.batch_size = 6
        assert _step_pad_to(FakeCfg, 1) == 8
    finally:
        S.jax.default_backend = orig


def test_masked_bn_grads_exact_f64():
    """The masked-BN padded formulation is gradient-EXACT: on a small
    conv->BN->relu6->conv->BN chain in float64, grads wrt params for the
    padded+masked batch match the unpadded batch to ~1e-12 (no tolerance
    games).  The full-step comparisons above run in f32 where BN-bias
    gradients — tiny residuals of near-total cancellation — sit on a ~1e-3
    noise floor; this test pins the semantics at machine precision."""
    import flax.linen as nn

    from s2r_tpu.models.layers import BatchNorm, Conv2d, bn_real_batch, relu6

    jax.config.update("jax_enable_x64", True)
    try:
        class Tiny(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = Conv2d(8, 3, padding=1, dtype=jnp.float64)(x)
                x = BatchNorm(dtype=jnp.float64)(x, False)
                x = relu6(x)
                x = Conv2d(4, 3, padding=1, dtype=jnp.float64)(x)
                x = BatchNorm(dtype=jnp.float64)(x, False)
                return x

        m = Tiny()
        rng = np.random.RandomState(0)
        xk = jnp.asarray(rng.randn(3, 8, 8, 5), jnp.float64)
        v = m.init({"params": jax.random.PRNGKey(0)}, xk)
        params = jax.tree.map(lambda a: a.astype(jnp.float64), v["params"])
        bs = jax.tree.map(lambda a: a.astype(jnp.float64), v["batch_stats"])

        def loss_plain(p):
            y, upd = m.apply({"params": p, "batch_stats": bs}, xk,
                             mutable=["batch_stats"])
            return jnp.sum(y ** 2), upd["batch_stats"]

        xpad = jnp.pad(xk, ((0, 2), (0, 0), (0, 0), (0, 0)))

        def loss_pad(p):
            with bn_real_batch(3):
                y, upd = m.apply({"params": p, "batch_stats": bs}, xpad,
                                 mutable=["batch_stats"])
            return jnp.sum(y[:3] ** 2), upd["batch_stats"]

        (l1, bs1), g1 = jax.value_and_grad(loss_plain, has_aux=True)(params)
        (l2, bs2), g2 = jax.value_and_grad(loss_pad, has_aux=True)(params)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-12)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-10, atol=1e-12)
        for a, b in zip(jax.tree.leaves(bs1), jax.tree.leaves(bs2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-10, atol=1e-12)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_padded_step_sharded_matches_single_device(monkeypatch):
    """batch-pad x GSPMD: a pad_to=8 step over a real batch of 4 sharded on
    a 4-device mesh must match the same padded step on one device (the pad
    rows land on the last shard; masks are global-index based)."""
    from s2r_tpu.core.mesh import make_mesh, replicate, shard_batch

    monkeypatch.setattr(setup_mod, "_step_pad_to", lambda cfg, n: 8)
    cfg = Config(crop_size=CROP, base_size=CROP, batch_size=4, epochs=5,
                 precision="f32", dataset="synthetic", pad_stats=False)
    m = build_method(cfg, 10, method="output_adapt")
    rng = np.random.RandomState(0)
    batch = {
        "src_image": jnp.asarray(rng.randn(4, CROP, CROP, 3), jnp.float32),
        "src_label": jnp.asarray(rng.randint(0, 19, (4, CROP, CROP)),
                                 jnp.int32),
        "tgt_image": jnp.asarray(rng.randn(4, CROP, CROP, 3), jnp.float32),
    }
    state = m.init_state(jax.random.PRNGKey(0))
    step = jax.jit(m.step_fn)
    ref_state, ref_met = step(state, batch)

    mesh = make_mesh(4)
    sh_state = replicate(state, mesh)
    sh_batch = shard_batch(batch, mesh)
    new_state, met = step(sh_state, sh_batch)

    for k in ref_met:
        np.testing.assert_allclose(float(met[k]), float(ref_met[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)
    _tree_allclose(ref_state.batch_stats, new_state.batch_stats,
                   rtol=1e-4, atol=1e-5)
    _tree_allclose(ref_state.params, new_state.params, atol=2e-3)
