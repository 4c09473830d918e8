"""Aligned Xception backbone: shapes, DeepLab composite, train-step smoke.

The reference names 'xception' in its factory but ships no module
(modeling/backbone/__init__.py:6-7); this is a working implementation of
the standard DeepLab-V3+ Aligned Xception (models/xception.py), so there is
no torch reference to pin numerics against — coverage is structural.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2r_tpu.config import Config
from s2r_tpu.models import DeepLab, build_backbone
from s2r_tpu.models.xception import AlignedXception
from s2r_tpu.train.setup import build_method

pytestmark = pytest.mark.slow  # step-compile / e2e: full tier only


@pytest.mark.parametrize("os_,hw,feat", [(16, 64, 4), (8, 64, 8)])
def test_xception_shapes(os_, hw, feat):
    m = AlignedXception(output_stride=os_)
    x = jnp.zeros((1, hw, hw, 3))
    vars_ = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x, False))()
    high, low = m.apply(vars_, x, False)
    assert high.shape == (1, feat, feat, 2048)
    assert low.shape == (1, hw // 4, hw // 4, 128)


def test_factory_dispatch():
    m = build_backbone("xception", 16, jnp.float32)
    assert isinstance(m, AlignedXception)


def test_deeplab_xception_composite():
    m = DeepLab(backbone="xception", output_stride=16, num_classes=19)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(0)}, x,
                                   False))()
    logits, feat = m.apply(vars_, x, False)
    assert logits.shape == (1, 64, 64, 19)
    assert feat.shape[-1] == 256


def test_xception_source_only_step_runs():
    cfg = Config(backbone="xception", crop_size=32, base_size=32,
                 batch_size=2, epochs=1, precision="f32", dataset="gtav")
    m = build_method(cfg, iters_per_epoch=2, method="source_only")
    state = m.init_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32),
        "label": jnp.asarray(rng.randint(0, 19, (2, 32, 32)), jnp.int32),
    }
    new_state, metrics = jax.jit(m.step_fn)(state, batch)
    assert np.isfinite(float(metrics["task_loss"]))
    # params updated
    a = jax.tree_util.tree_leaves(state.params["G"])[0]
    b = jax.tree_util.tree_leaves(new_state.params["G"])[0]
    assert not np.allclose(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------------------
# DRN-D-54 (models/drn.py) — the factory's last named backbone
# ---------------------------------------------------------------------------

def test_drn_shapes():
    from s2r_tpu.models.drn import DRN

    m = DRN()
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x, False))()
    high, low = m.apply(vars_, x, False)
    assert high.shape == (1, 8, 8, 512)    # output stride 8 by design
    assert low.shape == (1, 16, 16, 256)


def test_deeplab_drn_composite():
    m = DeepLab(backbone="drn", output_stride=16, num_classes=19)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(0)}, x,
                                   False))()
    logits, feat = m.apply(vars_, x, False)
    assert logits.shape == (1, 64, 64, 19)
    assert feat.shape[-1] == 256
