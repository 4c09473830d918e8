"""split_concat: concat-free ASPP/decoder head convs are the same math.

The serve_decoder profile attributes measurable copy time to materializing
the decoder's 304-ch concat (and the ASPP 1280-ch concat feeds a 1x1 conv
whose global-pool slice is spatially constant).  `split_concat=True`
computes those convs as split-kernel sums over the un-concatenated parts
(models/layers.py Conv2d tuple input) with an identical parameter tree.
These tests pin: same outputs (float-reassociation tolerance), same param
tree (checkpoints interchangeable), gradient flow, and the [1,1] GAP
broadcast semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2r_tpu.models import DeepLab
from s2r_tpu.models.aspp import ASPP
from s2r_tpu.models.decoder import Decoder
from s2r_tpu.models.layers import Conv2d


def test_conv2d_tuple_input_matches_concat():
    k = jax.random.PRNGKey(0)
    a = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 5))
    b = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 3))
    conv = Conv2d(7, 3, padding=1, use_bias=True)
    v = conv.init(k, jnp.concatenate([a, b], axis=-1))
    y_cat = conv.apply(v, jnp.concatenate([a, b], axis=-1))
    y_split = conv.apply(v, (a, b))
    np.testing.assert_allclose(np.asarray(y_split), np.asarray(y_cat),
                               atol=1e-5, rtol=1e-5)


def test_conv2d_tuple_broadcast_part():
    # A [N,1,1,C] part through a 1x1 conv broadcasts into the sum — the
    # ASPP global-pool branch formulation.
    k = jax.random.PRNGKey(0)
    a = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 6, 4))
    g = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 1, 3))
    conv = Conv2d(5, 1)
    full = jnp.concatenate(
        [a, jnp.broadcast_to(g, (2, 6, 6, 3))], axis=-1)
    v = conv.init(k, full)
    y_cat = conv.apply(v, full)
    y_split = conv.apply(v, (a, g))
    assert y_split.shape == y_cat.shape
    np.testing.assert_allclose(np.asarray(y_split), np.asarray(y_cat),
                               atol=1e-5, rtol=1e-5)


def test_conv2d_tuple_broadcast_rejects_nontrivial_kernel():
    a = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 6, 4))
    g = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 1, 3))
    conv = Conv2d(5, 3, padding=1)
    with pytest.raises(ValueError):
        conv.init(jax.random.PRNGKey(0), (a, g))


@pytest.mark.parametrize("train", [False, True])
def test_aspp_split_concat_parity(train):
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 16, 320))
    base = ASPP()
    split = ASPP(split_concat=True)
    v = base.init({"params": jax.random.PRNGKey(0)}, x, False)
    kwargs = {}
    if train:
        kwargs = {"rngs": {"dropout": jax.random.PRNGKey(9)},
                  "mutable": ["batch_stats"]}
    y0 = base.apply(v, x, train, **kwargs)
    y1 = split.apply(v, x, train, **kwargs)
    if train:
        (y0, s0), (y1, s1) = y0, y1
        jax.tree_util.tree_map(
            lambda p, q: np.testing.assert_allclose(
                np.asarray(p), np.asarray(q), atol=1e-5, rtol=1e-5),
            s0, s1)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               atol=1e-5, rtol=1e-5)


def test_decoder_split_concat_parity():
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 16, 256))
    low = jax.random.normal(jax.random.PRNGKey(5), (2, 32, 64, 24))
    base = Decoder()
    split = Decoder(split_concat=True)
    v = base.init({"params": jax.random.PRNGKey(0)}, x, low, False)
    y0 = base.apply(v, x, low, False)
    y1 = split.apply(v, x, low, False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               atol=1e-5, rtol=1e-5)


def test_deeplab_split_concat_same_params_and_output():
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 64, 64, 3))
    base = DeepLab(num_classes=19)
    split = DeepLab(num_classes=19, split_concat=True)
    v = jax.jit(lambda: base.init({"params": jax.random.PRNGKey(0)}, x))()
    v2 = jax.jit(lambda: split.init({"params": jax.random.PRNGKey(0)}, x))()
    # identical parameter trees -> checkpoints interchangeable
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v2))
    for p, q in zip(jax.tree_util.tree_leaves(v),
                    jax.tree_util.tree_leaves(v2)):
        assert p.shape == q.shape and p.dtype == q.dtype
    y0, _ = jax.jit(lambda v: base.apply(v, x))(v)
    y1, _ = jax.jit(lambda v: split.apply(v, x))(v)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               atol=2e-4, rtol=2e-4)


def test_split_concat_sharded_step_matches_single_device():
    """The split-kernel sum must stay GSPMD-compatible: the 8-device
    sharded output-adapt step with split_concat=True reproduces the
    single-device step's losses and BN statistics (the well-conditioned
    quantities — see test_steps.py for why raw BN-bias gradients are
    excluded at random init)."""
    from s2r_tpu.config import Config
    from s2r_tpu.core.mesh import make_mesh, replicate, shard_batch
    from s2r_tpu.train.setup import build_method

    hw, n = 32, 8
    cfg = Config(crop_size=hw, base_size=hw, epochs=2, batch_size=n,
                 precision="f32", lr=0.01, pad_stats=False,
                 split_concat=True)
    m = build_method(cfg, iters_per_epoch=10, method="output_adapt")
    state = m.init_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(3)
    batch = {
        "src_image": jnp.asarray(rng.randn(n, hw, hw, 3), jnp.float32),
        "src_label": jnp.asarray(rng.randint(0, 19, (n, hw, hw)), jnp.int32),
        "tgt_image": jnp.asarray(rng.randn(n, hw, hw, 3), jnp.float32),
    }
    step = jax.jit(m.step_fn)
    ref_state, ref_metrics = step(state, batch)

    mesh = make_mesh()
    assert mesh.devices.size == 8
    new_state, metrics = step(replicate(state, mesh),
                              shard_batch(batch, mesh))
    for k in ref_metrics:
        np.testing.assert_allclose(float(metrics[k]), float(ref_metrics[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)
    for a, b in zip(jax.tree.leaves(ref_state.batch_stats),
                    jax.tree.leaves(new_state.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_deeplab_split_concat_grads_flow():
    x = jax.random.normal(jax.random.PRNGKey(7), (1, 32, 32, 3))
    model = DeepLab(num_classes=19, split_concat=True)
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)

    def loss(params):
        y, _ = model.apply({**v, "params": params}, x, train=False)
        return jnp.sum(y ** 2)

    g = jax.grad(loss)(v["params"])
    # the concat-conv kernels must receive gradient through both slices
    gk = g["decoder"]["last_conv_0"]["kernel"]
    assert float(jnp.abs(gk[:, :, :256]).sum()) > 0
    assert float(jnp.abs(gk[:, :, 256:]).sum()) > 0
    gk = g["aspp"]["conv1"]["kernel"]
    assert float(jnp.abs(gk[:, :, 1024:]).sum()) > 0
