import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2r_tpu.ops.resize import resize_bilinear_align_corners

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


@pytest.mark.parametrize("in_hw,out_hw", [
    ((32, 32), (128, 128)),   # ASPP->decoder 4x upsample
    ((128, 128), (512, 512)),  # decoder->input 4x upsample
    ((1, 1), (32, 32)),        # ASPP GAP branch broadcast
    ((17, 23), (64, 48)),      # odd sizes
    ((64, 64), (33, 33)),      # downsample
    ((5, 5), (5, 5)),          # identity
])
def test_resize_matches_torch_align_corners(in_hw, out_hw):
    rng = np.random.RandomState(0)
    x = rng.randn(2, *in_hw, 3).astype(np.float32)
    ours = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), out_hw))
    theirs = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                           size=out_hw, mode="bilinear", align_corners=True)
    theirs = theirs.numpy().transpose(0, 2, 3, 1)
    # matmul-form interpolation reassociates float adds vs torch's gather
    # form; tolerate ~1e-4 absolute on O(1) inputs.
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_resize_differentiable():
    import jax

    x = jnp.ones((1, 8, 8, 2))
    g = jax.grad(lambda v: resize_bilinear_align_corners(v, (16, 16)).sum())(x)
    # Sum-pooling adjoint: total mass preserved.
    assert np.isclose(float(g.sum()), 16 * 16 * 2, rtol=1e-5)


# ---------------------------------------------------------------------------
# space-to-depth conv reformulation (ops/s2d.py)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("hw,cin,cout", [
    ((16, 24), 19, 64),   # discriminator conv1 shape class
    ((8, 8), 64, 128),    # discriminator conv2 shape class
    ((12, 20), 3, 5),
])
def test_conv4x4s2_via_s2d_matches_direct(hw, cin, cout):
    import jax
    from jax import lax

    from s2r_tpu.ops.s2d import conv4x4s2_via_s2d

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, *hw, cin), jnp.float32)
    k = jnp.asarray(rng.randn(4, 4, cin, cout), jnp.float32)
    ref = lax.conv_general_dilated(
        x, k, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = conv4x4s2_via_s2d(x, k)
    # fp reassociation: the s2d form contracts 4C-wide dots vs C-wide
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    # gradients (input and kernel) must match the direct conv's
    def f_ref(x, k):
        return jnp.sum(lax.conv_general_dilated(
            x, k, (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) ** 2)

    def f_s2d(x, k):
        return jnp.sum(conv4x4s2_via_s2d(x, k) ** 2)

    # grads are O(100) here; tolerate fp reassociation between the 3x3x4C
    # and 4x4xC contraction orders
    gx1, gk1 = jax.grad(f_ref, argnums=(0, 1))(x, k)
    gx2, gk2 = jax.grad(f_s2d, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx2), np.asarray(gx1),
                               rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(np.asarray(gk2), np.asarray(gk1),
                               rtol=1e-3, atol=1e-2)


@pytest.mark.parametrize("hw,cin,cout", [
    ((16, 24), 3, 32),    # backbone stem shape class
    ((12, 20), 5, 7),
])
def test_conv3x3s2_via_s2d_matches_direct(hw, cin, cout):
    import jax
    from jax import lax

    from s2r_tpu.ops.s2d import conv3x3s2_via_s2d

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, *hw, cin), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, cin, cout), jnp.float32)
    ref = lax.conv_general_dilated(
        x, k, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = conv3x3s2_via_s2d(x, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    def f_ref(x, k):
        return jnp.sum(lax.conv_general_dilated(
            x, k, (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) ** 2)

    def f_s2d(x, k):
        return jnp.sum(conv3x3s2_via_s2d(x, k) ** 2)

    gx1, gk1 = jax.grad(f_ref, argnums=(0, 1))(x, k)
    gx2, gk2 = jax.grad(f_s2d, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx2), np.asarray(gx1),
                               rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(np.asarray(gk2), np.asarray(gk1),
                               rtol=1e-3, atol=1e-2)


def test_mobilenet_stem_s2d_parity():
    """DeepLab(stem_s2d=True) matches the default forward on the same
    params (even H/W), and falls back exactly on odd H/W (513-crop class)."""
    import jax

    from s2r_tpu.models import DeepLab

    rng = np.random.RandomState(2)
    base = DeepLab(num_classes=19)
    fast = DeepLab(num_classes=19, stem_s2d=True)
    x = jnp.asarray(rng.randn(1, 64, 96, 3), jnp.float32)
    v = jax.jit(lambda: base.init({"params": jax.random.PRNGKey(0)}, x))()
    y0, _ = jax.jit(lambda v: base.apply(v, x))(v)
    y1, _ = jax.jit(lambda v: fast.apply(v, x))(v)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=2e-4, atol=2e-4)
    x_odd = jnp.asarray(rng.randn(1, 65, 97, 3), jnp.float32)
    y0, _ = jax.jit(lambda v: base.apply(v, x_odd))(v)
    y1, _ = jax.jit(lambda v: fast.apply(v, x_odd))(v)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=0, atol=0)


def test_conv2d_s2d_flag_matches_plain():
    """Conv2d(s2d=True) equals the plain conv on the same params, and falls
    back to the direct conv for odd spatial sizes."""
    import jax

    from s2r_tpu.models.layers import Conv2d

    rng = np.random.RandomState(1)
    plain = Conv2d(64, 4, stride=2, padding=1, use_bias=True,
                   weight_init="torch_default")
    fast = Conv2d(64, 4, stride=2, padding=1, use_bias=True,
                  weight_init="torch_default", s2d=True)
    x = jnp.asarray(rng.randn(2, 64, 96, 19), jnp.float32)
    v = plain.init({"params": jax.random.PRNGKey(0)}, x)
    np.testing.assert_allclose(np.asarray(fast.apply(v, x)),
                               np.asarray(plain.apply(v, x)),
                               rtol=1e-4, atol=1e-4)
    # odd size: s2d silently falls back; shapes must agree
    x_odd = jnp.asarray(rng.randn(2, 63, 95, 19), jnp.float32)
    np.testing.assert_allclose(np.asarray(fast.apply(v, x_odd)),
                               np.asarray(plain.apply(v, x_odd)),
                               rtol=1e-4, atol=1e-4)


def test_rng_dropout_recompute_bit_identical():
    """Dropout's recomputed-mask backward is bit-identical to the saved-mask
    formulation (models/layers.py::_rng_dropout)."""
    import jax

    from s2r_tpu.models.layers import _rng_dropout

    key = jax.random.PRNGKey(3)
    x = jnp.asarray(np.random.RandomState(0).randn(4, 8, 8, 16), jnp.float32)

    def saved_mask(x, key, keep):
        mask = jax.random.bernoulli(key, p=keep, shape=x.shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))

    y1 = _rng_dropout(x, key, 0.5)
    y2 = saved_mask(x, key, 0.5)
    assert bool((y1 == y2).all())
    g1 = jax.grad(lambda x: jnp.sum(_rng_dropout(x, key, 0.5) ** 2))(x)
    g2 = jax.grad(lambda x: jnp.sum(saved_mask(x, key, 0.5) ** 2))(x)
    assert bool((g1 == g2).all())


# ---------------------------------------------------------------------------
# argmax_first: two-reduce channel argmax (s2r_tpu/ops/argmax.py)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shape,axis", [((2, 4, 4, 19), -1),
                                        ((3, 19, 5), 1),
                                        ((7,), 0),
                                        ((2, 1, 3, 1), -1)])
def test_argmax_first_matches_jnp(shape, axis):
    from s2r_tpu.ops.argmax import argmax_first

    rng = np.random.RandomState(0)
    for dt in (np.float32, jnp.bfloat16, np.int32):
        x = rng.randn(*shape) * 10
        x = jnp.asarray(x.astype(np.float32)).astype(dt)
        got = jax.jit(lambda v: argmax_first(v, axis))(x)
        want = jnp.argmax(x, axis=axis)
        assert got.dtype == jnp.int32
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_argmax_first_tie_breaks_to_first_index():
    from s2r_tpu.ops.argmax import argmax_first

    rng = np.random.RandomState(1)
    x = rng.randn(64, 19).astype(np.float32)
    # force exact multi-way ties at the max in every row
    m = x.max(axis=1, keepdims=True) + 1.0
    for r in range(64):
        cols = rng.choice(19, size=rng.randint(2, 6), replace=False)
        x[r, cols] = m[r]
    got = np.asarray(jax.jit(argmax_first)(jnp.asarray(x)))
    np.testing.assert_array_equal(got, np.argmax(x, axis=1))


def test_argmax_first_grad_free_and_shards():
    """Usable inside jit under a mesh (eval step): constant-fold check that
    it traces with a sharded input on the virtual mesh."""
    from s2r_tpu.ops.argmax import argmax_first

    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from s2r_tpu.core.mesh import make_mesh

    mesh = make_mesh()
    x = jnp.asarray(np.random.RandomState(0).randn(8, 4, 4, 19),
                    jnp.float32)
    x = jax.device_put(x, NamedSharding(mesh, P("data")))
    got = jax.jit(lambda v: argmax_first(v, -1))(x)
    np.testing.assert_array_equal(np.asarray(got),
                                  np.argmax(np.asarray(x), -1))
