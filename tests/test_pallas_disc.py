"""ops/pallas/disc_conv.py: the W-minor discriminator conv1 kernel
(VERDICT r2 item 7) — numerics vs XLA's conv in interpret mode, plus the
custom-VJP backward vs autodiff of the lax reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2r_tpu.ops.pallas.disc_conv import disc_conv1


def _ref(x_nhcw, kernel, bias):
    """lax reference: same conv on the NHWC view of the input."""
    x = jnp.transpose(x_nhcw, (0, 1, 3, 2))  # -> NHWC
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), kernel.astype(jnp.float32),
        window_strides=(2, 2), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    return y + bias.astype(jnp.float32)


@pytest.mark.parametrize("n,h,c,w", [(2, 16, 19, 32), (1, 32, 19, 64)])
def test_forward_matches_lax(n, h, c, w):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, h, c, w), jnp.float32)
    k = jnp.asarray(rng.randn(4, 4, c, 64) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(64) * 0.1, jnp.float32)
    got = disc_conv1(x, k, b, True)
    want = _ref(x, k, b)
    assert got.shape == (n, h // 2, w // 2, 64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_forward_uneven_tile_and_ndf_128():
    # H/2 = 24 forces a non-power-of-two row tile; ndf=128 full lanes.
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 48, 19, 32), jnp.float32)
    k = jnp.asarray(rng.randn(4, 4, 19, 128) * 0.1, jnp.float32)
    b = jnp.zeros((128,), jnp.float32)
    np.testing.assert_allclose(np.asarray(disc_conv1(x, k, b, True)),
                               np.asarray(_ref(x, k, b)),
                               rtol=1e-5, atol=1e-5)


def test_backward_matches_autodiff():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 16, 19, 32), jnp.float32)
    k = jnp.asarray(rng.randn(4, 4, 19, 64) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(64) * 0.1, jnp.float32)

    def loss_pallas(x, k, b):
        y = disc_conv1(x, k, b, True)
        return jnp.sum(jnp.tanh(y))

    def loss_ref(x, k, b):
        return jnp.sum(jnp.tanh(_ref(x, k, b)))

    gx, gk, gb = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, k, b)
    rx, rk, rb = jax.grad(loss_ref, argnums=(0, 1, 2))(x, k, b)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb),
                               rtol=1e-4, atol=1e-5)


def test_bf16_forward_close():
    if jax.default_backend() == "cpu":
        pytest.skip("CPU DotThunk lacks BF16xBF16=F32; covered on TPU "
                    "(exp/perf_ablate.py pallas_d1 arm numerics check)")
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(1, 16, 19, 32), jnp.bfloat16)  # softmax-like
    k = jnp.asarray(rng.randn(4, 4, 19, 64) * 0.1, jnp.bfloat16)
    b = jnp.zeros((64,), jnp.bfloat16)
    got = np.asarray(disc_conv1(x, k, b, True), np.float32)
    want = np.asarray(_ref(x, k, b), np.float32)
    assert got.dtype == np.float32 and got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)


def test_discriminator_knob_matches_default():
    """FCDiscriminator(pallas_wminor_conv1=True) == default on the same
    params (the knob changes lowering+layout, not semantics)."""
    from s2r_tpu.models import FCDiscriminator
    from s2r_tpu.ops.pallas import disc_conv

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.rand(2, 32, 64, 19), jnp.float32)
    base = FCDiscriminator(num_classes=19, dtype=jnp.float32)
    var = base.init({"params": jax.random.PRNGKey(0)}, x)
    want = base.apply(var, x)
    disc_conv.INTERPRET = True
    try:
        got = FCDiscriminator(num_classes=19, dtype=jnp.float32,
                              pallas_wminor_conv1=True).apply(var, x)
    finally:
        disc_conv.INTERPRET = False
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-4)
