import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2r_tpu.models.layers import BatchNorm, Conv2d, leaky_relu, relu6

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402


def _to_hwio(w_oihw):
    return np.transpose(w_oihw, (2, 3, 1, 0))


def test_conv_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 16, 16, 8).astype(np.float32)
    tconv = tnn.Conv2d(8, 12, 3, stride=2, padding=1, dilation=1, bias=True)
    mod = Conv2d(12, 3, stride=2, padding=1, use_bias=True)
    params = {"params": {
        "kernel": jnp.asarray(_to_hwio(tconv.weight.detach().numpy())),
        "bias": jnp.asarray(tconv.bias.detach().numpy()),
    }}
    ours = np.asarray(mod.apply(params, jnp.asarray(x)))
    theirs = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    theirs = theirs.detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_depthwise_conv_matches_torch():
    rng = np.random.RandomState(2)
    c = 16
    x = rng.randn(2, 14, 14, c).astype(np.float32)
    tconv = tnn.Conv2d(c, c, 3, stride=1, padding=2, dilation=2, groups=c,
                       bias=False)
    mod = Conv2d(c, 3, stride=1, padding=2, dilation=2, groups=c)
    params = {"params": {
        "kernel": jnp.asarray(_to_hwio(tconv.weight.detach().numpy())),
    }}
    ours = np.asarray(mod.apply(params, jnp.asarray(x)))
    theirs = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    theirs = theirs.detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_batchnorm_train_and_eval_match_torch():
    rng = np.random.RandomState(3)
    c = 6
    x1 = rng.randn(4, 5, 7, c).astype(np.float32) * 3 + 1
    x2 = rng.randn(4, 5, 7, c).astype(np.float32)

    tbn = tnn.BatchNorm2d(c)  # momentum 0.1, eps 1e-5
    tbn.train()
    mod = BatchNorm()
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x1), False)

    # two train steps: outputs + running stats must track torch
    for x in (x1, x2):
        t_out = tbn(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        out, updated = mod.apply(variables, jnp.asarray(x), False,
                                 mutable=["batch_stats"])
        variables = {"params": variables["params"], **updated}
        np.testing.assert_allclose(
            np.asarray(out),
            t_out.detach().numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4)

    np.testing.assert_allclose(np.asarray(variables["batch_stats"]["mean"]),
                               tbn.running_mean.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(variables["batch_stats"]["var"]),
                               tbn.running_var.numpy(), rtol=1e-4, atol=1e-5)

    # eval mode uses running stats
    tbn.eval()
    t_out = tbn(torch.from_numpy(x1.transpose(0, 3, 1, 2)))
    out = mod.apply(variables, jnp.asarray(x1), True)
    np.testing.assert_allclose(
        np.asarray(out), t_out.detach().numpy().transpose(0, 2, 3, 1),
        rtol=1e-4, atol=1e-4)


def test_activations():
    x = jnp.asarray([-2.0, 0.5, 7.0])
    np.testing.assert_allclose(np.asarray(relu6(x)), [0.0, 0.5, 6.0])
    np.testing.assert_allclose(np.asarray(leaky_relu(x, 0.2)),
                               [-0.4, 0.5, 7.0])
