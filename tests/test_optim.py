import numpy as np
import pytest

import jax.numpy as jnp

from s2r_tpu.train.lr_schedule import make_lr_schedule
from s2r_tpu.train.optim import SGD, Adam, apply_updates

torch = pytest.importorskip("torch")


def _run_torch(opt_ctor, params_np, grads_seq, lrs):
    tparams = [torch.nn.Parameter(torch.from_numpy(p.copy()))
               for p in params_np]
    opt = opt_ctor(tparams)
    for grads, lr in zip(grads_seq, lrs):
        for g in opt.param_groups:
            g["lr"] = lr
        opt.zero_grad()
        for p, g_np in zip(tparams, grads):
            p.grad = torch.from_numpy(g_np.copy())
        opt.step()
    return [p.detach().numpy() for p in tparams]


def _run_ours(opt, params_np, grads_seq, lrs):
    params = [jnp.asarray(p) for p in params_np]
    state = opt.init(params)
    for grads, lr in zip(grads_seq, lrs):
        d, state = opt.direction([jnp.asarray(g) for g in grads], state,
                                 params)
        params = apply_updates(params, d, jnp.float32(lr))
    return [np.asarray(p) for p in params]


@pytest.mark.parametrize("nesterov", [False, True])
def test_sgd_matches_torch(nesterov):
    rng = np.random.RandomState(0)
    params = [rng.randn(4, 3).astype(np.float32), rng.randn(5).astype(np.float32)]
    grads_seq = [[rng.randn(*p.shape).astype(np.float32) for p in params]
                 for _ in range(5)]
    lrs = [0.1, 0.09, 0.08, 0.07, 0.06]

    theirs = _run_torch(
        lambda ps: torch.optim.SGD(ps, lr=0.1, momentum=0.9,
                                   weight_decay=5e-4, nesterov=nesterov),
        params, grads_seq, lrs)
    ours = _run_ours(SGD(momentum=0.9, weight_decay=5e-4, nesterov=nesterov),
                     params, grads_seq, lrs)
    for a, b in zip(ours, theirs):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_adam_matches_torch():
    rng = np.random.RandomState(1)
    params = [rng.randn(4, 3).astype(np.float32), rng.randn(5).astype(np.float32)]
    grads_seq = [[rng.randn(*p.shape).astype(np.float32) for p in params]
                 for _ in range(5)]
    lrs = [1e-3, 1e-3, 5e-4, 5e-4, 1e-4]

    theirs = _run_torch(
        lambda ps: torch.optim.Adam(ps, lr=1e-3, betas=(0.9, 0.99)),
        params, grads_seq, lrs)
    ours = _run_ours(Adam(b1=0.9, b2=0.99), params, grads_seq, lrs)
    for a, b in zip(ours, theirs):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_lr_mult():
    params = {"backbone": jnp.ones((2,)), "decoder": jnp.ones((2,))}
    dirs = {"backbone": jnp.ones((2,)), "decoder": jnp.ones((2,))}
    mult = {"backbone": 1.0, "decoder": 10.0}
    out = apply_updates(params, dirs, jnp.float32(0.01), mult)
    np.testing.assert_allclose(np.asarray(out["backbone"]), 0.99, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["decoder"]), 0.9, rtol=1e-6)


def test_poly_schedule_matches_reference_formula():
    sched = make_lr_schedule("poly", 5e-4, num_epochs=10, iters_per_epoch=100)
    for t in (0, 1, 500, 999):
        expected = 5e-4 * (1 - t / 1000) ** 0.9
        assert np.isclose(float(sched(t)), expected, rtol=1e-6), t


def test_cos_and_step_and_warmup():
    cos = make_lr_schedule("cos", 1.0, 1, 100)
    assert np.isclose(float(cos(0)), 1.0)
    assert np.isclose(float(cos(50)), 0.5, atol=1e-6)

    step = make_lr_schedule("step", 1.0, 90, 10, lr_step=30)
    assert np.isclose(float(step(0)), 1.0)
    assert np.isclose(float(step(30 * 10)), 0.1)
    assert np.isclose(float(step(60 * 10)), 0.01, rtol=1e-5)

    warm = make_lr_schedule("poly", 1.0, 10, 100, warmup_epochs=1)
    assert float(warm(0)) == 0.0
    assert float(warm(50)) < float(warm(150))
