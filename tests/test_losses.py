import numpy as np
import pytest

import jax.numpy as jnp

from s2r_tpu.train.losses import (bce_with_logits, build_seg_loss,
                                  cross_entropy, domain_loss, focal_loss)

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402


def _rand_logits_labels(rng, n=2, h=9, w=11, c=19, ignore_frac=0.3):
    logits = rng.randn(n, h, w, c).astype(np.float32)
    labels = rng.randint(0, c, size=(n, h, w)).astype(np.int64)
    ign = rng.rand(n, h, w) < ignore_frac
    labels[ign] = 255
    return logits, labels


def _torch_ce(logits, labels, weight=None):
    crit = tnn.CrossEntropyLoss(
        weight=None if weight is None else torch.from_numpy(weight),
        ignore_index=255, reduction="mean")
    return crit(torch.from_numpy(logits.transpose(0, 3, 1, 2)),
                torch.from_numpy(labels)).item()


def test_cross_entropy_matches_torch():
    rng = np.random.RandomState(0)
    logits, labels = _rand_logits_labels(rng)
    ours = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    assert np.isclose(ours, _torch_ce(logits, labels), rtol=1e-5)


def test_weighted_cross_entropy_matches_torch():
    rng = np.random.RandomState(1)
    logits, labels = _rand_logits_labels(rng)
    weight = rng.rand(19).astype(np.float32) + 0.5
    ours = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                               jnp.asarray(weight)))
    assert np.isclose(ours, _torch_ce(logits, labels, weight), rtol=1e-5)


def test_all_ignored_is_finite():
    logits = np.zeros((1, 4, 4, 19), np.float32)
    labels = np.full((1, 4, 4), 255, np.int64)
    assert np.isfinite(float(cross_entropy(jnp.asarray(logits),
                                           jnp.asarray(labels))))


def test_focal_matches_reference_formula():
    # reference loss.py:32-46: focal applied to the reduced CE scalar.
    rng = np.random.RandomState(2)
    logits, labels = _rand_logits_labels(rng)
    ce = _torch_ce(logits, labels)
    logpt = -ce
    pt = np.exp(logpt)
    expected = -((1 - pt) ** 2) * (0.5 * logpt)
    ours = float(focal_loss(jnp.asarray(logits), jnp.asarray(labels)))
    assert np.isclose(ours, expected, rtol=1e-5)


def test_build_seg_loss_dispatch():
    rng = np.random.RandomState(3)
    logits, labels = _rand_logits_labels(rng)
    ce = build_seg_loss("ce")(jnp.asarray(logits), jnp.asarray(labels))
    fl = build_seg_loss("focal")(jnp.asarray(logits), jnp.asarray(labels))
    assert float(ce) != float(fl)
    with pytest.raises(NotImplementedError):
        build_seg_loss("dice")


def test_domain_loss_matches_torch():
    rng = np.random.RandomState(4)
    src = rng.randn(2, 8, 8, 2).astype(np.float32)
    tgt = rng.randn(2, 8, 8, 2).astype(np.float32)
    loss, acc = domain_loss(jnp.asarray(src), jnp.asarray(tgt))

    crit = tnn.CrossEntropyLoss(reduction="mean")
    ts = torch.from_numpy(src.transpose(0, 3, 1, 2))
    tt = torch.from_numpy(tgt.transpose(0, 3, 1, 2))
    t_loss = (crit(ts, torch.zeros(2, 8, 8, dtype=torch.long))
              + crit(tt, torch.ones(2, 8, 8, dtype=torch.long))).item()
    t_acc = ((1 - ts.argmax(1)).sum() + tt.argmax(1).sum()).float() \
        / 2 / 2 / 8 / 8
    assert np.isclose(float(loss), t_loss, rtol=1e-5)
    assert np.isclose(float(acc), t_acc.item(), rtol=1e-5)


def test_bce_with_logits_matches_torch():
    rng = np.random.RandomState(5)
    x = rng.randn(2, 16, 16, 1).astype(np.float32) * 3
    for target in (0.0, 1.0):
        ours = float(bce_with_logits(jnp.asarray(x), target))
        crit = tnn.BCEWithLogitsLoss()
        theirs = crit(torch.from_numpy(x),
                      torch.full_like(torch.from_numpy(x), target)).item()
        assert np.isclose(ours, theirs, rtol=1e-5), target
