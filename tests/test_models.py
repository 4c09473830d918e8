import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2r_tpu.models import (ASPP, Decoder, DeepLab, DomainClassifier,
                            FCDiscriminator, MobileNetV2)


def test_mobilenet_shapes_os16():
    # Mirrors the reference smoke block (mobilenet.py:147-152).
    m = MobileNetV2(output_stride=16)
    x = jnp.zeros((1, 512, 512, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x, False)
    high, low = m.apply(vars_, x, False)
    assert high.shape == (1, 32, 32, 320)
    assert low.shape == (1, 128, 128, 24)


def test_mobilenet_shapes_os8():
    m = MobileNetV2(output_stride=8)
    x = jnp.zeros((1, 256, 256, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x, False)
    high, low = m.apply(vars_, x, False)
    assert high.shape == (1, 32, 32, 320)
    assert low.shape == (1, 64, 64, 24)


def test_aspp_shapes():
    # Mirrors assp.py:97-103.
    m = ASPP(output_stride=16)
    x = jnp.zeros((2, 32, 32, 320))
    vars_ = m.init({"params": jax.random.PRNGKey(0)}, x, False)
    y = m.apply(vars_, x, False)
    assert y.shape == (2, 32, 32, 256)


def test_decoder_shapes():
    # Mirrors decoder.py:59-66.
    m = Decoder(num_classes=19)
    x = jnp.zeros((1, 32, 32, 256))
    low = jnp.zeros((1, 128, 128, 24))
    vars_ = m.init({"params": jax.random.PRNGKey(0)}, x, low, False)
    y = m.apply(vars_, x, low, False)
    assert y.shape == (1, 128, 128, 19)


def test_deeplab_full_forward():
    # Mirrors deeplab.py:74-79 (1280x640 full forward, non-square).
    m = DeepLab(output_stride=16)
    x = jnp.zeros((1, 640, 1280, 3))
    vars_ = m.init({"params": jax.random.PRNGKey(0)}, x, False)
    logits, feat = m.apply(vars_, x, False)
    assert logits.shape == (1, 640, 1280, 19)
    assert feat.shape == (1, 40, 80, 256)
    assert logits.dtype == jnp.float32


def test_logits_dtype_bf16_step():
    """Config.logits_dtype='bf16' (opt-in fast mode): the full-res logits
    come out bf16, and a full output-adapt step runs finite.  Default
    ('f32') keeps the reference's f32 map semantics
    (test_deeplab_full_forward pins that)."""
    from s2r_tpu.config import Config
    from s2r_tpu.train.setup import build_method

    cfg = Config(crop_size=64, base_size=64, batch_size=2, epochs=1,
                 precision="bf16", logits_dtype="bf16")
    m = build_method(cfg, 10, method="output_adapt")
    st = m.init_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    b = {"src_image": jnp.asarray(rng.randn(2, 64, 64, 3), jnp.float32),
         "src_label": jnp.asarray(rng.randint(0, 19, (2, 64, 64)),
                                  jnp.int32),
         "tgt_image": jnp.asarray(rng.randn(2, 64, 64, 3), jnp.float32)}
    st2, met = jax.jit(m.step_fn)(st, b)
    assert all(np.isfinite(float(v)) for v in met.values())
    pg, bs = m.eval_variables(st2)
    logits, _ = m.deeplab.apply({"params": pg, "batch_stats": bs},
                                b["src_image"], False)
    assert logits.dtype == jnp.bfloat16

    # eval stays reference-exact f32 regardless of the train-mode flag:
    # identical eval_step outputs to the default-config method.
    from dataclasses import replace
    m32 = build_method(replace(cfg, logits_dtype="f32"), 10,
                       method="output_adapt")
    lbl = b["src_label"]
    loss_b, cm_b, _ = jax.jit(m.eval_step)(pg, bs, b["src_image"], lbl)
    loss_f, cm_f, _ = jax.jit(m32.eval_step)(pg, bs, b["src_image"], lbl)
    np.testing.assert_array_equal(np.asarray(cm_b), np.asarray(cm_f))
    np.testing.assert_allclose(float(loss_b), float(loss_f), rtol=0)


def test_discriminator_shapes():
    # Mirrors discriminator.py:37-42.
    m = FCDiscriminator(num_classes=19)
    x = jnp.zeros((1, 512, 512, 19))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(vars_, x)
    assert y.shape == (1, 16, 16, 1)


def test_domain_classifier_shapes():
    # Mirrors domian.py:49-55.
    m = DomainClassifier()
    x = jnp.zeros((1, 32, 32, 256))
    vars_ = m.init({"params": jax.random.PRNGKey(0)}, x, False)
    y = m.apply(vars_, x, False)
    assert y.shape == (1, 32, 32, 2)


def test_deeplab_train_mode_mutates_batch_stats_and_dropout():
    m = DeepLab(output_stride=16)
    x = jnp.ones((2, 64, 64, 3))
    vars_ = m.init({"params": jax.random.PRNGKey(0)}, x, False)
    (logits, _), updated = m.apply(
        vars_, x, True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)})
    # running stats moved away from init
    leaf = updated["batch_stats"]["backbone"]["features_0_bn"]["mean"]
    assert float(jnp.abs(leaf).sum()) > 0

    # dropout: two different rngs -> different logits in train mode
    (l2, _), _ = m.apply(vars_, x, True, mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(logits), np.asarray(l2))


def test_deeplab_param_partitions():
    m = DeepLab()
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = m.init({"params": jax.random.PRNGKey(0)}, x, False)
    assert set(vars_["params"].keys()) == {"backbone", "aspp", "decoder"}
