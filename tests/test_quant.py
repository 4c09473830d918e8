"""Decoder-only int8 serving quantization (io/quant.py).

Scope rationale lives in the io/quant.py module doc (the per-op int8
probes refuted full-model PTQ but measured 1.72x on the decoder's
3x3/256-ch conv class).  These tests pin, on CPU:

1. the BN-fold + tail wiring EXACTLY (the quantize=False debug path must
   reproduce the real Decoder module's logits) — this is what catches a
   wrong fold formula or a mixed-up BN/conv pairing that quantized
   agreement numbers would blur;
2. calibration produces sane scales and the quantized path runs for every
   output/argmax/label-dtype combination with the right shapes/dtypes;
3. end-to-end accuracy on the committed trained convergence checkpoint
   (run/synthetic/conv-reval): quantized labels agree with the exact
   serving path on almost all pixels and mIoU stays in the same regime —
   the same bar the argmax_res='decoder' fast mode is held to;
4. the exported artifact round-trips the quantized graph bit-for-bit and
   records quant metadata.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2r_tpu.io.quant import (backbone_taps, calibrate_decoder_int8,
                              fold_bn, make_decoder_tail)
from s2r_tpu.io.serving import (export_servable, load_servable,
                                make_serving_fn)
from s2r_tpu.models import DeepLab

# model-init / forward-compile tests are full-tier; the pure-math tests
# (fold formula, weight quantization) stay in the quick tier
slow = pytest.mark.slow


@pytest.fixture(scope="module")
def small_model():
    model = DeepLab(output_stride=16, num_classes=19)
    x = jnp.zeros((1, 65, 65, 3))
    vars_ = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, x, False))()
    return model, vars_["params"], vars_["batch_stats"]


def _images(n=2, h=65, w=65, seed=0):
    return np.random.RandomState(seed).rand(n, h, w, 3).astype(np.float32)


@pytest.fixture(scope="module")
def scales(small_model):
    model, params, bstats = small_model
    return calibrate_decoder_int8(model, params, bstats,
                                  [_images(seed=7), _images(seed=8)])


@slow
def test_folded_tail_matches_decoder_module(small_model):
    """quantize=False (folded-f32) must reproduce the real decoder:
    BN-eval is an affine, so folding it into the conv is exact up to f32
    rounding — any wiring/fold mistake shows up as a gross mismatch."""
    model, params, bstats = small_model
    variables = {"params": params, "batch_stats": bstats}
    x = jnp.asarray(_images(seed=1))
    dec_model = model.clone(upsample_logits=False)
    want = jax.jit(lambda im: dec_model.apply(variables, im, False)[0])(x)
    tail = make_decoder_tail(params["decoder"], bstats["decoder"],
                             scales={"a0": 1.0, "a1": 1.0}, quantize=False)

    @jax.jit
    def got_fn(im):
        feat, low = backbone_taps(dec_model, variables, im)
        return tail(feat, low)

    got = got_fn(x)
    assert got.shape == want.shape and got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(want, np.float32),
                               rtol=1e-4, atol=1e-4)


def test_fold_bn_formula():
    """conv(x, W*inv) + shift == BN_eval(conv(x, W)) on random tensors."""
    rng = np.random.RandomState(0)
    k = rng.randn(3, 3, 5, 4).astype(np.float32)
    bn_p = {"scale": rng.rand(4).astype(np.float32) + 0.5,
            "bias": rng.randn(4).astype(np.float32)}
    bn_s = {"mean": rng.randn(4).astype(np.float32),
            "var": rng.rand(4).astype(np.float32) + 0.1}
    w, b = fold_bn(k, bn_p, bn_s)
    x = jnp.asarray(rng.randn(1, 8, 8, 5).astype(np.float32))
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    conv = lambda kk: jax.lax.conv_general_dilated(
        x, jnp.asarray(kk), (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn)
    inv = bn_p["scale"] / np.sqrt(bn_s["var"] + 1e-5)
    want = np.asarray(conv(k)) * inv + (bn_p["bias"] - bn_s["mean"] * inv)
    got = np.asarray(conv(w)) + b
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_weight_quantization_per_channel():
    """Per-output-channel symmetric int8: channels with wildly different
    magnitudes each use their full [-127,127] range, and dequantization
    error is bounded by half a quantization step."""
    from s2r_tpu.io.quant import _quantize_weights

    rng = np.random.RandomState(3)
    w = rng.randn(3, 3, 8, 4).astype(np.float32)
    w *= np.asarray([1e-3, 1.0, 10.0, 100.0], np.float32)
    q, s = _quantize_weights(w)
    assert q.dtype == np.int8 and s.shape == (4,)
    np.testing.assert_array_equal(np.max(np.abs(q), axis=(0, 1, 2)),
                                  [127, 127, 127, 127])
    # (plain comparison: assert_array_less rejects broadcastable shapes)
    assert np.all(np.abs(q * s - w) < s / 2 + 1e-9)


@slow
def test_calibration_scales(scales):
    assert scales["a0"] > 0 and scales["a1"] > 0
    # post-BN activations of a fresh-init model are O(1); a scale of
    # max/127 must be well under 1
    assert scales["a0"] < 1.0 and scales["a1"] < 1.0


@slow
def test_calibration_rejects_empty_and_zero(small_model):
    model, params, bstats = small_model
    with pytest.raises(ValueError, match="at least one"):
        calibrate_decoder_int8(model, params, bstats, [])
    # all-zero calibration images: a fresh-init model (zero conv biases,
    # zero-mean/unit-var BN stats) propagates zeros to both tap points, so
    # the maxima are 0.0 and the degenerate-scales guard must fire rather
    # than silently producing zero/tiny activation scales
    with pytest.raises(ValueError, match="degenerate"):
        calibrate_decoder_int8(model, params, bstats,
                               [np.zeros((1, 65, 65, 3), np.float32)])


@pytest.mark.parametrize("output,argmax_res,label_dtype", [
    ("labels", "decoder", "int32"),
    ("labels", "decoder", "uint8"),
    ("labels", "full", "int32"),
    ("logits", "full", "int32"),
    ("probs", "full", "int32"),
])
@slow
def test_quant_combinations(small_model, scales, output, argmax_res,
                            label_dtype):
    model, params, bstats = small_model
    fn = jax.jit(make_serving_fn(model, params, bstats, output=output,
                                 argmax_res=argmax_res,
                                 label_dtype=label_dtype,
                                 quant="decoder_int8", quant_scales=scales))
    got = np.asarray(fn(jnp.asarray(_images(seed=2))))
    if output == "labels":
        assert got.shape == (2, 65, 65)
        assert got.dtype == (np.uint8 if label_dtype == "uint8" else np.int32)
        assert got.max() < 19
    else:
        assert got.shape == (2, 65, 65, 19) and got.dtype == np.float32
        if output == "probs":
            np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-5)


@slow
def test_quant_validation(small_model, scales):
    model, params, bstats = small_model
    with pytest.raises(ValueError, match="quant must be"):
        make_serving_fn(model, params, bstats, quant="int4")
    with pytest.raises(ValueError, match="quant_scales"):
        make_serving_fn(model, params, bstats, quant="decoder_int8")


@slow
def test_export_roundtrip_quant(tmp_path, small_model, scales):
    model, params, bstats = small_model
    path = str(tmp_path / "q.shlo")
    info = export_servable(model, params, bstats, (2, 65, 65, 3), path,
                           argmax_res="decoder", quant="decoder_int8",
                           quant_scales=scales)
    assert info["quant"] == "decoder_int8"
    assert info["quant_scales"]["a0"] == pytest.approx(scales["a0"])
    serve = load_servable(path)
    assert serve.meta["quant"] == "decoder_int8"
    x = jnp.asarray(_images(seed=5))
    got = np.asarray(serve(x))
    want = np.asarray(jax.jit(make_serving_fn(
        model, params, bstats, argmax_res="decoder",
        quant="decoder_int8", quant_scales=scales))(x))
    np.testing.assert_array_equal(got, want)
    # unquantized exports record quant='none'
    p2 = str(tmp_path / "nq.shlo")
    info2 = export_servable(model, params, bstats, (2, 65, 65, 3), p2)
    assert info2["quant"] == "none" and info2["quant_scales"] is None


@slow
def test_quant_trained_ckpt_agreement(tmp_path):
    """End-to-end accuracy bar on the committed convergence checkpoint:
    int8-decoder labels must agree with the exact serving path on almost
    all pixels and keep mIoU in the same regime (the same harness as
    test_serving.py::test_servable_preserves_trained_miou)."""
    from s2r_tpu.config import Config
    from s2r_tpu.data.loader import make_data_loader
    from s2r_tpu.eval.metrics import Evaluator
    from s2r_tpu.io.checkpoint import load_checkpoint
    from s2r_tpu.train.setup import build_method

    cfg = Config(dataset="synthetic", crop_size=128, base_size=128,
                 batch_size=4)
    m = build_method(cfg, iters_per_epoch=1, method="output_adapt")
    state = m.init_state(jax.random.PRNGKey(0))
    payload = load_checkpoint("run/synthetic/conv-reval/model_best.ckpt",
                              state)
    params, bstats = m.eval_variables(payload["state"])
    deeplab = (m.deeplab.clone(logits_dtype=None)
               if m.deeplab.logits_dtype is not None else m.deeplab)

    _, val_loader, _, nclass = make_data_loader(cfg)
    calib = [next(iter(val_loader))["image"]]
    sc = calibrate_decoder_int8(deeplab, params, bstats, calib)

    exact = jax.jit(make_serving_fn(deeplab, params, bstats,
                                    argmax_res="decoder"))
    quant = jax.jit(make_serving_fn(deeplab, params, bstats,
                                    argmax_res="decoder",
                                    quant="decoder_int8", quant_scales=sc))
    ev_exact, ev_quant = Evaluator(nclass), Evaluator(nclass)
    agree = total = 0
    for batch in val_loader:
        image = jnp.asarray(batch["image"])
        a = np.asarray(exact(image))
        b = np.asarray(quant(image))
        ev_exact.add_batch(batch["label"], a)
        ev_quant.add_batch(batch["label"], b)
        agree += int(np.sum(a == b))
        total += a.size
    miou_exact, _ = ev_exact.Mean_Intersection_over_Union()
    miou_quant, _ = ev_quant.Mean_Intersection_over_Union()
    assert miou_exact > 0.75, miou_exact  # sanity: ckpt really converged
    assert agree / total > 0.95, agree / total
    assert miou_quant > miou_exact - 0.03, (miou_exact, miou_quant)


def test_pallas_requant_matches_xla_chain():
    """ops/pallas/requant.py (interpret mode) == the XLA requant chain,
    bit-for-bit, incl. the inv_a folding and the clean-tiling fallback."""
    from s2r_tpu.ops.pallas.requant import requant_s32_to_s8, requant_xla

    rng = np.random.RandomState(0)
    m = jnp.asarray(rng.rand(256).astype(np.float32) * 1e-4)
    b = jnp.asarray(rng.randn(256).astype(np.float32))
    inv = jnp.float32(1.0 / 0.09)
    for shape in [(2, 8, 16, 256), (1, 32, 32, 256)]:
        x = jnp.asarray(rng.randint(-2**20, 2**20, shape, np.int32))
        got = np.asarray(requant_s32_to_s8(x, m, b, inv, interpret=True))
        want = np.asarray(requant_xla(x, m * inv, b * inv))
        assert got.dtype == np.int8
        np.testing.assert_array_equal(got, want)
    # rows that don't tile (and a non-128-multiple C) take the XLA fallback
    x = jnp.asarray(rng.randint(-2**20, 2**20, (3, 5, 7, 96), np.int32))
    m96, b96 = m[:96], b[:96]
    np.testing.assert_array_equal(
        np.asarray(requant_s32_to_s8(x, m96, b96, inv)),
        np.asarray(requant_xla(x, m96 * inv, b96 * inv)))


@slow
def test_quant_requant_lowerings_agree(small_model, scales):
    """make_serving_fn(quant_requant='xla') == 'pallas'(interpret) — the
    serving path produces identical labels under either requant lowering."""
    from unittest import mock

    import s2r_tpu.ops.pallas.requant as rq

    model, params, bstats = small_model
    img = _images(seed=11)
    lx = jax.jit(make_serving_fn(model, params, bstats,
                                 quant="decoder_int8", quant_scales=scales,
                                 quant_requant="xla"))(img)
    orig = rq.requant_s32_to_s8
    with mock.patch.object(
            rq, "requant_s32_to_s8",
            lambda *a, **k: orig(*a, **{**k, "interpret": True})):
        lp = jax.jit(make_serving_fn(model, params, bstats,
                                     quant="decoder_int8",
                                     quant_scales=scales,
                                     quant_requant="pallas"))(img)
    np.testing.assert_array_equal(np.asarray(lx), np.asarray(lp))
