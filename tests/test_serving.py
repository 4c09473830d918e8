"""AOT serving artifacts (io/serving.py): export -> load -> run round-trip.

The reference has no deployment path beyond torch checkpoints consumed by
its own drivers (reference: val_adapt.py loading train_adapt.py's saves);
the servable artifact is the TPU-native beyond-parity answer.  These tests
pin the contract: the loaded StableHLO artifact reproduces the JITTED
in-framework eval forward bit-for-bit on the same backend, for every output
kind, for the raw-RGB8 ingest path, and under batch polymorphism.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2r_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
from s2r_tpu.io.serving import (Servable, export_servable, load_servable,
                                make_serving_fn)
from s2r_tpu.models import DeepLab

pytestmark = pytest.mark.slow  # step-compile / e2e: full tier only


@pytest.fixture(scope="module")
def small_model():
    model = DeepLab(output_stride=16, num_classes=19)
    x = jnp.zeros((1, 65, 65, 3))
    vars_ = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, x, False))()
    return model, vars_["params"], vars_["batch_stats"]


def _images(n=2, h=65, w=65, seed=0):
    return np.random.RandomState(seed).rand(n, h, w, 3).astype(np.float32)


def test_roundtrip_matches_direct_apply(tmp_path, small_model):
    model, params, bstats = small_model
    path = str(tmp_path / "m.shlo")
    info = export_servable(model, params, bstats, (2, 65, 65, 3), path,
                           output="logits")
    assert info["backbone"] == "mobilenet" and info["num_classes"] == 19

    serve = load_servable(path)
    assert serve.meta["input_shape"] == [2, 65, 65, 3]
    x = _images()
    got = np.asarray(serve(jnp.asarray(x)))
    # bit-exact vs the jitted weights-as-constants closure — the exact
    # program that was exported (jitting apply with weights as *arguments*
    # fuses differently and is only ~1e-5 close)
    want = jax.jit(make_serving_fn(model, params, bstats, output="logits"))(
        jnp.asarray(x))
    np.testing.assert_array_equal(got, np.asarray(want, np.float32))
    # and ~float-noise close to the in-framework eval forward
    direct, _ = model.apply({"params": params, "batch_stats": bstats},
                            jnp.asarray(x), False)
    np.testing.assert_allclose(got, np.asarray(direct, np.float32),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("output", ["labels", "probs"])
def test_output_kinds(tmp_path, small_model, output):
    model, params, bstats = small_model
    path = str(tmp_path / f"{output}.shlo")
    export_servable(model, params, bstats, (1, 65, 65, 3), path,
                    output=output)
    serve = load_servable(path)
    x = _images(n=1, seed=3)
    got = np.asarray(serve(jnp.asarray(x)))
    want = jax.jit(make_serving_fn(model, params, bstats, output=output))(
        jnp.asarray(x))
    np.testing.assert_array_equal(got, np.asarray(want))
    if output == "labels":
        assert got.dtype == np.int32 and got.shape == (1, 65, 65)
        assert got.max() < 19
    else:
        np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-5)


def test_pad_batch_to_matches_unpadded(tmp_path, small_model):
    """pad_batch_to: eval-mode BN has no cross-sample coupling, so the
    padded graph's real-row outputs equal the unpadded graph's (labels
    exactly; logits to float noise — batch-8 vs batch-2 shapes may fuse
    differently), the pad rows are sliced away, and the artifact records
    the option."""
    model, params, bstats = small_model
    x = _images(n=2, seed=11)
    for output in ("labels", "logits"):
        padded = jax.jit(make_serving_fn(model, params, bstats,
                                         output=output, pad_batch_to=8))(
            jnp.asarray(x))
        plain = jax.jit(make_serving_fn(model, params, bstats,
                                        output=output))(jnp.asarray(x))
        assert padded.shape == plain.shape  # pad rows sliced away
        if output == "labels":
            np.testing.assert_array_equal(np.asarray(padded),
                                          np.asarray(plain))
        else:
            np.testing.assert_allclose(np.asarray(padded),
                                       np.asarray(plain),
                                       rtol=1e-4, atol=1e-5)
    # over-full batch is a build-time error
    with pytest.raises(ValueError, match="exceeds"):
        jax.jit(make_serving_fn(model, params, bstats,
                                pad_batch_to=1))(jnp.asarray(x))
    # export path round-trips the option + meta
    path = str(tmp_path / "pad.shlo")
    info = export_servable(model, params, bstats, (2, 65, 65, 3), path,
                           pad_batch_to=4)
    assert info["pad_batch_to"] == 4
    serve = load_servable(path)
    assert serve.meta["pad_batch_to"] == 4
    got = np.asarray(serve(jnp.asarray(x)))
    want = np.asarray(jax.jit(make_serving_fn(model, params, bstats))(
        jnp.asarray(x)))
    assert got.shape == (2, 65, 65)
    np.testing.assert_array_equal(got, want)


def test_rgb8_ingest_bakes_normalization(tmp_path, small_model):
    """input='rgb8' accepts raw uint8 frames and matches feeding the
    eval-transform-normalized tensor to a 'normalized' artifact."""
    model, params, bstats = small_model
    path = str(tmp_path / "rgb8.shlo")
    info = export_servable(model, params, bstats, (1, 65, 65, 3), path,
                           output="logits", input="rgb8")
    assert info["input_dtype"] == "uint8"
    serve = load_servable(path)

    raw = np.random.RandomState(1).randint(0, 256, (1, 65, 65, 3), np.uint8)
    got = np.asarray(serve(jnp.asarray(raw)))

    # in-graph normalization is (x - 255*mean) / (255*std) — algebraically
    # equal to the host transform but rounded differently, hence tolerance
    normalized = ((raw.astype(np.float32) / 255.0 - IMAGENET_MEAN)
                  / IMAGENET_STD).astype(np.float32)
    want, _ = jax.jit(model.apply, static_argnums=2)(
        {"params": params, "batch_stats": bstats}, jnp.asarray(normalized),
        False)
    np.testing.assert_allclose(got, np.asarray(want, np.float32),
                               rtol=1e-4, atol=1e-4)


def test_batch_polymorphic(tmp_path, small_model):
    model, params, bstats = small_model
    path = str(tmp_path / "poly.shlo")
    info = export_servable(model, params, bstats, (1, 65, 65, 3), path,
                           batch_polymorphic=True)
    assert info["batch_polymorphic"] is True
    serve = load_servable(path)
    for n in (1, 3):
        got = np.asarray(serve(jnp.asarray(_images(n=n, seed=n))))
        assert got.shape == (n, 65, 65)


def test_cli_export_servable_end_to_end(tmp_path):
    """cli.export --format servable: native checkpoint -> .shlo -> load ->
    predictions match the framework eval forward on the same frames."""
    from s2r_tpu.cli import export as export_cli
    from s2r_tpu.config import Config
    from s2r_tpu.io.checkpoint import save_checkpoint
    from s2r_tpu.train.setup import build_method

    cfg = Config(dataset="synthetic", crop_size=64, base_size=64,
                 batch_size=2, precision="f32")  # match --precision f32
    m = build_method(cfg, iters_per_epoch=1, method="output_adapt")
    state = m.init_state(jax.random.PRNGKey(11))
    ckpt = str(tmp_path / "model_best.ckpt")
    save_checkpoint(ckpt, state, epoch=4, best_pred=0.42)

    out = str(tmp_path / "model.shlo")
    export_cli.main(["--resume", ckpt, "--out", out, "--format", "servable",
                     "--serve-shape", "2", "64", "64",
                     "--serve-output", "logits", "--precision", "f32"])
    serve = load_servable(out)
    assert serve.meta["epoch"] == 4
    assert abs(serve.meta["best_pred"] - 0.42) < 1e-9

    x = _images(h=64, w=64, seed=9)
    got = np.asarray(serve(jnp.asarray(x)))
    params, bstats = m.eval_variables(state)
    logits, _ = jax.jit(m.deeplab.apply, static_argnums=2)(
        {"params": params, "batch_stats": bstats}, jnp.asarray(x), False)
    # weights-as-constants vs weights-as-arguments fuse differently, so
    # float-noise tolerance (random-init logits are near-uniform; argmax
    # would be tie-flippy here, hence the logits comparison)
    np.testing.assert_allclose(got, np.asarray(logits, np.float32),
                               rtol=1e-3, atol=1e-4)


def test_cli_infer_sweeps_directory(tmp_path, small_model):
    """cli.infer: .shlo + a directory of raw frames -> labelId/color PNGs,
    including the padded tail batch (3 frames through a batch-2 artifact)."""
    from PIL import Image

    from s2r_tpu.cli import infer as infer_cli

    model, params, bstats = small_model
    shlo = str(tmp_path / "m.shlo")
    export_servable(model, params, bstats, (2, 64, 64, 3), shlo,
                    output="labels", input="rgb8")

    frames = tmp_path / "frames"
    frames.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        Image.fromarray(rng.randint(0, 256, (80, 96, 3), np.uint8)).save(
            frames / f"frame_{i}.png")

    out = tmp_path / "result"
    done = infer_cli.main(["--servable", shlo, "--images", str(frames),
                           "--out-dir", str(out)])
    assert done == 3
    for i in range(3):
        assert (out / f"frame_{i}_labelId.png").exists()
        assert (out / f"frame_{i}_color.png").exists()


def test_cli_infer_native_matches_pil(tmp_path, small_model):
    """The pipelined native-decode host path (cli.infer --host-backend
    native) produces the SAME predictions as the PIL path: decode + the
    PIL-compatible C resize + prefetch/overlap must not change a pixel."""
    from PIL import Image

    from s2r_tpu import native
    from s2r_tpu.cli import infer as infer_cli

    if not native.available():
        pytest.skip(f"native library unavailable: {native.build_error()}")

    model, params, bstats = small_model
    shlo = str(tmp_path / "m.shlo")
    export_servable(model, params, bstats, (2, 64, 64, 3), shlo,
                    output="labels", input="rgb8")
    frames = tmp_path / "frames"
    frames.mkdir()
    rng = np.random.RandomState(3)
    for i in range(5):  # odd source sizes force the resize path
        Image.fromarray(rng.randint(0, 256, (81, 97, 3), np.uint8)).save(
            frames / f"f{i}.png")
    for backend in ("native", "pil"):
        infer_cli.main(["--servable", shlo, "--images", str(frames),
                        "--out-dir", str(tmp_path / backend),
                        "--host-backend", backend])
    for i in range(5):
        a = np.asarray(Image.open(tmp_path / "native" / f"f{i}_labelId.png"))
        b = np.asarray(Image.open(tmp_path / "pil" / f"f{i}_labelId.png"))
        np.testing.assert_array_equal(a, b)


def test_argmax_decoder_fast_mode(tmp_path, small_model):
    """argmax_res='decoder' (fast serving): argmax at the decoder's stride-4
    resolution + align-corners-nearest label upsample.  Pins (a) the index
    math against a brute-force numpy nearest on the low-res argmax, (b) the
    meta record / output contract, and (c) exact agreement with the exact
    'full' mode at output pixels where the align-corners grid lands exactly
    on a decoder pixel (the bilinear weights are one-hot there, so both
    modes see the same logit vector)."""
    from s2r_tpu.io.serving import _nearest_ac_indices

    model, params, bstats = small_model
    path = str(tmp_path / "fast.shlo")
    info = export_servable(model, params, bstats, (2, 65, 65, 3), path,
                           argmax_res="decoder")
    assert info["argmax_res"] == "decoder"
    serve = load_servable(path)
    x = _images(seed=7)
    got = np.asarray(serve(jnp.asarray(x)))
    assert got.dtype == np.int32 and got.shape == (2, 65, 65)

    # brute-force expectation from the decoder-resolution argmax
    lowres, _ = model.clone(upsample_logits=False).apply(
        {"params": params, "batch_stats": bstats}, jnp.asarray(x), False)
    lab_lr = np.argmax(np.asarray(lowres, np.float32), -1)
    h_lr = lab_lr.shape[1]
    rows = np.floor(np.arange(65) * (h_lr - 1) / 64.0 + 0.5).astype(np.int32)
    np.testing.assert_array_equal(rows, _nearest_ac_indices(65, h_lr))
    expected = lab_lr[:, rows][:, :, rows]
    np.testing.assert_array_equal(got, expected)

    # agreement with the exact mode at the one-hot-weight grid points:
    # 65 -> h_lr is an integer align-corners ratio, so every stride-k output
    # pixel samples a decoder pixel exactly
    k = 64 // (h_lr - 1)
    exact = np.asarray(jax.jit(make_serving_fn(model, params, bstats))(
        jnp.asarray(x)))
    np.testing.assert_array_equal(got[:, ::k, ::k], exact[:, ::k, ::k])


def test_argmax_decoder_validation(small_model):
    model, params, bstats = small_model
    with pytest.raises(ValueError, match="only applies"):
        make_serving_fn(model, params, bstats, output="logits",
                        argmax_res="decoder")
    with pytest.raises(ValueError, match="argmax_res"):
        make_serving_fn(model, params, bstats, argmax_res="half")
    with pytest.raises(ValueError, match="only applies"):
        make_serving_fn(model, params, bstats, output="probs",
                        label_dtype="uint8")
    with pytest.raises(ValueError, match="label_dtype"):
        make_serving_fn(model, params, bstats, label_dtype="int8")


@pytest.mark.parametrize("argmax_res", ["full", "decoder"])
def test_uint8_label_dtype(tmp_path, small_model, argmax_res):
    """label_dtype='uint8': byte label plane (labelId PNGs are 8-bit; 4x
    fewer D2H bytes/frame), values identical to the int32 artifact in both
    argmax modes — the decoder mode casts BEFORE the nearest gather, which
    must not change any label."""
    model, params, bstats = small_model
    x = _images(seed=11)
    p8 = str(tmp_path / f"u8_{argmax_res}.shlo")
    info = export_servable(model, params, bstats, (2, 65, 65, 3), p8,
                           argmax_res=argmax_res, label_dtype="uint8")
    assert info["label_dtype"] == "uint8"
    got8 = np.asarray(load_servable(p8)(jnp.asarray(x)))
    assert got8.dtype == np.uint8 and got8.shape == (2, 65, 65)
    want = np.asarray(jax.jit(make_serving_fn(
        model, params, bstats, argmax_res=argmax_res))(jnp.asarray(x)))
    assert want.dtype == np.int32
    np.testing.assert_array_equal(got8.astype(np.int32), want)


def test_bad_magic_rejected(tmp_path):
    p = tmp_path / "junk.shlo"
    p.write_bytes(b"NOTANART" + b"\0" * 64)
    with pytest.raises(ValueError, match="bad magic"):
        load_servable(str(p))


def test_servable_preserves_trained_miou(tmp_path):
    """End-to-end accuracy through the deployment path: the committed
    convergence checkpoint (run/synthetic/conv-reval, held-out mIoU ~0.81,
    PARITY.md) is exported as a servable and swept over the same held-out
    synthetic val set — the artifact must reproduce the framework eval's
    mIoU, not just random-weight logit parity."""
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
    state = payload["state"]
    params, bstats = m.eval_variables(state)

    shlo = str(tmp_path / "trained.shlo")
    eval_deeplab = (m.deeplab.clone(logits_dtype=None)
                    if m.deeplab.logits_dtype is not None else m.deeplab)
    export_servable(eval_deeplab, params, bstats, (4, 128, 128, 3), shlo)
    serve = load_servable(shlo)
    fast_shlo = str(tmp_path / "trained_fast.shlo")
    export_servable(eval_deeplab, params, bstats, (4, 128, 128, 3),
                    fast_shlo, argmax_res="decoder")
    serve_fast = load_servable(fast_shlo)

    _, val_loader, _, nclass = make_data_loader(cfg)
    ev_frame, ev_serve = Evaluator(nclass), Evaluator(nclass)
    ev_fast = Evaluator(nclass)
    eval_step = jax.jit(m.eval_step)
    agree = total = 0
    for batch in val_loader:
        image = jnp.asarray(batch["image"])
        label = jnp.asarray(batch["label"])
        _, cm, _ = eval_step(params, bstats, image, label)
        ev_frame.merge(cm)
        exact = serve(image)
        fast = serve_fast(image)
        ev_serve.add_batch(label, exact)
        ev_fast.add_batch(label, fast)
        agree += int(np.sum(np.asarray(exact) == np.asarray(fast)))
        total += exact.size
    miou_frame, _ = ev_frame.Mean_Intersection_over_Union()
    miou_serve, _ = ev_serve.Mean_Intersection_over_Union()
    miou_fast, _ = ev_fast.Mean_Intersection_over_Union()
    assert miou_frame > 0.75, miou_frame  # the checkpoint really converged
    assert abs(miou_frame - miou_serve) < 5e-3, (miou_frame, miou_serve)
    # the fast mode differs from exact only where the bilinear blend flips
    # the winner near class boundaries — on a trained model that is a thin
    # sliver of pixels, and mIoU must stay in the same regime
    assert agree / total > 0.9, agree / total
    assert miou_fast > miou_frame - 0.05, (miou_frame, miou_fast)


def test_meta_passthrough_and_repr(tmp_path, small_model):
    model, params, bstats = small_model
    path = str(tmp_path / "meta.shlo")
    info = export_servable(model, params, bstats, (1, 65, 65, 3), path,
                           meta={"experiment": "exp_7", "epoch": 12})
    assert info["experiment"] == "exp_7"
    serve = load_servable(path)
    assert serve.meta["epoch"] == 12
    assert isinstance(serve, Servable)
