"""Native C++ pipeline vs PIL/numpy reference."""

import io

import numpy as np
import pytest
from PIL import Image

from s2r_tpu import native
from s2r_tpu.data.datasets import _LUT, encode_segmap
from s2r_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

pytestmark = pytest.mark.skipif(
    not native.available(),
    reason=f"native lib unavailable: {native.build_error()}")


def _png_bytes(arr):
    img = Image.fromarray(arr)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def test_png_decode_rgb():
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 255, (37, 53, 3), dtype=np.uint8)
    out = native.decode_png(_png_bytes(arr), channels=3)
    np.testing.assert_array_equal(out, arr)


def test_png_decode_gray():
    rng = np.random.RandomState(1)
    arr = rng.randint(0, 35, (40, 60), dtype=np.uint8)
    out = native.decode_png(_png_bytes(arr), channels=1)
    np.testing.assert_array_equal(out, arr)


@pytest.mark.parametrize("src,dst", [((100, 140), (64, 64)),
                                     ((50, 70), (128, 128)),
                                     ((512, 1024), (512, 512))])
def test_bilinear_matches_pil(src, dst):
    rng = np.random.RandomState(2)
    arr = rng.randint(0, 255, (*src, 3), dtype=np.uint8)
    ours = native.resize_bilinear(arr, dst)
    theirs = np.asarray(Image.fromarray(arr).resize((dst[1], dst[0]),
                                                    Image.BILINEAR))
    # PIL uses int16 fixed-point coefficients; we use float64 -> up to 1 LSB
    # of rounding skew on a sizeable pixel fraction, never more.
    diff = np.abs(ours.astype(int) - theirs.astype(int))
    assert diff.max() <= 1, diff.max()


@pytest.mark.parametrize("src,dst", [((100, 140), (64, 64)),
                                     ((50, 70), (128, 128))])
def test_nearest_matches_pil(src, dst):
    rng = np.random.RandomState(3)
    arr = rng.randint(0, 35, (*src,), dtype=np.uint8)
    ours = native.resize_nearest(arr, dst)
    theirs = np.asarray(Image.fromarray(arr).resize((dst[1], dst[0]),
                                                    Image.NEAREST))
    np.testing.assert_array_equal(ours, theirs)


def test_remap_matches_lut():
    rng = np.random.RandomState(4)
    labels = rng.randint(0, 40, (64, 64), dtype=np.uint8)
    np.testing.assert_array_equal(native.remap(labels, _LUT),
                                  encode_segmap(labels))


def test_normalize():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 255, (16, 16, 3), dtype=np.uint8)
    ours = native.normalize(img, IMAGENET_MEAN, IMAGENET_STD)
    want = ((img.astype(np.float32) / 255.0) - np.asarray(IMAGENET_MEAN,
                                                          np.float32)) \
        / np.asarray(IMAGENET_STD, np.float32)
    np.testing.assert_allclose(ours, want, rtol=1e-5, atol=1e-6)


def test_eval_batch_matches_python_pipeline(tmp_path):
    from s2r_tpu.data import transforms as T

    rng = np.random.RandomState(6)
    img_paths, lbl_paths = [], []
    for i in range(4):
        img = rng.randint(0, 255, (50, 70, 3), dtype=np.uint8)
        lbl = rng.randint(0, 35, (50, 70), dtype=np.uint8)
        ip = str(tmp_path / f"img_{i}.png")
        lp = str(tmp_path / f"lbl_{i}.png")
        Image.fromarray(img).save(ip)
        Image.fromarray(lbl).save(lp)
        img_paths.append(ip)
        lbl_paths.append(lp)

    images, labels = native.eval_batch(img_paths, lbl_paths, crop=32,
                                       lut=_LUT, mean=IMAGENET_MEAN,
                                       std=IMAGENET_STD, threads=4)
    assert images.shape == (4, 32, 32, 3)
    assert labels.shape == (4, 32, 32)

    tr = T.eval_transforms(32)
    for i in range(4):
        pil_img = Image.open(img_paths[i]).convert("RGB")
        pil_lbl = Image.fromarray(
            encode_segmap(np.asarray(Image.open(lbl_paths[i]))))
        ref = tr({"image": pil_img, "label": pil_lbl})
        # label path must be exact (nearest + LUT)
        np.testing.assert_array_equal(labels[i], ref["label"])
        # image path within 1 uint8 LSB of PIL before normalization
        assert np.abs(images[i] - ref["image"]).max() < (1.5 / 255.0) / min(
            IMAGENET_STD)


def test_eval_batch_missing_file_raises(tmp_path):
    with pytest.raises(RuntimeError):
        native.eval_batch([str(tmp_path / "nope.png")], None, 32, _LUT,
                          IMAGENET_MEAN, IMAGENET_STD)
