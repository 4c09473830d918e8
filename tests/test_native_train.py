"""Native C++ train-path batch vs the PIL reference pipeline.

With forced geometric decisions (flip, short_size, x1, y1) the native
windowed resampler must reproduce the PIL composition bit-exactly:
flip -> resize (BILINEAR imgs / NEAREST masks) -> pad right/bottom
(img 0 / mask 255) -> crop -> normalize / LUT remap
(reference custom_transforms.py:59-147).
"""

import numpy as np
import pytest
from PIL import Image, ImageOps

from s2r_tpu import native
from s2r_tpu.data.datasets import _LUT
from s2r_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

pytestmark = [
    pytest.mark.slow,  # step-compile / e2e: full tier only
    pytest.mark.skipif(not native.available(),
                       reason=f"native: {native.build_error()}"),
]


def _write_pngs(tmp_path, sw=97, sh=61, tw=83, th=53, seed=0):
    rng = np.random.RandomState(seed)
    src = rng.randint(0, 256, (sh, sw, 3), np.uint8)
    lbl = rng.randint(0, 35, (sh, sw), np.uint8)
    tgt = rng.randint(0, 256, (th, tw, 3), np.uint8)
    paths = {}
    for name, arr in (("src", src), ("lbl", lbl), ("tgt", tgt)):
        p = str(tmp_path / f"{name}.png")
        Image.fromarray(arr).save(p)
        paths[name] = p
    return paths, src, lbl, tgt


def _pil_pipeline(src, lbl, tgt, flip, short, x1, y1, crop):
    """The reference composition with pinned draws."""
    imgs = {"src": Image.fromarray(src), "lbl": Image.fromarray(_LUT[lbl]),
            "tgt": Image.fromarray(tgt)}
    if flip:
        imgs = {k: v.transpose(Image.FLIP_LEFT_RIGHT)
                for k, v in imgs.items()}
    w, h = imgs["src"].size
    if h > w:
        ow = short
        oh = int(1.0 * h * ow / w)
    else:
        oh = short
        ow = int(1.0 * w * oh / h)
    imgs = {k: v.resize((ow, oh),
                        Image.NEAREST if k == "lbl" else Image.BILINEAR)
            for k, v in imgs.items()}
    padw, padh = max(crop - ow, 0), max(crop - oh, 0)
    if padw or padh:
        imgs = {k: ImageOps.expand(v, border=(0, 0, padw, padh),
                                   fill=255 if k == "lbl" else 0)
                for k, v in imgs.items()}
    box = (x1, y1, x1 + crop, y1 + crop)
    imgs = {k: v.crop(box) for k, v in imgs.items()}
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    out = {"lbl": np.asarray(imgs["lbl"], np.int32)}
    for k in ("src", "tgt"):
        out[k] = ((np.asarray(imgs[k], np.float32) / 255.0 - mean) / std)
    return out


@pytest.mark.parametrize("flip,short,crop", [
    (0, 48, 32),   # downscale, no pad
    (1, 20, 32),   # upscale path + pad right/bottom
    (0, 32, 32),   # boundary
])
def test_forced_geometry_matches_pil(tmp_path, flip, short, crop):
    paths, src, lbl, tgt = _write_pngs(tmp_path)
    h, w = src.shape[:2]
    if h > w:
        ow, oh = short, int(1.0 * h * short / w)
    else:
        oh, ow = short, int(1.0 * w * short / h)
    W, H = ow + max(crop - ow, 0), oh + max(crop - oh, 0)
    x1, y1 = (W - crop) // 3, (H - crop) // 2

    n_src, n_lbl, n_tgt = native.train_batch(
        [paths["src"]], [paths["lbl"]], [paths["tgt"]], base_size=32,
        crop_size=crop, lut=_LUT, mean=IMAGENET_MEAN, std=IMAGENET_STD,
        forced=np.asarray([[flip, short, x1, y1]], np.int32), threads=2)

    want = _pil_pipeline(src, lbl, tgt, flip, short, x1, y1, crop)
    np.testing.assert_allclose(n_src[0], want["src"], atol=1e-6)
    np.testing.assert_allclose(n_tgt[0], want["tgt"], atol=1e-6)
    np.testing.assert_array_equal(n_lbl[0], want["lbl"])


def test_label_pad_is_ignore_index(tmp_path):
    paths, *_ = _write_pngs(tmp_path)
    _, lbl, _ = native.train_batch(
        [paths["src"]], [paths["lbl"]], None, base_size=16, crop_size=64,
        lut=_LUT, mean=IMAGENET_MEAN, std=IMAGENET_STD,
        forced=np.asarray([[0, 16, 0, 0]], np.int32), threads=1)
    # short=16 << crop=64: the right/bottom pad region must be ignore (255)
    assert (lbl[0, -1, :] == 255).all()
    assert (lbl[0, :, -1] == 255).all()
    assert (lbl[0] <= 18).sum() > 0  # real content survives
    valid = lbl[0][lbl[0] != 255]
    assert valid.size and valid.max() <= 18


def test_seeded_determinism_and_blur(tmp_path):
    paths, *_ = _write_pngs(tmp_path)
    kw = dict(base_size=32, crop_size=32, lut=_LUT, mean=IMAGENET_MEAN,
              std=IMAGENET_STD, threads=2, blur=True)
    a = native.train_batch([paths["src"]] * 4, [paths["lbl"]] * 4,
                           [paths["tgt"]] * 4, seeds=[7, 8, 9, 10], **kw)
    b = native.train_batch([paths["src"]] * 4, [paths["lbl"]] * 4,
                           [paths["tgt"]] * 4, seeds=[7, 8, 9, 10], **kw)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    c = native.train_batch([paths["src"]] * 4, [paths["lbl"]] * 4,
                           [paths["tgt"]] * 4, seeds=[17, 18, 19, 20], **kw)
    assert any(not np.array_equal(x, y) for x, y in zip(a, c))


def test_native_train_loader_via_make_data_loader(tmp_path):
    """--data-backend native now covers the TRAIN path too."""
    from s2r_tpu.config import Config
    from s2r_tpu.data.loader import make_data_loader

    n = 6
    rng = np.random.RandomState(0)
    for d in ("src", "lbl", "tgt", "val_img", "val_lbl"):
        (tmp_path / d).mkdir()
    for i in range(n):
        Image.fromarray(rng.randint(0, 256, (50, 70, 3), np.uint8)).save(
            str(tmp_path / "src" / f"{i}.png"))
        Image.fromarray(rng.randint(0, 34, (50, 70), np.uint8)).save(
            str(tmp_path / "lbl" / f"{i}.png"))
        Image.fromarray(rng.randint(0, 256, (40, 60, 3), np.uint8)).save(
            str(tmp_path / "tgt" / f"{i}.png"))
    Image.fromarray(rng.randint(0, 256, (40, 60, 3), np.uint8)).save(
        str(tmp_path / "val_img" / "x_leftImg8bit.png"))
    Image.fromarray(rng.randint(0, 34, (40, 60), np.uint8)).save(
        str(tmp_path / "val_lbl" / "x_gtFine_labelIds.png"))

    cfg = Config(dataset="gtav2cityscapes", data_backend="native",
                 src_img_root=str(tmp_path / "src"),
                 src_label_root=str(tmp_path / "lbl"),
                 tgt_img_root=str(tmp_path / "tgt"),
                 val_img_root=str(tmp_path / "val_img"),
                 val_label_root=str(tmp_path / "val_lbl"),
                 test_img_root=str(tmp_path / "val_img"),
                 base_size=32, crop_size=32, batch_size=2, workers=2)
    train, val, test, nclass = make_data_loader(cfg)
    assert nclass == 19 and len(train) == 3
    train.set_epoch(0)
    batches = list(train)
    assert len(batches) == 3
    b = batches[0]
    assert b["src_image"].shape == (2, 32, 32, 3)
    assert b["src_label"].shape == (2, 32, 32)
    assert b["tgt_image"].shape == (2, 32, 32, 3)
    assert b["src_label"].max() == 255 or b["src_label"].max() <= 18
    # determinism: same epoch -> same batches
    train.set_epoch(0)
    again = list(train)
    np.testing.assert_array_equal(b["src_image"], again[0]["src_image"])
    # different epoch -> different augmentation
    train.set_epoch(1)
    other = list(train)
    assert not all(
        np.array_equal(x["src_image"], y["src_image"])
        for x, y in zip(batches, other))


def test_source_only_no_target(tmp_path):
    paths, *_ = _write_pngs(tmp_path)
    src, lbl, tgt = native.train_batch(
        [paths["src"]] * 2, [paths["lbl"]] * 2, None, base_size=32,
        crop_size=32, lut=_LUT, mean=IMAGENET_MEAN, std=IMAGENET_STD,
        seeds=[1, 2], threads=1)
    assert tgt is None
    assert src.shape == (2, 32, 32, 3) and lbl.shape == (2, 32, 32)
    assert np.isfinite(src).all()
