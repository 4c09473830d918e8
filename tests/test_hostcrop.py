"""--data-cache hostcrop path: box-resampled augmentation from cached
decoded frames (data/hostcrop.py) vs the PIL transform path, cache byte
budget, and the end-to-end u8 feed."""

import random

import numpy as np
import pytest
from PIL import Image

from s2r_tpu.config import Config
from s2r_tpu.data.datasets import _FrameCache, TrainSet
from s2r_tpu.data.loader import make_data_loader
from s2r_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD


@pytest.fixture
def roots(tmp_path):
    rng = np.random.RandomState(0)
    for d in ("src_img", "src_label", "tgt_img", "val_img", "val_label",
              "test_img"):
        (tmp_path / d).mkdir()
    for i in range(6):
        Image.fromarray(rng.randint(0, 255, (63, 90, 3), dtype=np.uint8)) \
            .save(tmp_path / "src_img" / f"{i}.png")
        Image.fromarray(rng.randint(0, 35, (63, 90), dtype=np.uint8)) \
            .save(tmp_path / "src_label" / f"{i}.png")
        Image.fromarray(rng.randint(0, 255, (50, 100, 3), dtype=np.uint8)) \
            .save(tmp_path / "tgt_img" / f"t{i}.png")
        stem = f"city_{i}_"
        Image.fromarray(rng.randint(0, 255, (50, 70, 3), dtype=np.uint8)) \
            .save(tmp_path / "val_img" / (stem + "leftImg8bit.png"))
        Image.fromarray(rng.randint(0, 35, (50, 70), dtype=np.uint8)) \
            .save(tmp_path / "val_label" / (stem + "gtFine_labelIds.png"))
        Image.fromarray(rng.randint(0, 255, (50, 70, 3), dtype=np.uint8)) \
            .save(tmp_path / "test_img" / (stem + "leftImg8bit.png"))
    return tmp_path


def _sets(roots, cache):
    return TrainSet(str(roots / "src_img"), str(roots / "src_label"),
                    str(roots / "tgt_img"), base_size=48, crop_size=32,
                    cache=cache)


def test_hostcrop_matches_pil_path(roots):
    """Same (seed, index) rng -> the cached box-resampled crop matches the
    full PIL resize-then-crop within 2 u8 LSB (1 from box coordinate
    rounding, 1 more when blur re-rounds); labels are BIT-exact (index-ramp
    NEAREST picks)."""
    plain, cached = _sets(roots, False), _sets(roots, True)
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    for idx in range(6):
        for seed in range(4):
            a = plain.__getitem__(idx, rng=random.Random(seed))
            b = cached.__getitem__(idx, rng=random.Random(seed))
            assert b["src_image"].dtype == np.uint8
            for k in ("src_image", "tgt_image"):
                u8_pil = np.round((a[k] * std + mean) * 255).astype(np.int32)
                d = np.abs(u8_pil - b[k].astype(np.int32)).max()
                assert d <= 2, (idx, seed, k, d)
            np.testing.assert_array_equal(
                b["src_label"].astype(np.int32), a["src_label"],
                err_msg=f"{idx} {seed}")


def test_hostcrop_rectangular_crop(roots):
    ds = TrainSet(str(roots / "src_img"), str(roots / "src_label"),
                  str(roots / "tgt_img"), base_size=48, crop_size=(24, 40),
                  cache=True)
    s = ds.__getitem__(0, rng=random.Random(3))
    assert s["src_image"].shape == (24, 40, 3)
    assert s["tgt_image"].shape == (24, 40, 3)
    assert s["src_label"].shape == (24, 40)


def test_cache_byte_cap_degrades_gracefully():
    cache = _FrameCache(max_bytes=3000)
    calls = {"n": 0}

    def load(path):
        calls["n"] += 1
        return np.full((10, 100), int(path), np.uint8)  # 1000 B each

    for p in ("1", "2", "3", "4", "5"):
        a = cache.get(p, load)
        assert (a == int(p)).all()
    assert cache.nbytes() <= 3000
    # cached entries hit; over-budget entries decode per access
    n0 = calls["n"]
    for p in ("1", "2", "3"):
        cache.get(p, load)
    assert calls["n"] == n0
    cache.get("5", load)
    assert calls["n"] == n0 + 1
    assert (cache.get("5", load) == 5).all()


def test_loader_cached_u8_feed_matches_pil_f32(roots):
    """make_data_loader(--data-cache) ships u8; device normalization
    (normalize_u8_batch) restores the PIL loader's f32 batch."""
    from s2r_tpu.data.device_aug import normalize_u8_batch

    def cfg(cache):
        return Config(dataset="gtav2cityscapes",
                      src_img_root=str(roots / "src_img"),
                      src_label_root=str(roots / "src_label"),
                      tgt_img_root=str(roots / "tgt_img"),
                      val_img_root=str(roots / "val_img"),
                      val_label_root=str(roots / "val_label"),
                      test_img_root=str(roots / "test_img"),
                      crop_size=32, base_size=48, batch_size=2, workers=2,
                      data_cache=cache)

    train_pil, _, _, _ = make_data_loader(cfg(False))
    train_c8, _, _, _ = make_data_loader(cfg(True))
    bp = next(iter(train_pil))
    bc = next(iter(train_c8))
    assert bc["src_image"].dtype == np.uint8
    fin = {k: np.asarray(v) for k, v in normalize_u8_batch(bc).items()}
    assert fin["src_image"].dtype == np.float32
    assert fin["src_label"].dtype == np.int32
    # identical (seed, epoch, index) rng stream -> same augmentation draws
    np.testing.assert_array_equal(
        np.asarray(bp["src_label"]) == 255, fin["src_label"] == 255)
    assert np.abs(fin["src_image"] - bp["src_image"]).max() < 0.03


def test_gta5_hostcrop(roots):
    from s2r_tpu.data.datasets import GTA5

    ds = GTA5(str(roots / "src_img"), str(roots / "src_label"),
              base_size=48, crop_size=32, split="train", cache=True)
    s = ds.__getitem__(0, rng=random.Random(1))
    assert s["image"].dtype == np.uint8
    assert s["image"].shape == (32, 32, 3)
    assert s["label"].shape == (32, 32)
