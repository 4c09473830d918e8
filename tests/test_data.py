import os
import random

import numpy as np
import pytest
from PIL import Image

from s2r_tpu.config import Config
from s2r_tpu.data import transforms as T
from s2r_tpu.data.datasets import (GTA5, TestSet, TrainSet, ValSet,
                                   encode_segmap)
from s2r_tpu.data.loader import DataLoader, make_data_loader
from s2r_tpu.data.palette import (decode_segmap, decode_seg_map_sequence,
                                  get_cityscapes_labels)
from s2r_tpu.data.synthetic import SyntheticTrainSet


def _reference_encode(mask):
    # the reference's sequential in-place remap (gtav2cityscapes.py:77-83)
    void = [0, 1, 2, 3, 4, 5, 6, 9, 10, 14, 15, 16, 18, 29, 30, 34]
    valid = [7, 8, 11, 12, 13, 17, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28,
             31, 32, 33]
    class_map = dict(zip(valid, range(19)))
    m = mask.copy()
    for v in void:
        m[m == v] = 255
    for v in valid:
        m[m == v] = class_map[v]
    return m


def test_encode_segmap_matches_reference_remap():
    rng = np.random.RandomState(0)
    raw = rng.randint(0, 35, size=(40, 60)).astype(np.uint8)
    np.testing.assert_array_equal(encode_segmap(raw), _reference_encode(raw))


def _mk_sample(h=100, w=140):
    rng = np.random.RandomState(1)
    img = Image.fromarray(rng.randint(0, 255, (h, w, 3), dtype=np.uint8))
    tgt = Image.fromarray(rng.randint(0, 255, (h, w, 3), dtype=np.uint8))
    lbl = Image.fromarray(rng.randint(0, 19, (h, w), dtype=np.uint8))
    return {"src_image": img, "tgt_image": tgt, "src_label": lbl}


def test_train_transforms_shapes_and_types():
    tr = T.train_transforms(base_size=64, crop_size=64)
    out = tr(_mk_sample(), random.Random(0))
    assert out["src_image"].shape == (64, 64, 3)
    assert out["src_image"].dtype == np.float32
    assert out["tgt_image"].shape == (64, 64, 3)
    assert out["src_label"].shape == (64, 64)
    assert out["src_label"].dtype == np.int32
    # padding fill is ignore_index for masks
    assert set(np.unique(out["src_label"])) <= set(range(19)) | {255}


def test_transforms_deterministic_given_rng():
    tr = T.train_transforms(base_size=64, crop_size=64)
    a = tr(_mk_sample(), random.Random(42))
    b = tr(_mk_sample(), random.Random(42))
    np.testing.assert_array_equal(a["src_image"], b["src_image"])
    np.testing.assert_array_equal(a["src_label"], b["src_label"])


def test_flip_is_joint():
    sample = _mk_sample()

    class AlwaysFlipRng(random.Random):
        def random(self):
            return 0.0

    out = T.RandomHorizontalFlip()(sample, AlwaysFlipRng())
    np.testing.assert_array_equal(np.asarray(out["src_image"]),
                                  np.asarray(sample["src_image"])[:, ::-1])
    np.testing.assert_array_equal(np.asarray(out["src_label"]),
                                  np.asarray(sample["src_label"])[:, ::-1])


def test_normalize_matches_reference_formula():
    sample = _mk_sample()
    out = T.Normalize()(sample)
    raw = np.asarray(sample["src_image"], np.float32) / 255.0
    expected = (raw - np.array(T.IMAGENET_MEAN)) / np.array(T.IMAGENET_STD)
    np.testing.assert_allclose(out["src_image"], expected, rtol=1e-5,
                               atol=1e-6)
    assert out["src_label"].dtype == np.int32


def test_eval_transforms():
    tr = T.eval_transforms(crop_size=48)
    out = tr({"image": _mk_sample()["src_image"],
              "label": _mk_sample()["src_label"]})
    assert out["image"].shape == (48, 48, 3)
    assert out["label"].shape == (48, 48)


@pytest.fixture
def fake_dataset_dirs(tmp_path):
    rng = np.random.RandomState(2)
    dirs = {}
    for name in ("src_img", "src_label", "tgt_img", "val_img", "val_label"):
        d = tmp_path / name
        d.mkdir()
        dirs[name] = str(d)
    for i in range(6):
        Image.fromarray(rng.randint(0, 255, (50, 70, 3), dtype=np.uint8)) \
            .save(tmp_path / "src_img" / f"{i:05d}.png")
        Image.fromarray(rng.randint(0, 35, (50, 70), dtype=np.uint8)) \
            .save(tmp_path / "src_label" / f"{i:05d}.png")
        Image.fromarray(rng.randint(0, 255, (50, 70, 3), dtype=np.uint8)) \
            .save(tmp_path / "tgt_img" / f"tgt_{i:05d}.png")
    for i in range(4):
        stem = f"city_{i:05d}_"
        Image.fromarray(rng.randint(0, 255, (50, 70, 3), dtype=np.uint8)) \
            .save(tmp_path / "val_img" / (stem + "leftImg8bit.png"))
        Image.fromarray(rng.randint(0, 35, (50, 70), dtype=np.uint8)) \
            .save(tmp_path / "val_label" / (stem + "gtFine_labelIds.png"))
    return dirs


def test_trainset_valset_testset(fake_dataset_dirs):
    d = fake_dataset_dirs
    ts = TrainSet(d["src_img"], d["src_label"], d["tgt_img"], 32, 32)
    assert len(ts) == 6
    s = ts.__getitem__(0, random.Random(0))
    assert s["src_image"].shape == (32, 32, 3)
    assert s["tgt_image"].shape == (32, 32, 3)

    vs = ValSet(d["val_img"], d["val_label"], 32)
    assert len(vs) == 4
    v = vs[0]
    assert v["image"].shape == (32, 32, 3)
    assert v["name"].endswith("leftImg8bit.png")  # name key present (bug fix)

    xs = TestSet(d["val_img"], "", 32)
    x = xs[0]
    assert (x["label"] == 255).all()  # dummy label when no label root
    assert "name" in x


def test_gta5_split(fake_dataset_dirs):
    d = fake_dataset_dirs
    train = GTA5(d["src_img"], d["src_label"], 32, 32, "train")
    val = GTA5(d["src_img"], d["src_label"], 32, 32, "val")
    test = GTA5(d["src_img"], d["src_label"], 32, 32, "test")
    assert len(train) == 4 and len(val) == 1 and len(test) == 1  # 70/20/10 of 6
    # splits are pairwise disjoint (the reference's repeated global-stream
    # shuffles make its splits overlap — gta5.py:10,24; fixed here)
    assert not (set(train.files) & set(val.files))
    assert not (set(train.files) & set(test.files))
    assert not (set(val.files) & set(test.files))
    assert set(train.files) | set(val.files) | set(test.files) == \
        set(train.files + val.files + test.files)
    assert val[0]["image"].shape == (32, 32, 3)


def test_loader_batching_and_drop_last(fake_dataset_dirs):
    d = fake_dataset_dirs
    ts = TrainSet(d["src_img"], d["src_label"], d["tgt_img"], 32, 32)
    dl = DataLoader(ts, batch_size=4, shuffle=True, drop_last=True,
                    num_workers=2, seed=0)
    assert len(dl) == 1  # 6 // 4
    batches = list(dl)
    assert len(batches) == 1
    assert batches[0]["src_image"].shape == (4, 32, 32, 3)
    assert batches[0]["src_label"].dtype == np.int32

    dl2 = DataLoader(ts, batch_size=4, drop_last=False, num_workers=2)
    assert len(dl2) == 2
    assert [b["src_image"].shape[0] for b in dl2] == [4, 2]


def test_loader_epoch_determinism(fake_dataset_dirs):
    d = fake_dataset_dirs
    ts = TrainSet(d["src_img"], d["src_label"], d["tgt_img"], 32, 32)
    dl = DataLoader(ts, batch_size=2, shuffle=True, num_workers=2, seed=7)
    dl.set_epoch(0)
    a = [b["src_image"].copy() for b in dl]
    dl.set_epoch(0)
    b = [x["src_image"].copy() for x in dl]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    dl.set_epoch(1)
    c = [x["src_image"].copy() for x in dl]
    assert any(not np.array_equal(x, y) for x, y in zip(a, c))


def test_make_data_loader_synthetic():
    cfg = Config(dataset="synthetic", crop_size=32, batch_size=2, workers=2)
    train, val, test, nclass = make_data_loader(cfg)
    assert nclass == 19
    b = next(iter(train))
    assert b["src_image"].shape == (2, 32, 32, 3)
    v = next(iter(val))
    assert v["image"].shape == (2, 32, 32, 3)
    assert isinstance(v["name"], list)


def test_palette_roundtrip():
    lbl = np.arange(19).reshape(1, 19).repeat(2, axis=0)
    rgb = decode_segmap(lbl)
    colors = get_cityscapes_labels() / 255.0
    np.testing.assert_allclose(rgb[0], colors, rtol=1e-6)
    ignore = np.full((2, 2), 255)
    assert (decode_segmap(ignore) == 0).all()
    seq = decode_seg_map_sequence(np.stack([lbl, lbl]))
    assert seq.shape == (2, 2, 19, 3)


def test_staged_frame_cache(tmp_path, monkeypatch):
    """--data-cache: the staged train path decodes each frame once and
    serves identical arrays afterwards."""
    import s2r_tpu.data.datasets as DS
    from PIL import Image

    src = tmp_path / "src"; lbl = tmp_path / "lbl"; tgt = tmp_path / "tgt"
    for d in (src, lbl, tgt):
        d.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        Image.fromarray(rng.randint(0, 255, (32, 48, 3), "uint8")).save(
            src / f"{i}.png")
        Image.fromarray(rng.randint(0, 33, (32, 48), "uint8")).save(
            lbl / f"{i}.png")
        Image.fromarray(rng.randint(0, 255, (32, 48, 3), "uint8")).save(
            tgt / f"{i}.png")

    calls = {"n": 0}
    orig = DS._load_rgb

    def counting(path):
        calls["n"] += 1
        return orig(path)

    monkeypatch.setattr(DS, "_load_rgb", counting)
    ds = DS.TrainSet(str(src), str(lbl), str(tgt), 32, 32, staged=True,
                     cache=True)
    import random as _r
    s1 = ds.__getitem__(0, _r.Random(0))
    n_first = calls["n"]
    s2 = ds.__getitem__(0, _r.Random(0))  # same rng -> same target pick
    assert calls["n"] == n_first, "second access must not re-decode"
    for k in s1:
        np.testing.assert_array_equal(s1[k], s2[k])
    assert ds.cache.nbytes() > 0

    # uncached staged path decodes every time
    monkeypatch.setattr(DS, "_load_rgb", counting)
    ds2 = DS.TrainSet(str(src), str(lbl), str(tgt), 32, 32, staged=True,
                      cache=False)
    c0 = calls["n"]
    ds2.__getitem__(0, _r.Random(0))
    ds2.__getitem__(0, _r.Random(0))
    assert calls["n"] > c0 + 2
