import numpy as np
import pytest
from PIL import Image

from s2r_tpu import native
from s2r_tpu.config import Config
from s2r_tpu.data.loader import make_data_loader

pytestmark = pytest.mark.skipif(
    not native.available(),
    reason=f"native lib unavailable: {native.build_error()}")


@pytest.fixture
def roots(tmp_path):
    rng = np.random.RandomState(0)
    for d in ("src_img", "src_label", "tgt_img", "val_img", "val_label",
              "test_img"):
        (tmp_path / d).mkdir()
    for i in range(4):
        Image.fromarray(rng.randint(0, 255, (50, 70, 3), dtype=np.uint8)) \
            .save(tmp_path / "src_img" / f"{i}.png")
        Image.fromarray(rng.randint(0, 35, (50, 70), dtype=np.uint8)) \
            .save(tmp_path / "src_label" / f"{i}.png")
        Image.fromarray(rng.randint(0, 255, (50, 70, 3), dtype=np.uint8)) \
            .save(tmp_path / "tgt_img" / f"t{i}.png")
        stem = f"city_{i}_"
        Image.fromarray(rng.randint(0, 255, (50, 70, 3), dtype=np.uint8)) \
            .save(tmp_path / "val_img" / (stem + "leftImg8bit.png"))
        Image.fromarray(rng.randint(0, 35, (50, 70), dtype=np.uint8)) \
            .save(tmp_path / "val_label" / (stem + "gtFine_labelIds.png"))
        Image.fromarray(rng.randint(0, 255, (50, 70, 3), dtype=np.uint8)) \
            .save(tmp_path / "test_img" / (stem + "leftImg8bit.png"))
    return tmp_path


def _cfg(roots, backend):
    return Config(dataset="gtav2cityscapes",
                  src_img_root=str(roots / "src_img"),
                  src_label_root=str(roots / "src_label"),
                  tgt_img_root=str(roots / "tgt_img"),
                  val_img_root=str(roots / "val_img"),
                  val_label_root=str(roots / "val_label"),
                  test_img_root=str(roots / "test_img"),
                  crop_size=32, base_size=32, batch_size=2, workers=2,
                  data_backend=backend)


def test_native_val_loader_matches_pil(roots):
    _, val_pil, test_pil, _ = make_data_loader(_cfg(roots, "pil"))
    _, val_nat, test_nat, _ = make_data_loader(_cfg(roots, "native"))
    assert len(val_pil) == len(val_nat)
    for bp, bn in zip(val_pil, val_nat):
        np.testing.assert_array_equal(bp["label"], bn["label"])
        assert np.abs(bp["image"] - bn["image"]).max() < 0.03  # 1 LSB / std
        assert bp["name"] == bn["name"]
    for bp, bn in zip(test_pil, test_nat):
        assert bp["name"] == bn["name"]
        assert (bn["label"] == 255).all()
