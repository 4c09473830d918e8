"""End-to-end `--dataset gtav` (source-only) CLI path on disk fixtures."""

import numpy as np
import pytest
from PIL import Image

from s2r_tpu.cli import train as train_cli
from s2r_tpu.cli import val as val_cli

pytestmark = pytest.mark.slow  # step-compile / e2e: full tier only


@pytest.fixture
def gtav_roots(tmp_path):
    rng = np.random.RandomState(0)
    (tmp_path / "img").mkdir()
    (tmp_path / "lbl").mkdir()
    for i in range(10):
        Image.fromarray(rng.randint(0, 255, (40, 60, 3), dtype=np.uint8)) \
            .save(tmp_path / "img" / f"{i:03d}.png")
        Image.fromarray(rng.randint(0, 35, (40, 60), dtype=np.uint8)) \
            .save(tmp_path / "lbl" / f"{i:03d}.png")
    return tmp_path


def test_train_and_val_gtav(gtav_roots, tmp_path):
    args = ["--dataset", "gtav",
            "--src_img_root", str(gtav_roots / "img"),
            "--src_label_root", str(gtav_roots / "lbl"),
            "--crop-size", "32", "--base-size", "32", "--batch-size", "2",
            "--workers", "2", "--epochs", "1", "--precision", "f32",
            "--run-root", str(tmp_path / "run")]
    trainer = train_cli.main(args)
    assert trainer.method.name == "source_only"
    import os
    ckpt = os.path.join(trainer.saver.experiment_dir, "checkpoint.ckpt")
    assert os.path.exists(ckpt)

    miou, iou = val_cli.main(args + ["--resume", ckpt, "--skip-sep",
                                     "--out-dir", str(tmp_path / "valout")])
    assert np.isfinite(miou)
    assert len(iou) == 19
