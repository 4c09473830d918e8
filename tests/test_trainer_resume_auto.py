import os

import numpy as np

from s2r_tpu.config import Config
from s2r_tpu.train.trainer import Trainer

import pytest

pytestmark = pytest.mark.slow  # step-compile / e2e: full tier only


def _cfg(tmp_path, **kw):
    base = dict(dataset="synthetic", crop_size=32, base_size=32, batch_size=2,
                epochs=1, workers=2, precision="f32",
                run_root=str(tmp_path / "run"))
    base.update(kw)
    return Config(**base)


def test_resume_auto_fresh_start(tmp_path):
    t = Trainer(_cfg(tmp_path, resume="auto"), method="output_adapt")
    assert t.start_epoch == 0  # no checkpoint -> fresh


def test_resume_auto_picks_latest(tmp_path):
    t = Trainer(_cfg(tmp_path), method="output_adapt")
    t.training(0)
    miou = t.validation(0)
    t.saver.wait()  # direct validation() call: join before reading files
    ckpt = os.path.join(t.saver.experiment_dir, "checkpoint.ckpt")
    assert os.path.exists(ckpt)

    t2 = Trainer(_cfg(tmp_path, resume="auto"), method="output_adapt")
    miou2 = t2.validation(0)
    assert np.isclose(miou, miou2, atol=1e-6)
