"""End-to-end Trainer tests on synthetic data (tiny shapes, CPU)."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2r_tpu.config import Config
from s2r_tpu.train.trainer import Trainer, pick_num_devices

pytestmark = pytest.mark.slow  # step-compile / e2e: full tier only


def _cfg(tmp_path, **kw):
    base = dict(dataset="synthetic", crop_size=32, base_size=32, batch_size=2,
                epochs=1, workers=2, precision="f32",
                run_root=str(tmp_path / "run"))
    base.update(kw)
    return Config(**base)


def test_pick_num_devices():
    assert pick_num_devices(8, None) == 8
    assert pick_num_devices(6, None) == 6  # 6 % 6 == 0
    assert pick_num_devices(7, None) == 7
    assert pick_num_devices(4, 2) == 2
    assert pick_num_devices(3, 2) == 1


def test_trainer_end_to_end(tmp_path):
    t = Trainer(_cfg(tmp_path), method="output_adapt")
    means = t.training(0)
    assert np.isfinite(means["seg_loss"])
    miou = t.validation(0)
    assert 0.0 <= miou <= 1.0
    t.saver.wait()  # validation() submits the save; fit() joins, we must
    ckpt = os.path.join(t.saver.experiment_dir, "checkpoint.ckpt")
    assert os.path.exists(ckpt)

    # resume (ft=True: params only) and re-validate -> identical mIoU
    t2 = Trainer(_cfg(tmp_path, resume=ckpt), method="output_adapt")
    miou2 = t2.validation(0)
    assert np.isclose(miou, miou2, atol=1e-6)


def test_trainer_backbone_init(tmp_path):
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    from modeling.backbone.mobilenet import MobileNetV2 as TorchMNV2
    import torch.nn as tnn

    torch.manual_seed(0)
    tm = TorchMNV2(output_stride=16, BatchNorm=tnn.BatchNorm2d,
                   pretrained=False)
    path = str(tmp_path / "mobilenet_pre.pth")
    torch.save(tm.state_dict(), path)

    t = Trainer(_cfg(tmp_path, backbone_init=path), method="output_adapt")
    got = t.state.params["G"]["backbone"]["features_0_conv"]["kernel"]
    want = np.transpose(tm.state_dict()["features.0.0.weight"].numpy(),
                        (2, 3, 1, 0))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)
