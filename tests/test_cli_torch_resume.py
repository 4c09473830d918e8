"""End-to-end: a reference-format torch checkpoint resumes through the val
CLI (both schemas), producing finite metrics and exported predictions."""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

sys.path.insert(0, "/root/reference")
from modeling.backbone.mobilenet import MobileNetV2 as TorchMNV2  # noqa: E402
from modeling.assp import ASPP as TorchASPP  # noqa: E402
from modeling.decoder import Decoder as TorchDecoder  # noqa: E402
from modeling.domian import DomainClassifer as TorchDomain  # noqa: E402

from s2r_tpu.cli import export as export_cli  # noqa: E402
from s2r_tpu.cli import val as val_cli  # noqa: E402
from s2r_tpu.cli import val_adapt as val_adapt_cli  # noqa: E402

pytestmark = pytest.mark.slow  # step-compile / e2e: full tier only


def _composite_state_dict():
    torch.manual_seed(0)
    tb = TorchMNV2(output_stride=16, BatchNorm=tnn.BatchNorm2d,
                   pretrained=False)
    ta = TorchASPP("mobilenet", 16, tnn.BatchNorm2d)
    td = TorchDecoder(19, "mobilenet", tnn.BatchNorm2d)
    sd = {}
    sd.update({f"backbone.{k}": v for k, v in tb.state_dict().items()})
    sd.update({f"aspp.{k}": v for k, v in ta.state_dict().items()})
    sd.update({f"decoder.{k}": v for k, v in td.state_dict().items()})
    return sd, tb, ta, td


def test_val_adapt_resumes_single_schema_checkpoint(tmp_path):
    sd, *_ = _composite_state_dict()
    ckpt = str(tmp_path / "ref_single.pth.tar")
    torch.save({"state_dict": sd, "epoch": 7, "best_pred": 0.3,
                "optimizer": {}}, ckpt)
    out = str(tmp_path / "out")
    miou, iou = val_adapt_cli.main([
        "--dataset", "synthetic", "--crop-size", "32", "--base-size", "32",
        "--batch-size", "2", "--workers", "2", "--resume", ckpt,
        "--out-dir", out, "--run-root", str(tmp_path / "run"),
        "--precision", "f32", "--skip-sep"])
    assert np.isfinite(miou)
    assert os.path.exists(os.path.join(out, "val_info.txt"))


def test_cli_export_carries_epoch_and_best_pred(tmp_path):
    """cli.export must propagate the source checkpoint's epoch/best_pred
    into the torch schema (regression: it hardcoded epoch=0 because the
    resume default --ft zeroes start_epoch)."""
    sd, *_ = _composite_state_dict()
    src = str(tmp_path / "ref_single.pth.tar")
    torch.save({"state_dict": sd, "epoch": 7, "best_pred": 0.31,
                "optimizer": {}}, src)
    out = str(tmp_path / "exported.pth.tar")
    export_cli.main(["--resume", src, "--out", out,
                     "--method", "output_adapt", "--precision", "f32"])
    ck = torch.load(out, map_location="cpu", weights_only=False)
    assert ck["epoch"] == 7
    assert abs(ck["best_pred"] - 0.31) < 1e-9


def test_val_resumes_four_schema_checkpoint(tmp_path):
    sd, tb, ta, td = _composite_state_dict()
    tdom = TorchDomain("mobilenet", tnn.BatchNorm2d)
    ckpt = str(tmp_path / "ref_four.pth.tar")
    torch.save({
        "backbone_model_state_dict": tb.state_dict(),
        "assp_model_state_dict": ta.state_dict(),
        "y_model_state_dict": td.state_dict(),
        "d_model_state_dict": tdom.state_dict(),
        "epoch": 3, "best_pred": 0.2,
    }, ckpt)
    out = str(tmp_path / "out")
    miou, iou = val_cli.main([
        "--dataset", "synthetic", "--crop-size", "32", "--base-size", "32",
        "--batch-size", "2", "--workers", "2", "--resume", ckpt,
        "--out-dir", out, "--run-root", str(tmp_path / "run"),
        "--precision", "f32", "--skip-sep"])
    assert np.isfinite(miou)
    assert len(iou) == 19
