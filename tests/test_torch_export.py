"""Export round-trip: our weights -> reference torch checkpoint -> the
ACTUAL reference modules (strict load_state_dict) -> logits match ours."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

sys.path.insert(0, "/root/reference")
from modeling.backbone.mobilenet import MobileNetV2 as TorchMNV2  # noqa: E402
from modeling.assp import ASPP as TorchASPP  # noqa: E402
from modeling.decoder import Decoder as TorchDecoder  # noqa: E402
from modeling.domian import DomainClassifer as TorchDomain  # noqa: E402

from s2r_tpu.io import torch_export as te  # noqa: E402
from s2r_tpu.io import torch_import as ti  # noqa: E402
from s2r_tpu.models import DeepLab  # noqa: E402

pytestmark = pytest.mark.slow  # step-compile / e2e: full tier only


def _our_model_and_vars():
    model = DeepLab(output_stride=16, num_classes=19)
    x = jnp.zeros((1, 65, 65, 3))
    vars_ = model.init({"params": jax.random.PRNGKey(42)}, x, False)
    return model, vars_


def test_roundtrip_import_export(tmp_path):
    model, vars_ = _our_model_and_vars()
    sd = te.export_deeplab(vars_["params"], vars_["batch_stats"])
    p2, s2 = ti.import_deeplab(sd)
    for a, b in zip(jax.tree.leaves(vars_["params"]), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(vars_["batch_stats"]),
                    jax.tree.leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("backbone", ["resnet50", "xception", "drn"])
def test_roundtrip_other_backbones(tmp_path, backbone):
    """Full export -> .pth.tar -> import cycle for the non-mobilenet
    factory backbones (cli.export --backbone <name> parity; the reference
    ships modules for none of these, so torch_export defines the schema
    and torch_import is pinned as its exact inverse)."""
    model = DeepLab(backbone=backbone, output_stride=16, num_classes=19)
    x = jnp.zeros((1, 65, 65, 3))
    vars_ = jax.jit(lambda: model.init({"params": jax.random.PRNGKey(7)},
                                       x, False))()
    path = str(tmp_path / "ckpt.pth.tar")
    te.save_reference_checkpoint(path, vars_["params"], vars_["batch_stats"],
                                 epoch=3, best_pred=0.2, schema="single",
                                 backbone=backbone)
    imported = ti.import_reference_checkpoint(path, output_stride=16,
                                              backbone=backbone)
    assert imported["epoch"] == 3
    p2, s2 = imported["G"]
    for tree, tree2 in ((vars_["params"], p2), (vars_["batch_stats"], s2)):
        a = {str(k): v for k, v
             in jax.tree_util.tree_flatten_with_path(tree)[0]}
        b = {str(k): v for k, v
             in jax.tree_util.tree_flatten_with_path(tree2)[0]}
        assert set(a) == set(b), sorted(set(a) ^ set(b))[:5]
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k], np.float32),
                                          np.asarray(b[k], np.float32),
                                          err_msg=k)


def test_exported_checkpoint_runs_in_reference_modules(tmp_path):
    model, vars_ = _our_model_and_vars()
    path = str(tmp_path / "exported.pth.tar")
    te.save_reference_checkpoint(path, vars_["params"], vars_["batch_stats"],
                                 epoch=5, best_pred=0.4, schema="single")
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    assert ckpt["epoch"] == 5 and ckpt["best_pred"] == 0.4

    # strict load into the real reference modules
    tb = TorchMNV2(output_stride=16, BatchNorm=tnn.BatchNorm2d,
                   pretrained=False)
    ta = TorchASPP("mobilenet", 16, tnn.BatchNorm2d)
    td = TorchDecoder(19, "mobilenet", tnn.BatchNorm2d)
    sd = ckpt["state_dict"]
    tb.load_state_dict({k[len("backbone."):]: v for k, v in sd.items()
                        if k.startswith("backbone.")}, strict=True)
    ta.load_state_dict({k[len("aspp."):]: v for k, v in sd.items()
                        if k.startswith("aspp.")}, strict=True)
    td.load_state_dict({k[len("decoder."):]: v for k, v in sd.items()
                        if k.startswith("decoder.")}, strict=True)
    for m in (tb, ta, td):
        m.eval()

    x = np.random.RandomState(0).randn(1, 65, 65, 3).astype(np.float32)
    with torch.no_grad():
        xt = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
        h, low = tb(xt)
        f = ta(h)
        t_logits = F.interpolate(td(f, low), size=(65, 65), mode="bilinear",
                                 align_corners=True)
    ours, _ = model.apply(vars_, jnp.asarray(x), False)
    np.testing.assert_allclose(np.asarray(ours),
                               t_logits.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-3, atol=1e-3)


def test_four_schema_export_reimports(tmp_path):
    model, vars_ = _our_model_and_vars()
    torch.manual_seed(0)
    dom = TorchDomain("mobilenet", tnn.BatchNorm2d)
    domp, doms = ti.import_domain(dom.state_dict())
    path = str(tmp_path / "exported4.pth.tar")
    te.save_reference_checkpoint(path, vars_["params"], vars_["batch_stats"],
                                 schema="four", domain=(domp, doms))
    imported = ti.import_reference_checkpoint(path)
    assert imported["schema"] == "four"
    (gp, gs), d = imported["G"], imported["D"]
    for a, b in zip(jax.tree.leaves(vars_["params"]), jax.tree.leaves(gp)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # domain round-trips too
    dp2, _ = d
    for a, b in zip(jax.tree.leaves(domp), jax.tree.leaves(dp2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
