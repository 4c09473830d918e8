"""Eval-mode logit parity against the actual reference implementation.

Builds each reference torch module (from /root/reference, CPU, random init),
perturbs its BatchNorm running stats with a train-mode forward so the stats
are non-trivial, exports its state_dict, imports it through
s2r_tpu.io.torch_import, and compares eval-mode outputs on the same input.
This validates convs, padding, dilation, BN eval semantics, align-corners
resizes and the importer in one shot (BASELINE config 1 path).
"""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

sys.path.insert(0, "/root/reference")

from modeling.backbone.mobilenet import MobileNetV2 as TorchMobileNetV2  # noqa: E402
from modeling.assp import ASPP as TorchASPP  # noqa: E402
from modeling.decoder import Decoder as TorchDecoder  # noqa: E402
from modeling.discriminator import FCDiscriminator as TorchFCD  # noqa: E402
from modeling.domian import DomainClassifer as TorchDomain  # noqa: E402

from s2r_tpu.io import torch_import as ti  # noqa: E402
from s2r_tpu.models import (ASPP, Decoder, DeepLab, DomainClassifier,  # noqa: E402
                            FCDiscriminator, MobileNetV2)

TOL = dict(rtol=1e-3, atol=1e-3)


def _nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def _nchw(a):
    return torch.from_numpy(np.ascontiguousarray(a.transpose(0, 3, 1, 2)))


def _warm_bn(model, *xs):
    """One train-mode forward so running stats move off (0, 1)."""
    model.train()
    with torch.no_grad():
        model(*xs)
    model.eval()


@pytest.mark.parametrize("os_", [16, 8])
def test_mobilenet_parity(os_):
    torch.manual_seed(0)
    tm = TorchMobileNetV2(output_stride=os_, BatchNorm=tnn.BatchNorm2d,
                          pretrained=False)
    x = np.random.RandomState(0).randn(2, 129, 129, 3).astype(np.float32)
    _warm_bn(tm, _nchw(x))
    with torch.no_grad():
        t_high, t_low = tm(_nchw(x))

    params, stats = ti.import_backbone(tm.state_dict(), output_stride=os_)
    m = MobileNetV2(output_stride=os_)
    high, low = m.apply({"params": params, "batch_stats": stats},
                        jnp.asarray(x), False)
    np.testing.assert_allclose(np.asarray(low), _nhwc(t_low), **TOL)
    np.testing.assert_allclose(np.asarray(high), _nhwc(t_high), **TOL)


def test_aspp_parity():
    torch.manual_seed(1)
    tm = TorchASPP("mobilenet", 16, tnn.BatchNorm2d)
    x = np.random.RandomState(1).randn(2, 9, 9, 320).astype(np.float32)
    _warm_bn(tm, _nchw(x))
    with torch.no_grad():
        t_out = tm(_nchw(x))
    params, stats = ti.import_aspp(tm.state_dict())
    m = ASPP(output_stride=16)
    out = m.apply({"params": params, "batch_stats": stats}, jnp.asarray(x),
                  False)
    np.testing.assert_allclose(np.asarray(out), _nhwc(t_out), **TOL)


def test_decoder_parity():
    torch.manual_seed(2)
    tm = TorchDecoder(19, "mobilenet", tnn.BatchNorm2d)
    rng = np.random.RandomState(2)
    x = rng.randn(1, 9, 9, 256).astype(np.float32)
    low = rng.randn(1, 33, 33, 24).astype(np.float32)
    _warm_bn(tm, _nchw(x), _nchw(low))
    with torch.no_grad():
        t_out = tm(_nchw(x), _nchw(low))
    params, stats = ti.import_decoder(tm.state_dict())
    m = Decoder(num_classes=19)
    out = m.apply({"params": params, "batch_stats": stats}, jnp.asarray(x),
                  jnp.asarray(low), False)
    np.testing.assert_allclose(np.asarray(out), _nhwc(t_out), **TOL)


def test_domain_parity():
    torch.manual_seed(3)
    tm = TorchDomain("mobilenet", tnn.BatchNorm2d)
    x = np.random.RandomState(3).randn(2, 9, 9, 256).astype(np.float32)
    _warm_bn(tm, _nchw(x))
    with torch.no_grad():
        t_out = tm(_nchw(x))
    params, stats = ti.import_domain(tm.state_dict())
    m = DomainClassifier()
    out = m.apply({"params": params, "batch_stats": stats}, jnp.asarray(x),
                  False)
    np.testing.assert_allclose(np.asarray(out), _nhwc(t_out), **TOL)


def test_discriminator_parity():
    torch.manual_seed(4)
    tm = TorchFCD(19)
    tm.eval()
    x = np.random.RandomState(4).randn(1, 64, 64, 19).astype(np.float32)
    with torch.no_grad():
        t_out = tm(_nchw(x))
    params, _ = ti.import_discriminator(tm.state_dict())
    m = FCDiscriminator(num_classes=19)
    out = m.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), _nhwc(t_out), **TOL)


def test_deeplab_composite_parity():
    """Full pipeline: backbone -> aspp -> decoder -> align-corners upsample,
    assembled exactly as DeepLab.forward (deeplab.py:27-33) / the train.py
    trunk (train.py:182-185)."""
    torch.manual_seed(5)
    tb = TorchMobileNetV2(output_stride=16, BatchNorm=tnn.BatchNorm2d,
                          pretrained=False)
    ta = TorchASPP("mobilenet", 16, tnn.BatchNorm2d)
    td = TorchDecoder(19, "mobilenet", tnn.BatchNorm2d)
    x = np.random.RandomState(5).randn(1, 129, 129, 3).astype(np.float32)
    tx = _nchw(x)

    # warm the running stats with batch 2 (batch-1 train-mode BN is illegal
    # on the ASPP GAP branch: one value per channel)
    warm = _nchw(np.random.RandomState(6).randn(2, 129, 129, 3)
                 .astype(np.float32))
    for m_ in (tb, ta, td):
        m_.train()
    with torch.no_grad():
        h, l = tb(warm)
        f = ta(h)
        td(f, l)
    for m_ in (tb, ta, td):
        m_.eval()
    with torch.no_grad():
        h, l = tb(tx)
        f = ta(h)
        y = td(f, l)
        t_logits = F.interpolate(y, size=tx.size()[2:], mode="bilinear",
                                 align_corners=True)

    sd = {}
    sd.update({f"backbone.{k}": v for k, v in tb.state_dict().items()})
    sd.update({f"aspp.{k}": v for k, v in ta.state_dict().items()})
    sd.update({f"decoder.{k}": v for k, v in td.state_dict().items()})
    params, stats = ti.import_deeplab(sd, output_stride=16)

    model = DeepLab(output_stride=16, num_classes=19)
    logits, feat = model.apply({"params": params, "batch_stats": stats},
                               jnp.asarray(x), False)
    np.testing.assert_allclose(np.asarray(feat), _nhwc(f), **TOL)
    np.testing.assert_allclose(np.asarray(logits), _nhwc(t_logits), **TOL)
