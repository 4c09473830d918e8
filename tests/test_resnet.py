"""ResNet backbone: shapes, DeepLab composite, train-step smoke, and parity
against an inline torch mirror of the standard DeepLab-ResNet recipe."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2r_tpu.config import Config
from s2r_tpu.models import DeepLab
from s2r_tpu.models.resnet import ResNet
from s2r_tpu.train.setup import build_method

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

pytestmark = pytest.mark.slow  # step-compile / e2e: full tier only


@pytest.mark.parametrize("os_,hw,feat", [(16, 64, 4), (8, 64, 8)])
def test_resnet_shapes(os_, hw, feat):
    m = ResNet(depth="resnet50", output_stride=os_)
    x = jnp.zeros((1, hw, hw, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x, False)
    high, low = m.apply(vars_, x, False)
    assert high.shape == (1, feat, feat, 2048)
    assert low.shape == (1, hw // 4, hw // 4, 256)


def test_deeplab_resnet_composite():
    m = DeepLab(backbone="resnet50", output_stride=16, num_classes=19)
    x = jnp.zeros((1, 65, 65, 3))
    vars_ = m.init({"params": jax.random.PRNGKey(0)}, x, False)
    logits, feat = m.apply(vars_, x, False)
    assert logits.shape == (1, 65, 65, 19)
    assert feat.shape[-1] == 256


def test_resnet_output_adapt_step_runs():
    cfg = Config(backbone="resnet50", crop_size=32, base_size=32,
                 batch_size=2, epochs=1, precision="f32")
    m = build_method(cfg, iters_per_epoch=2, method="output_adapt")
    state = m.init_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batch = {
        "src_image": jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32),
        "src_label": jnp.asarray(rng.randint(0, 19, (2, 32, 32)), jnp.int32),
        "tgt_image": jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32),
    }
    new_state, metrics = jax.jit(m.step_fn)(state, batch)
    assert np.isfinite(float(metrics["seg_loss"]))
    assert int(new_state.step) == 1


# --- torch mirror for wiring parity (stem + one bottleneck stage) ---------

class _TorchBottleneck(tnn.Module):
    def __init__(self, inplanes, planes, stride=1, dilation=1,
                 downsample=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride,
                                padding=dilation, dilation=dilation,
                                bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU()
        self.downsample = None
        if downsample:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inplanes, planes * 4, 1, stride=stride,
                           bias=False),
                tnn.BatchNorm2d(planes * 4))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + idt)


class _TorchStem(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = tnn.Sequential(
            _TorchBottleneck(64, 64, downsample=True),
            _TorchBottleneck(256, 64), _TorchBottleneck(256, 64))

    def forward(self, x):
        return self.layer1(self.maxpool(self.relu(self.bn1(self.conv1(x)))))


def test_resnet_stem_layer1_matches_torch_mirror():
    from s2r_tpu.io.torch_import import import_resnet

    torch.manual_seed(0)
    tm = _TorchStem()
    tm.train()
    x = np.random.RandomState(0).randn(2, 32, 32, 3).astype(np.float32)
    xt = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
    with torch.no_grad():
        tm(xt)  # warm running stats
    tm.eval()
    with torch.no_grad():
        t_out = tm(xt)

    sd = {k: v for k, v in tm.state_dict().items()}
    full = ResNet(depth="resnet50", output_stride=16)
    vars_ = full.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 32, 32, 3)), False)
    # partial import: stem + layer1 keys only (the mirror stops at layer1;
    # import_resnet's layer1 mapping is exactly this loop — see
    # s2r_tpu/io/torch_import.py::import_resnet)
    from s2r_tpu.io.torch_import import _TreeBuilder
    b = _TreeBuilder()
    b.conv(sd, "conv1", ("conv1",))
    b.bn(sd, "bn1", ("bn1",))
    for bi in range(3):
        tk = f"layer1.{bi}"
        name = f"layer1_{bi}"
        for sub in ("conv1", "conv2", "conv3"):
            b.conv(sd, f"{tk}.{sub}", (name, sub))
        for sub in ("bn1", "bn2", "bn3"):
            b.bn(sd, f"{tk}.{sub}", (name, sub))
        if f"{tk}.downsample.0.weight" in sd:
            b.conv(sd, f"{tk}.downsample.0", (name, "downsample_conv"))
            b.bn(sd, f"{tk}.downsample.1", (name, "downsample_bn"))
    merged_p = {**vars_["params"], **jax.tree.map(jnp.asarray, b.params)}
    merged_s = {**vars_["batch_stats"], **jax.tree.map(jnp.asarray, b.stats)}
    _, low = full.apply({"params": merged_p, "batch_stats": merged_s},
                        jnp.asarray(x), False)
    np.testing.assert_allclose(
        np.asarray(low), t_out.detach().numpy().transpose(0, 2, 3, 1),
        rtol=1e-3, atol=1e-3)
