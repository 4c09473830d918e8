"""torch interop for the xception / drn backbones.

The reference's backbone factory promises 'xception' and 'drn'
(modeling/backbone/__init__.py:4-9) but ships no modules — selecting them
crashes — so no torch ground truth or pretrained checkpoint exists.  The
interop contract is therefore DEFINED here: torch_export.{export_xception,
export_drn} emit the canonical torch schema (the natural nn.Module mirror
of models/{xception,drn}.py), torch_import.{import_xception,import_drn}
consume it, and this file pins the contract three ways:

1. forward parity against real torch nn.Modules implementing the same
   published recipes with the schema's key names (random weights, warmed
   running stats) — validates conv/BN/padding semantics, not just naming;
2. export -> import round-trips to identity;
3. --backbone-init end-to-end through the Trainer.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from s2r_tpu.io import torch_export as te
from s2r_tpu.io import torch_import as ti
from s2r_tpu.models.drn import DRN, LAYERS_D54
from s2r_tpu.models.xception import AlignedXception

pytestmark = pytest.mark.slow  # step-compile / e2e: full tier only

TOL = dict(rtol=1e-3, atol=1e-3)


def _nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def _nchw(a):
    return torch.from_numpy(np.ascontiguousarray(a.transpose(0, 3, 1, 2)))


def _warm_bn(model, x):
    model.train()
    with torch.no_grad():
        model(x)
    model.eval()


# ---------------------------------------------------------------------------
# torch mirrors (the schema's reference implementation)

class TSep(tnn.Module):
    """SeparableConv mirror: conv1 (depthwise) -> bn -> pointwise
    (models/xception.py:37-54)."""

    def __init__(self, inp, out, stride=1, dilation=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(inp, inp, 3, stride, padding=dilation,
                                dilation=dilation, groups=inp, bias=False)
        self.bn = tnn.BatchNorm2d(inp)
        self.pointwise = tnn.Conv2d(inp, out, 1, bias=False)

    def forward(self, x):
        return self.pointwise(self.bn(self.conv1(x)))


class TBlock(tnn.Module):
    """XceptionBlock mirror (models/xception.py:57-89): reps separable
    convs (stride on the last), residual skip conv+bn when shape changes."""

    def __init__(self, inp, planes, reps, stride=1, dilation=1,
                 start_with_relu=True, grow_first=True):
        super().__init__()
        self.reps = reps
        self.start_with_relu = start_with_relu
        widths = [planes] * reps if grow_first \
            else [inp] * (reps - 1) + [planes]
        c = inp
        for r, w in enumerate(widths, 1):
            setattr(self, f"sep{r}",
                    TSep(c, w, stride=stride if r == reps else 1,
                         dilation=dilation))
            setattr(self, f"bn{r}", tnn.BatchNorm2d(w))
            c = w
        if stride != 1 or inp != planes:
            self.skip = tnn.Conv2d(inp, planes, 1, stride=stride, bias=False)
            self.skipbn = tnn.BatchNorm2d(planes)
        else:
            self.skip = None

    def forward(self, x):
        y = x
        for r in range(1, self.reps + 1):
            if r > 1 or self.start_with_relu:
                y = torch.relu(y)
            y = getattr(self, f"sep{r}")(y)
            y = getattr(self, f"bn{r}")(y)
        sc = self.skipbn(self.skip(x)) if self.skip is not None else x
        return y + sc


class TXception(tnn.Module):
    """AlignedXception mirror (models/xception.py:92-137)."""

    def __init__(self, output_stride=16):
        super().__init__()
        if output_stride == 16:
            entry3, mid, exit_dil = 2, 1, (1, 2)
        else:
            entry3, mid, exit_dil = 1, 2, (2, 4)
        self.conv1 = tnn.Conv2d(3, 32, 3, 2, padding=1, bias=False)
        self.bn1 = tnn.BatchNorm2d(32)
        self.conv2 = tnn.Conv2d(32, 64, 3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(64)
        self.block1 = TBlock(64, 128, 2, stride=2, start_with_relu=False)
        self.block2 = TBlock(128, 256, 2, stride=2)
        self.block3 = TBlock(256, 728, 2, stride=entry3)
        for i in range(16):
            setattr(self, f"block{i + 4}",
                    TBlock(728, 728, 3, dilation=mid))
        self.block20 = TBlock(728, 1024, 2, dilation=exit_dil[0],
                              grow_first=False)
        self.conv3 = TSep(1024, 1536, dilation=exit_dil[1])
        self.bn3 = tnn.BatchNorm2d(1536)
        self.conv4 = TSep(1536, 1536, dilation=exit_dil[1])
        self.bn4 = tnn.BatchNorm2d(1536)
        self.conv5 = TSep(1536, 2048, dilation=exit_dil[1])
        self.bn5 = tnn.BatchNorm2d(2048)

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = torch.relu(self.bn2(self.conv2(x)))
        x = self.block1(x)
        low = torch.relu(x)
        for k in range(2, 21):
            x = getattr(self, f"block{k}")(x)
        x = torch.relu(x)
        x = torch.relu(self.bn3(self.conv3(x)))
        x = torch.relu(self.bn4(self.conv4(x)))
        x = torch.relu(self.bn5(self.conv5(x)))
        return x, low


class TConvStack(tnn.Module):
    """ConvStack mirror (models/drn.py:37-56)."""

    def __init__(self, inp, feat, reps, stride=1, dilation=1):
        super().__init__()
        self.reps = reps
        c = inp
        for r in range(1, reps + 1):
            setattr(self, f"conv{r}",
                    tnn.Conv2d(c, feat, 3, stride if r == 1 else 1,
                               padding=dilation, dilation=dilation,
                               bias=False))
            setattr(self, f"bn{r}", tnn.BatchNorm2d(feat))
            c = feat

    def forward(self, x):
        for r in range(1, self.reps + 1):
            x = torch.relu(getattr(self, f"bn{r}")(
                getattr(self, f"conv{r}")(x)))
        return x


class TBottleneck(tnn.Module):
    """Bottleneck mirror (models/resnet.py:46-72, torchvision layout)."""

    def __init__(self, inp, planes, stride=1, dilation=1, down=False):
        super().__init__()
        out = planes * 4
        self.conv1 = tnn.Conv2d(inp, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, padding=dilation,
                                dilation=dilation, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, out, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(out)
        self.downsample = tnn.Sequential(
            tnn.Conv2d(inp, out, 1, stride=stride, bias=False),
            tnn.BatchNorm2d(out)) if down else None

    def forward(self, x):
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        sc = self.downsample(x) if self.downsample is not None else x
        return torch.relu(y + sc)


class TResLevel(tnn.Module):
    def __init__(self, inp, planes, n, stride, dilation):
        super().__init__()
        self.n = n
        c = inp
        for b in range(1, n + 1):
            first = b == 1
            down = first and (stride != 1 or c != planes * 4)
            setattr(self, f"block{b}",
                    TBottleneck(c, planes, stride if first else 1,
                                dilation, down))
            c = planes * 4

    def forward(self, x):
        for b in range(1, self.n + 1):
            x = getattr(self, f"block{b}")(x)
        return x


class TDRN(tnn.Module):
    """DRN-D-54 mirror (models/drn.py:59-94)."""

    def __init__(self):
        super().__init__()
        reps = LAYERS_D54
        self.level1 = TConvStack(3, 16, reps[0])
        self.level2 = TConvStack(16, 32, reps[1], stride=2)
        self.level3 = TResLevel(32, 64, reps[2], 2, 1)
        self.level4 = TResLevel(256, 128, reps[3], 2, 1)
        self.level5 = TResLevel(512, 256, reps[4], 1, 2)
        self.level6 = TResLevel(1024, 512, reps[5], 1, 4)
        self.level7 = TConvStack(2048, 512, reps[6], dilation=2)
        self.level8 = TConvStack(512, 512, reps[7], dilation=1)

    def forward(self, x):
        x = self.level2(self.level1(x))
        x = self.level3(x)
        low = x
        x = self.level6(self.level5(self.level4(x)))
        return self.level8(self.level7(x)), low


# ---------------------------------------------------------------------------

@pytest.mark.parametrize("os_", [16, 8])
def test_xception_torch_parity(os_):
    torch.manual_seed(10)
    tm = TXception(output_stride=os_)
    x = np.random.RandomState(1).randn(1, 65, 65, 3).astype(np.float32)
    _warm_bn(tm, _nchw(x))
    with torch.no_grad():
        t_high, t_low = tm(_nchw(x))

    params, stats = ti.import_xception(tm.state_dict())
    m = AlignedXception(output_stride=os_)
    high, low = m.apply({"params": params, "batch_stats": stats},
                        jnp.asarray(x), False)
    np.testing.assert_allclose(np.asarray(low), _nhwc(t_low), **TOL)
    np.testing.assert_allclose(np.asarray(high), _nhwc(t_high), **TOL)


def test_drn_torch_parity():
    torch.manual_seed(11)
    tm = TDRN()
    x = np.random.RandomState(2).randn(1, 64, 64, 3).astype(np.float32)
    _warm_bn(tm, _nchw(x))
    with torch.no_grad():
        t_high, t_low = tm(_nchw(x))

    params, stats = ti.import_drn(tm.state_dict())
    m = DRN()
    high, low = m.apply({"params": params, "batch_stats": stats},
                        jnp.asarray(x), False)
    np.testing.assert_allclose(np.asarray(low), _nhwc(t_low), **TOL)
    np.testing.assert_allclose(np.asarray(high), _nhwc(t_high), **TOL)


def _roundtrip(export_fn, import_fn, params, stats):
    sd = export_fn(params, stats)
    p2, s2 = import_fn(sd)
    for tree, tree2 in ((params, p2), (stats, s2)):
        a = {str(k): v for k, v
             in jax.tree_util.tree_flatten_with_path(tree)[0]}
        b = {str(k): v for k, v
             in jax.tree_util.tree_flatten_with_path(tree2)[0]}
        assert set(a) == set(b), set(a) ^ set(b)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k], np.float32),
                                          np.asarray(b[k], np.float32),
                                          err_msg=k)


def test_xception_roundtrip():
    m = AlignedXception(output_stride=16)
    v = jax.jit(lambda: m.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 65, 65, 3), jnp.float32), True))()
    _roundtrip(te.export_xception, ti.import_xception,
               jax.tree.map(np.asarray, v["params"]),
               jax.tree.map(np.asarray, v["batch_stats"]))


def test_drn_roundtrip():
    m = DRN()
    v = jax.jit(lambda: m.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 64, 64, 3), jnp.float32), True))()
    _roundtrip(te.export_drn, ti.import_drn,
               jax.tree.map(np.asarray, v["params"]),
               jax.tree.map(np.asarray, v["batch_stats"]))


def test_backbone_init_xception_trainer(tmp_path):
    """--backbone-init end-to-end: torch xception weights land in the
    Trainer state (matches the reference's pretrained-load flow,
    train_adapt.py --resume/mobilenet pretrained path)."""
    from s2r_tpu.config import Config
    from s2r_tpu.train.trainer import Trainer

    torch.manual_seed(12)
    tm = TXception(output_stride=16)
    pth = str(tmp_path / "xcept.pth")
    torch.save(tm.state_dict(), pth)

    cfg = Config(dataset="synthetic", backbone="xception", crop_size=64,
                 base_size=64, batch_size=2, epochs=1, workers=0,
                 precision="f32", run_root=str(tmp_path / "run"),
                 backbone_init=pth)
    t = Trainer(cfg, method="output_adapt")
    got = np.asarray(jax.tree.leaves(
        t.state.params["G"]["backbone"]["conv1"])[0])
    want = np.transpose(tm.conv1.weight.detach().numpy(), (2, 3, 1, 0))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
