"""Feature-adaption (reference train.py) full-train-step parity vs torch.

Mirrors train.py:163-204 exactly: 4 separate modules, task/d/d_inv
optimizers over overlapping param sets, ONE backward of
task + d + d_inv, then three sequential optimizer steps (f gets stepped
twice — by task_optimizer and d_inv_optimizer — with independent momentum
state, the second seeing the task-updated weights).  Dropout disabled both
sides; f32 CPU.
"""

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

from s2r_tpu.config import Config  # noqa: E402
from s2r_tpu.io import torch_import as ti  # noqa: E402
from s2r_tpu.models import layers as L  # noqa: E402
from s2r_tpu.train.setup import build_method  # noqa: E402

pytestmark = pytest.mark.slow  # step-compile / e2e: full tier only

HW, B, LR = 64, 2, 5e-4


def _nchw(a):
    return torch.from_numpy(np.ascontiguousarray(a.transpose(0, 3, 1, 2)))


def _disable_dropout(*mods):
    for mod in mods:
        for m in mod.modules():
            if isinstance(m, tnn.Dropout):
                m.p = 0.0


def _torch_feature_step(bb, aspp, dec, dom, src, lbl, tgt):
    """The reference train.py iteration (train.py:163-204), SGD branch."""
    ce = tnn.CrossEntropyLoss(ignore_index=255, reduction="mean")
    dce = tnn.CrossEntropyLoss(reduction="mean")
    f_params = list(bb.parameters()) + list(aspp.parameters())
    y_params = list(dec.parameters())
    d_params = list(dom.parameters())
    task_opt = torch.optim.SGD(f_params + y_params, lr=LR, momentum=0.9,
                               weight_decay=5e-4)
    d_opt = torch.optim.SGD(d_params, lr=LR, momentum=0.9, weight_decay=5e-4)
    d_inv_opt = torch.optim.SGD(f_params, lr=LR, momentum=0.9,
                                weight_decay=5e-4)
    for m in (bb, aspp, dec, dom):
        m.train()
    task_opt.zero_grad(); d_opt.zero_grad(); d_inv_opt.zero_grad()

    sh0, slow = bb(_nchw(src))
    sfeat = aspp(sh0)
    sout = F.interpolate(dec(sfeat, slow), src.shape[1:3], mode="bilinear",
                         align_corners=True)
    s_d = dom(sfeat)
    task_loss = ce(sout, torch.from_numpy(lbl).long())

    th0, tlow = bb(_nchw(tgt))
    tfeat = aspp(th0)
    F.interpolate(dec(tfeat, tlow), tgt.shape[1:3], mode="bilinear",
                  align_corners=True)
    t_d = dom(tfeat)

    zeros = torch.zeros(s_d.shape[0], s_d.shape[2], s_d.shape[3]).long()
    ones = torch.ones_like(zeros)
    d_loss = dce(s_d, zeros) + dce(t_d, ones)
    d_inv_loss = dce(t_d, zeros) + dce(s_d, ones)
    loss = task_loss + d_loss + d_inv_loss
    loss.backward()
    task_opt.step()
    d_opt.step()
    d_inv_opt.step()
    return {"task_loss": task_loss.item(), "d_loss": d_loss.item(),
            "d_inv_loss": d_inv_loss.item()}


def test_feature_adapt_step_matches_torch(monkeypatch):
    monkeypatch.setattr(L.Dropout, "__call__",
                        lambda self, x, deterministic: x)
    torch.manual_seed(0)
    bb = TorchMNV2(output_stride=16, BatchNorm=tnn.BatchNorm2d,
                   pretrained=False)
    aspp = TorchASPP("mobilenet", 16, tnn.BatchNorm2d)
    dec = TorchDecoder(19, "mobilenet", tnn.BatchNorm2d)
    dom = TorchDomain("mobilenet", tnn.BatchNorm2d)
    _disable_dropout(bb, aspp, dec, dom)

    rng = np.random.RandomState(0)
    src = rng.randn(B, HW, HW, 3).astype(np.float32)
    lbl = rng.randint(0, 19, (B, HW, HW)).astype(np.int64)
    tgt = rng.randn(B, HW, HW, 3).astype(np.float32)

    bp, bs = ti.import_backbone(
        {k: v.clone() for k, v in bb.state_dict().items()}, 16)
    ap, as_ = ti.import_aspp(
        {k: v.clone() for k, v in aspp.state_dict().items()})
    dp, ds = ti.import_decoder(
        {k: v.clone() for k, v in dec.state_dict().items()})
    domp, doms = ti.import_domain(
        {k: v.clone() for k, v in dom.state_dict().items()})
    g_params = {"backbone": bp, "aspp": ap, "decoder": dp}
    g_stats = {"backbone": bs, "aspp": as_, "decoder": ds}

    cfg = Config(crop_size=HW, base_size=HW, batch_size=B, epochs=1,
                 precision="f32", lr=LR, optimizer="SGD")
    m = build_method(cfg, iters_per_epoch=10 ** 9, method="feature_adapt")
    state = m.init_state(jax.random.PRNGKey(0))
    state = state.replace(
        params={"G": jax.tree.map(jnp.asarray, g_params),
                "D": jax.tree.map(jnp.asarray, domp)},
        batch_stats={"G": jax.tree.map(jnp.asarray, g_stats),
                     "D": jax.tree.map(jnp.asarray, doms)})
    batch = {"src_image": jnp.asarray(src),
             "src_label": jnp.asarray(lbl.astype(np.int32)),
             "tgt_image": jnp.asarray(tgt)}
    before = state.params
    new_state, metrics = jax.jit(m.step_fn)(state, batch)

    t_metrics = _torch_feature_step(bb, aspp, dec, dom, src, lbl, tgt)
    for k in ("task_loss", "d_loss", "d_inv_loss"):
        assert np.isclose(float(metrics[k]), t_metrics[k], rtol=1e-3,
                          atol=1e-4), (k, float(metrics[k]), t_metrics[k])

    bp2, _ = ti.import_backbone(bb.state_dict(), 16)
    ap2, _ = ti.import_aspp(aspp.state_dict())
    dp2, _ = ti.import_decoder(dec.state_dict())
    domp2, _ = ti.import_domain(dom.state_dict())
    after_t = {"G": {"backbone": bp2, "aspp": ap2, "decoder": dp2},
               "D": domp2}

    def flat_upd(a, b):
        return jnp.concatenate([
            (x - y).reshape(-1).astype(jnp.float32)
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))])

    # global update agreement (see test_train_step_parity.py for why global
    # + 5%: subgradient selection at exactly-tied activations)
    for part in ("G", "D"):
        upd_o = flat_upd(new_state.params[part], before[part])
        upd_t = flat_upd(jax.tree.map(jnp.asarray, after_t[part]),
                         before[part])
        err = float(jnp.linalg.norm(upd_o - upd_t)
                    / jnp.linalg.norm(upd_t))
        assert err < 0.05, (part, err)
