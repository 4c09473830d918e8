"""torch optimizer-state import (--ft false resume parity).

The reference restores optimizer state dicts on resume unless --ft
(train.py:138-142, train_adapt.py:105-106).  These tests prove a resumed
run continues the torch optimizer trajectory exactly: we feed torch and our
fused optimizers IDENTICAL synthetic gradients (isolating state import +
update math from autodiff drift), step torch once to populate state, import
that state via the torch_import order mapping, step both sides again, and
require the parameters to match to float32 precision.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

sys.path.insert(0, "/root/reference")
from modeling.domian import DomainClassifer as TorchDomain  # noqa: E402

from s2r_tpu.io import torch_import as ti  # noqa: E402
from s2r_tpu.train.optim import SGD, Adam, FusedOptimizer  # noqa: E402

pytestmark = pytest.mark.slow  # step-compile / e2e: full tier only

LR = 5e-4


def _synthetic_grads(model: tnn.Module, seed: int):
    """One deterministic gradient array per parameter, in
    named_parameters() order (== optimizer param-id order for a
    single-group optimizer)."""
    rng = np.random.RandomState(seed)
    return [rng.randn(*p.shape).astype(np.float32)
            for p in model.parameters()]


def _assign_grads(model: tnn.Module, grads):
    for p, g in zip(model.parameters(), grads):
        p.grad = torch.from_numpy(g.copy())


def _our_grads_tree(params_template, order, grads):
    """Place the torch-ordered gradient arrays at our tree paths (conv
    weights transposed OIHW->HWIO, same as the params importer)."""
    tree = ti.jax_tree_zeros(params_template)
    for (path, is_conv), g in zip(order, grads):
        ti._set_tree(tree, path,
                     ti._conv_w(g) if is_conv else g.astype(np.float32))
    return tree


def _domain_setup(opt_factory, seed=0):
    torch.manual_seed(seed)
    model = TorchDomain("mobilenet", tnn.BatchNorm2d)
    opt = opt_factory(model.parameters())
    # step 1: populates optimizer state
    _assign_grads(model, _synthetic_grads(model, 1))
    opt.step()
    sd1 = {k: v.clone() for k, v in model.state_dict().items()}
    # state_dict() returns live tensor references — snapshot before step 2
    # (torch.save in real checkpoints serializes immediately)
    import copy

    opt_sd = copy.deepcopy(opt.state_dict())
    # step 2: the trajectory a resumed run must reproduce
    g2 = _synthetic_grads(model, 2)
    _assign_grads(model, g2)
    opt.step()
    sd2 = {k: v.clone() for k, v in model.state_dict().items()}
    return sd1, opt_sd, g2, sd2


def _check_continuation(opt_factory, ours_opt):
    sd1, opt_sd, g2, sd2 = _domain_setup(opt_factory)
    order = []
    params1, _ = ti.import_domain(sd1, order_sink=order)
    imp = ti.import_optimizer_state(opt_sd, order, params1)
    assert imp["kind"] in ("sgd", "adam")

    params1_j = jax.tree.map(jnp.asarray, params1)
    fused = FusedOptimizer(ours_opt, params1_j)
    template = {"d": fused.init(params1_j)}
    merged = ti.merge_torch_opt_state({"d": imp}, {"D": params1_j}, template)
    # imported state must differ from fresh init (it was actually restored)
    changed = any(
        float(jnp.abs(a - b).max()) > 0
        for a, b in zip(jax.tree.leaves(merged["d"]),
                        jax.tree.leaves(template["d"])))
    assert changed

    grads = _our_grads_tree(params1, order, g2)
    new_params, _ = fused.apply(jax.tree.map(jnp.asarray, grads),
                                merged["d"], params1_j, LR)

    params2, _ = ti.import_domain(sd2)
    for (path, ours), want in zip(
            jax.tree_util.tree_leaves_with_path(new_params),
            jax.tree.leaves(jax.tree.map(jnp.asarray, params2))):
        np.testing.assert_allclose(np.asarray(ours), np.asarray(want),
                                   rtol=1e-6, atol=1e-7, err_msg=str(path))


def test_sgd_momentum_continuation():
    _check_continuation(
        lambda ps: torch.optim.SGD(ps, lr=LR, momentum=0.9,
                                   weight_decay=5e-4),
        SGD(momentum=0.9, weight_decay=5e-4))


def test_adam_continuation():
    _check_continuation(
        lambda ps: torch.optim.Adam(ps, lr=LR),
        Adam(b1=0.9, b2=0.999))


def test_single_schema_checkpoint_with_lr_groups(tmp_path):
    """Full path: reference train_adapt checkpoint (state_dict + optimizer
    with 1x/10x param groups) -> import_reference_checkpoint ->
    merge_torch_opt_state -> one fused SGD step matches torch's next step."""
    from modeling.assp import ASPP as TorchASPP
    from modeling.backbone.mobilenet import MobileNetV2 as TorchMNV2
    from modeling.decoder import Decoder as TorchDecoder

    from s2r_tpu.train.optim import lr_mult_tree

    torch.manual_seed(0)
    tb = TorchMNV2(output_stride=16, BatchNorm=tnn.BatchNorm2d,
                   pretrained=False)
    ta = TorchASPP("mobilenet", 16, tnn.BatchNorm2d)
    td = TorchDecoder(19, "mobilenet", tnn.BatchNorm2d)
    # the reference's construction order: 1x group = backbone, 10x = aspp +
    # decoder (train_adapt.py:54-58)
    groups = [{"params": list(tb.parameters()), "lr": LR},
              {"params": list(ta.parameters()) + list(td.parameters()),
               "lr": LR * 10}]
    opt = torch.optim.SGD(groups, lr=LR, momentum=0.9, weight_decay=5e-4)
    all_params = groups[0]["params"] + groups[1]["params"]
    rng = np.random.RandomState(3)
    g1 = [rng.randn(*p.shape).astype(np.float32) for p in all_params]
    g2 = [rng.randn(*p.shape).astype(np.float32) for p in all_params]
    for p, g in zip(all_params, g1):
        p.grad = torch.from_numpy(g.copy())
    opt.step()

    def composite_sd():
        sd = {}
        sd.update({f"backbone.{k}": v.clone()
                   for k, v in tb.state_dict().items()})
        sd.update({f"aspp.{k}": v.clone()
                   for k, v in ta.state_dict().items()})
        sd.update({f"decoder.{k}": v.clone()
                   for k, v in td.state_dict().items()})
        return sd

    ckpt_path = str(tmp_path / "ckpt.pth.tar")
    torch.save({"state_dict": composite_sd(), "epoch": 4, "best_pred": 0.1,
                "optimizer": opt.state_dict()}, ckpt_path)

    for p, g in zip(all_params, g2):
        p.grad = torch.from_numpy(g.copy())
    opt.step()
    sd2 = composite_sd()

    imported = ti.import_reference_checkpoint(ckpt_path, output_stride=16)
    assert imported["schema"] == "single"
    assert imported["opt"]["G"]["kind"] == "sgd"
    params1, _ = imported["G"]
    params1_j = jax.tree.map(jnp.asarray, params1)
    mult = lr_mult_tree(params1_j,
                        {"backbone": 1.0, "aspp": 10.0, "decoder": 10.0})
    fused = FusedOptimizer(SGD(momentum=0.9, weight_decay=5e-4), params1_j,
                           lr_mult=mult)
    template = {"G": fused.init(params1_j)}
    merged = ti.merge_torch_opt_state(imported["opt"], {"G": params1_j},
                                      template)

    # rebuild the torch param-id order to place g2 into our tree
    order = []
    sd1 = {k: v for k, v in torch.load(ckpt_path,
                                       weights_only=False)["state_dict"].items()}
    ti.import_backbone(sd1, 16, prefix="backbone.", order_sink=order,
                       path_prefix=("backbone",))
    ti.import_aspp(sd1, prefix="aspp.", order_sink=order,
                   path_prefix=("aspp",))
    ti.import_decoder(sd1, prefix="decoder.", order_sink=order,
                      path_prefix=("decoder",))
    grads = _our_grads_tree(params1, order, g2)
    new_params, _ = fused.apply(jax.tree.map(jnp.asarray, grads),
                                merged["G"], params1_j, LR)

    params2, _ = ti.import_deeplab(sd2, output_stride=16)
    for (path, ours), want in zip(
            jax.tree_util.tree_leaves_with_path(new_params),
            jax.tree.leaves(jax.tree.map(jnp.asarray, params2))):
        np.testing.assert_allclose(np.asarray(ours), np.asarray(want),
                                   rtol=1e-5, atol=1e-6, err_msg=str(path))
