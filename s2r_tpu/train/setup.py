"""Method assembly: build models, optimizers, initial TrainState and the
(unjitted) step function for each training method.

Mirrors the Trainer.__init__ wiring of the reference drivers
(train.py:27-150, train_adapt.py:30-113) minus host-side concerns (data,
saver, summaries), which live in s2r_tpu.train.trainer.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from s2r_tpu.config import Config
from s2r_tpu.core.precision import Policy
from s2r_tpu.models import DeepLab, DomainClassifier, FCDiscriminator
from s2r_tpu.train.losses import build_seg_loss
from s2r_tpu.train.lr_schedule import make_lr_schedule
from s2r_tpu.train.optim import SGD, Adam, FusedOptimizer, make_optimizer
from s2r_tpu.train.state import TrainState
from s2r_tpu.train.steps import (make_eval_step, make_feature_adapt_step,
                                 make_output_adapt_step)


@dataclasses.dataclass
class Method:
    """A fully-wired training method."""
    name: str
    deeplab: DeepLab
    step_fn: Callable          # (TrainState, batch) -> (TrainState, metrics)
    eval_step: Callable        # (params, batch_stats, image, label) -> ...
    init_state: Callable       # (rng) -> TrainState
    aux_model: Optional[Any] = None  # discriminator / domain classifier

    def eval_variables(self, state: TrainState):
        """(params, batch_stats) of the segmenter for eval/inference."""
        if self.name == "output_adapt":
            return state.params["G"], state.batch_stats
        return state.params["G"], state.batch_stats["G"]


def _init_model(model, rng, *args, **kwargs):
    return jax.jit(
        lambda: model.init({"params": rng}, *args, **kwargs)
    )()


def _step_pad_to(cfg: Config, n_devices: int) -> Optional[int]:
    """Padded global batch for the train step (see Config.batch_pad):
    per-chip batch rounded up to a multiple of 8, or None when already
    aligned / padding disabled / not a TPU backend (under 'auto')."""
    if cfg.batch_pad == "off":
        return None
    if cfg.batch_pad == "auto" and jax.default_backend() != "tpu":
        return None
    per_chip = -(-cfg.batch_size // n_devices)
    padded = -(-per_chip // 8) * 8 * n_devices
    return padded if padded > cfg.batch_size else None


def build_method(cfg: Config, iters_per_epoch: int,
                 class_weights: Optional[jnp.ndarray] = None,
                 method: Optional[str] = None,
                 n_devices: int = 1) -> Method:
    """method: 'output_adapt' (train_adapt.py), 'feature_adapt' (train.py),
    'source_only' (train.py --dataset gtav).  If None, inferred from cfg.
    n_devices: mesh size the step will run under (for batch-pad rounding)."""
    if method is None:
        method = "source_only" if cfg.dataset == "gtav" else "feature_adapt"
    pad_to = _step_pad_to(cfg, n_devices)
    policy = Policy.from_name(cfg.precision)
    dtype = policy.compute_dtype
    seg_loss_fn = build_seg_loss(cfg.loss_type, class_weights)
    lr_fn = make_lr_schedule(cfg.lr_scheduler, cfg.lr, cfg.epochs,
                             iters_per_epoch, cfg.lr_step, cfg.warmup_epochs)
    deeplab = DeepLab(backbone=cfg.backbone, output_stride=cfg.out_stride,
                      num_classes=cfg.num_classes, freeze_bn=cfg.freeze_bn,
                      dtype=dtype, remat=cfg.remat, pad_stats=cfg.pad_stats,
                      logits_dtype=(jnp.bfloat16
                                    if getattr(cfg, "logits_dtype", "f32")
                                    == "bf16" else None),
                      split_concat=getattr(cfg, "split_concat", False))
    # Eval always consumes f32 logits: --logits-dtype bf16 is a TRAIN-step
    # bandwidth mode; validation/test numerics stay reference-exact.
    eval_deeplab = (deeplab.clone(logits_dtype=None)
                    if deeplab.logits_dtype is not None else deeplab)
    eval_step = make_eval_step(eval_deeplab, seg_loss_fn, cfg.num_classes)
    sample = jnp.zeros((1, cfg.crop_size, cfg.crop_size, 3), jnp.float32)

    if method == "output_adapt":
        discr = FCDiscriminator(num_classes=cfg.num_classes, dtype=dtype)
        # train_adapt.py:58-60: G = SGD(momentum, wd, nesterov), D = Adam
        # with betas (0.9, 0.99); the shared scheduler overrides both LRs.
        g_opt = SGD(momentum=cfg.momentum, weight_decay=cfg.weight_decay,
                    nesterov=cfg.nesterov)
        d_opt = Adam(b1=0.9, b2=0.99)
        step_fn = make_output_adapt_step(deeplab, discr, g_opt, d_opt, lr_fn,
                                         seg_loss_fn, cfg.adv_softmax_axis,
                                         pad_to=pad_to)

        def init_state(rng):
            rng, kg, kd, ks = jax.random.split(rng, 4)
            vg = _init_model(deeplab, kg, sample, False)
            vd = _init_model(discr, kd,
                             jnp.zeros((1, cfg.crop_size, cfg.crop_size,
                                        cfg.num_classes), jnp.float32))
            params = {"G": vg["params"], "D": vd["params"]}
            opt_state = {
                "G": FusedOptimizer(g_opt, params["G"]).init(params["G"]),
                "D": FusedOptimizer(d_opt, params["D"]).init(params["D"]),
            }
            return TrainState.create(params, vg["batch_stats"], opt_state, ks)

        return Method("output_adapt", deeplab, step_fn, eval_step, init_state,
                      aux_model=discr)

    # feature_adapt / source_only (train.py:47-82)
    domain = DomainClassifier(backbone=cfg.backbone, dtype=dtype)
    opt = make_optimizer(cfg.optimizer, cfg.momentum, cfg.weight_decay,
                         cfg.nesterov)
    step_fn = make_feature_adapt_step(deeplab, domain, opt, opt, opt, lr_fn,
                                      seg_loss_fn,
                                      source_only=(method == "source_only"),
                                      pad_to=pad_to)

    def init_state(rng):
        rng, kg, kd, ks = jax.random.split(rng, 4)
        vg = _init_model(deeplab, kg, sample, False)
        feat_hw = cfg.crop_size // cfg.out_stride
        vd = _init_model(domain, kd,
                         jnp.zeros((1, feat_hw, feat_hw, 256), jnp.float32),
                         False)
        params = {"G": vg["params"], "D": vd["params"]}
        f = {"backbone": params["G"]["backbone"], "aspp": params["G"]["aspp"]}
        # four optimizer states over overlapping param sets (train.py:63-82);
        # 'c' is allocated but never stepped (checkpoint parity).
        opt_state = {"task": FusedOptimizer(opt, params["G"]).init(params["G"]),
                     "d": FusedOptimizer(opt, params["D"]).init(params["D"]),
                     "d_inv": FusedOptimizer(opt, f).init(f),
                     "c": FusedOptimizer(opt, params["G"]).init(params["G"])}
        batch_stats = {"G": vg["batch_stats"], "D": vd["batch_stats"]}
        return TrainState.create(params, batch_stats, opt_state, ks)

    return Method(method, deeplab, step_fn, eval_step, init_state,
                  aux_model=domain)
