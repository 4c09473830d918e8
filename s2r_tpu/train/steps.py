"""Jitted SPMD train/eval steps for the three training methods.

Each reference training iteration — a Python loop over host-synchronized
forwards, backwards, optimizer mutations and sync-BN rendezvous
(train.py:163-211, train_adapt.py:126-181) — collapses here into ONE jitted
function: all forwards/backwards for both networks, BatchNorm statistics,
adversarial partitioning, LR schedule and optimizer updates are traced
together and compiled by XLA.  Under a batch-sharded mesh the same function
is the multi-chip program; gradient and BN reductions ride ICI.

Adversarial gradient partitioning: the reference toggles requires_grad and
calls .detach() (train_adapt.py:140-176).  Functionally, 'train G with D
frozen' is differentiating the G-loss w.r.t. G params only (D params enter as
constants), and 'train D on detached outputs' is stop_gradient on the
segmenter logits — jax.grad expresses both exactly.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from s2r_tpu.models.layers import bn_real_batch
from s2r_tpu.train.losses import bce_with_logits, domain_loss
from s2r_tpu.train.optim import FusedOptimizer, lr_mult_tree
from s2r_tpu.train.state import TrainState

SOURCE_LABEL = 0.0  # train_adapt.py:117
TARGET_LABEL = 1.0  # train_adapt.py:118


def _adv_softmax(logits: jnp.ndarray, mode: str) -> jnp.ndarray:
    """Softmax feeding the output-space discriminator.

    mode='batch' reproduces the reference's F.softmax(output, dim=0) over the
    batch axis (train_adapt.py:151,166,174 — SURVEY.md §2.6); mode='class' is
    the AdaptSegNet-correct per-pixel class softmax.
    """
    axis = 0 if mode == "batch" else -1
    return jax.nn.softmax(logits, axis=axis)


# --------------------------------------------------------------------------
# Output-space adaption (reference train_adapt.py:115-209)
# --------------------------------------------------------------------------

def make_output_adapt_step(deeplab, discriminator, g_opt, d_opt,
                           lr_fn: Callable, seg_loss_fn: Callable,
                           adv_softmax_mode: str = "batch",
                           pad_to: int = None):
    """G/D alternating update as a single step.

    G: seg CE on source + BCE(D(softmax(tgt)), source_label) with D frozen
       (train_adapt.py:137-155), SGD with 1x (backbone) / 10x (aspp+decoder)
       LR groups (train_adapt.py:54-59).
    D: BCE(D(softmax(detached src)), 0) + BCE(D(softmax(detached tgt)), 1)
       (train_adapt.py:157-178), Adam(0.9, 0.99); the shared LR scheduler
       overrides Adam's constructor LR with poly(base_lr) each iteration
       (train_adapt.py:133 + lr_scheduler.py:63-70) — reproduced here.
    """
    fused: Dict[str, FusedOptimizer] = {}  # built lazily from tree structure

    sg = jax.lax.stop_gradient

    def step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        if not fused:
            fused["G"] = FusedOptimizer(
                g_opt, state.params["G"],
                lr_mult_tree(state.params["G"],
                             {"backbone": 1.0, "aspp": 10.0, "decoder": 10.0}))
            fused["D"] = FusedOptimizer(d_opt, state.params["D"])
        lr = lr_fn(state.step)
        rng, r_src, r_tgt = jax.random.split(state.rng, 3)

        # One joint loss over (G, D) with stop_gradient partitioning instead
        # of two separate value_and_grad calls: 'train G with D frozen' is
        # sg(params_d) on the adversarial term; 'train D on detached
        # outputs' is sg on the softmax inputs.  Gradients are identical to
        # the two-backward formulation (cross terms vanish under sg), but
        # the tgt discriminator *forward* — value-identical in both terms —
        # is computed once and shared by XLA instead of twice.
        # Batch padding: XLA's TPU layouts put N in the 8-wide sublane dim,
        # so a batch that is not a multiple of 8 costs up to 2.6x throughput
        # (CLAUDE.md measurements).  With pad_to = N > k input samples, the
        # step zero-pads the images up to N and masks the k..N-1 dummies out
        # of every cross-sample quantity: BN statistics (bn_real_batch),
        # the CE loss (ignore_index labels), the batch-axis adversarial
        # softmax (the reference's dim=0 quirk runs over real rows only),
        # and the discriminator means (outputs sliced before reduction).
        n_in = batch["src_image"].shape[0]
        k = n_in if (pad_to is not None and pad_to > n_in) else None
        n_total = pad_to if k is not None else n_in

        def _bpad(x, fill=0):
            pad = [(0, n_total - n_in)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, pad, constant_values=fill)

        def _real(x):
            return x if k is None else x[:k]

        def _repad(x):
            if k is None:
                return x
            pad = [(0, n_total - k)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, pad)

        src_label = batch["src_label"]
        src_image, tgt_image = batch["src_image"], batch["tgt_image"]
        if k is not None:
            src_image, tgt_image = _bpad(src_image), _bpad(tgt_image)
            src_label = _bpad(src_label, fill=255)

        def joint_loss(params):
            params_g, params_d = params["G"], params["D"]
            with bn_real_batch(k):
                v = {"params": params_g, "batch_stats": state.batch_stats}
                (src_logits, _), upd = deeplab.apply(
                    v, src_image, True, mutable=["batch_stats"],
                    rngs={"dropout": r_src})
                v2 = {"params": params_g, "batch_stats": upd["batch_stats"]}
                (tgt_logits, _), upd2 = deeplab.apply(
                    v2, tgt_image, True, mutable=["batch_stats"],
                    rngs={"dropout": r_tgt})
            l_seg = seg_loss_fn(src_logits, src_label)
            tp = _repad(_adv_softmax(_real(tgt_logits), adv_softmax_mode))
            sp = _repad(_adv_softmax(_real(sg(src_logits)),
                                     adv_softmax_mode))
            # G adversarial term: D params constant (train_adapt.py:140-155)
            l_adv = bce_with_logits(
                _real(discriminator.apply({"params": sg(params_d)}, tp)),
                SOURCE_LABEL)
            # D terms: inputs detached (train_adapt.py:157-178)
            l_dsrc = bce_with_logits(
                _real(discriminator.apply({"params": params_d}, sp)),
                SOURCE_LABEL)
            l_dtgt = bce_with_logits(
                _real(discriminator.apply({"params": params_d}, sg(tp))),
                TARGET_LABEL)
            total = l_seg + l_adv + l_dsrc + l_dtgt
            return total, (upd2["batch_stats"], l_seg, l_adv,
                           l_dsrc + l_dtgt)

        (_, aux), grads = jax.value_and_grad(joint_loss, has_aux=True)(
            state.params)
        new_bstats, l_seg, l_adv, l_d = aux
        grads_g, grads_d = grads["G"], grads["D"]

        params_g, g_state = fused["G"].apply(grads_g, state.opt_state["G"],
                                             state.params["G"], lr)
        params_d, d_state = fused["D"].apply(grads_d, state.opt_state["D"],
                                             state.params["D"], lr)

        new_state = state.replace(
            step=state.step + 1,
            params={"G": params_g, "D": params_d},
            batch_stats=new_bstats,
            opt_state={"G": g_state, "D": d_state},
            rng=rng)
        metrics = {"seg_loss": l_seg, "adv_loss": l_adv, "d_loss": l_d,
                   "lr": lr}
        return new_state, metrics

    return step


# --------------------------------------------------------------------------
# Feature-space adaption and source-only (reference train.py:152-253)
# --------------------------------------------------------------------------

def make_feature_adapt_step(deeplab, domain_cls, task_opt, d_opt, d_inv_opt,
                            lr_fn: Callable, seg_loss_fn: Callable,
                            source_only: bool = False,
                            pad_to: int = None):
    """Summed-loss adversarial update with three optimizer steps from one
    backward (train.py:181-211).

    loss = task + d + d_inv, ONE gradient; then sequentially:
      task_opt steps f+y (f = backbone+aspp, y = decoder),
      d_opt steps the domain classifier,
      d_inv_opt steps f AGAIN with the same gradient (its own momentum state,
      weight decay seen on the task-updated params — torch step order).
    `source_only` covers the `--dataset gtav` branch (train.py:205-211):
    loss = task only, only task_opt steps.
    """

    def split_fy(tree):
        return ({"backbone": tree["backbone"], "aspp": tree["aspp"]},
                {"decoder": tree["decoder"]})

    fused: Dict[str, FusedOptimizer] = {}

    def step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        if not fused:
            f0, _ = split_fy(state.params["G"])
            fused["task"] = FusedOptimizer(task_opt, state.params["G"])
            fused["d"] = FusedOptimizer(d_opt, state.params["D"])
            fused["d_inv"] = FusedOptimizer(d_inv_opt, f0)
        lr = lr_fn(state.step)
        rng, r1, r2, r3, r4 = jax.random.split(state.rng, 5)
        src_key = "image" if source_only else "src_image"
        lbl_key = "label" if source_only else "src_label"

        # Batch padding (see make_output_adapt_step): images are zero-padded
        # to pad_to inside the step; pad samples are masked out of BN stats,
        # CE (ignore_index label) and the domain means.
        n_in = batch[src_key].shape[0]
        k = n_in if (pad_to is not None and pad_to > n_in) else None
        n_total = pad_to if k is not None else n_in

        def _bpad(x, fill=0):
            pad = [(0, n_total - n_in)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, pad, constant_values=fill)

        src_image, src_label = batch[src_key], batch[lbl_key]
        tgt_image = None if source_only else batch["tgt_image"]
        if k is not None:
            src_image = _bpad(src_image)
            src_label = _bpad(src_label, fill=255)
            if tgt_image is not None:
                tgt_image = _bpad(tgt_image)

        def _real(x):
            return x if k is None else x[:k]

        def loss_fn(params):
            bs_g, bs_d = state.batch_stats["G"], state.batch_stats["D"]
            with bn_real_batch(k):
                (src_out, src_feat), updg = deeplab.apply(
                    {"params": params["G"], "batch_stats": bs_g},
                    src_image, True, mutable=["batch_stats"],
                    rngs={"dropout": r1})
            task = seg_loss_fn(src_out, src_label)
            if source_only:
                new_bs = {"G": updg["batch_stats"], "D": bs_d}
                zero = jnp.zeros((), jnp.float32)
                return task, (new_bs, task, zero, zero, zero)

            with bn_real_batch(k):
                src_d, updd = domain_cls.apply(
                    {"params": params["D"], "batch_stats": bs_d},
                    src_feat, True, mutable=["batch_stats"],
                    rngs={"dropout": r2})
                (tgt_out, tgt_feat), updg2 = deeplab.apply(
                    {"params": params["G"],
                     "batch_stats": updg["batch_stats"]},
                    tgt_image, True, mutable=["batch_stats"],
                    rngs={"dropout": r3})
                tgt_d, updd2 = domain_cls.apply(
                    {"params": params["D"], "batch_stats": updd["batch_stats"]},
                    tgt_feat, True, mutable=["batch_stats"],
                    rngs={"dropout": r4})
            d_l, d_acc = domain_loss(_real(src_d), _real(tgt_d))
            d_inv_l, _ = domain_loss(_real(tgt_d), _real(src_d))
            loss = task + d_l + d_inv_l
            new_bs = {"G": updg2["batch_stats"], "D": updd2["batch_stats"]}
            return loss, (new_bs, task, d_l, d_inv_l, d_acc)

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        new_bs, task_l, d_l, d_inv_l, d_acc = aux

        # --- task_opt over f+y (train.py:202) ---
        params_g, task_state = fused["task"].apply(
            grads["G"], state.opt_state["task"], state.params["G"], lr)

        if source_only:
            new_params = {"G": params_g, "D": state.params["D"]}
            new_opt = {**state.opt_state, "task": task_state}
        else:
            # --- d_opt over the domain classifier (train.py:203) ---
            params_d, d_state = fused["d"].apply(
                grads["D"], state.opt_state["d"], state.params["D"], lr)
            # --- d_inv_opt over f, same gradient, torch step order
            #     (weight decay sees task-updated f) (train.py:204) ---
            grads_f, _ = split_fy(grads["G"])
            params_f, params_y = split_fy(params_g)
            params_f, d_inv_state = fused["d_inv"].apply(
                grads_f, state.opt_state["d_inv"], params_f, lr)
            params_g = {**params_f, **params_y}
            new_params = {"G": params_g, "D": params_d}
            new_opt = {"task": task_state, "d": d_state,
                       "d_inv": d_inv_state, "c": state.opt_state["c"]}

        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_bs, opt_state=new_opt,
                                  rng=rng)
        metrics = {"task_loss": task_l, "d_loss": d_l, "d_inv_loss": d_inv_l,
                   "d_acc": d_acc, "lr": lr}
        return new_state, metrics

    return step


# --------------------------------------------------------------------------
# Validation step (reference train_adapt.py:211-229 / train.py:255-279)
# --------------------------------------------------------------------------

def make_eval_step(deeplab, seg_loss_fn: Callable, num_classes: int):
    """Eval-mode forward + loss + fused argmax/confusion-matrix update.

    Only two scalars and a [C, C] matrix leave the device per batch — the
    reference transfers the full logit tensor to host for numpy argmax
    (train_adapt.py:225-227)."""

    def eval_step(params, batch_stats, image, label):
        logits, _ = deeplab.apply(
            {"params": params, "batch_stats": batch_stats}, image, False)
        loss = seg_loss_fn(logits, label)
        pred = jnp.argmax(logits, axis=-1)
        from s2r_tpu.eval.metrics import confusion_matrix
        cm = confusion_matrix(label, pred, num_classes)
        return loss, cm, pred

    return eval_step
