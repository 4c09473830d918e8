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
                           adv_softmax_mode: str = "batch"):
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

    def step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        if not fused:
            fused["G"] = FusedOptimizer(
                g_opt, state.params["G"],
                lr_mult_tree(state.params["G"],
                             {"backbone": 1.0, "aspp": 10.0, "decoder": 10.0}))
            fused["D"] = FusedOptimizer(d_opt, state.params["D"])
        lr = lr_fn(state.step)
        rng, r_src, r_tgt = jax.random.split(state.rng, 3)

        def g_loss(params_g, bstats, params_d):
            v = {"params": params_g, "batch_stats": bstats}
            (src_logits, _), upd = deeplab.apply(
                v, batch["src_image"], True, mutable=["batch_stats"],
                rngs={"dropout": r_src})
            l_seg = seg_loss_fn(src_logits, batch["src_label"])
            v2 = {"params": params_g, "batch_stats": upd["batch_stats"]}
            (tgt_logits, _), upd2 = deeplab.apply(
                v2, batch["tgt_image"], True, mutable=["batch_stats"],
                rngs={"dropout": r_tgt})
            d_out = discriminator.apply(
                {"params": params_d},
                _adv_softmax(tgt_logits, adv_softmax_mode))
            l_adv = bce_with_logits(d_out, SOURCE_LABEL)
            aux = (upd2["batch_stats"], src_logits, tgt_logits, l_seg, l_adv)
            return l_seg + l_adv, aux

        (_, aux), grads_g = jax.value_and_grad(g_loss, has_aux=True)(
            state.params["G"], state.batch_stats, state.params["D"])
        new_bstats, src_logits, tgt_logits, l_seg, l_adv = aux

        def d_loss(params_d):
            sp = _adv_softmax(jax.lax.stop_gradient(src_logits),
                              adv_softmax_mode)
            tp = _adv_softmax(jax.lax.stop_gradient(tgt_logits),
                              adv_softmax_mode)
            l_src = bce_with_logits(
                discriminator.apply({"params": params_d}, sp), SOURCE_LABEL)
            l_tgt = bce_with_logits(
                discriminator.apply({"params": params_d}, tp), TARGET_LABEL)
            return l_src + l_tgt

        l_d, grads_d = jax.value_and_grad(d_loss)(state.params["D"])

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
                            source_only: bool = False):
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

        def loss_fn(params):
            bs_g, bs_d = state.batch_stats["G"], state.batch_stats["D"]
            (src_out, src_feat), updg = deeplab.apply(
                {"params": params["G"], "batch_stats": bs_g},
                batch[src_key], True, mutable=["batch_stats"],
                rngs={"dropout": r1})
            task = seg_loss_fn(src_out, batch[lbl_key])
            if source_only:
                new_bs = {"G": updg["batch_stats"], "D": bs_d}
                zero = jnp.zeros((), jnp.float32)
                return task, (new_bs, task, zero, zero, zero)

            src_d, updd = domain_cls.apply(
                {"params": params["D"], "batch_stats": bs_d},
                src_feat, True, mutable=["batch_stats"],
                rngs={"dropout": r2})
            (tgt_out, tgt_feat), updg2 = deeplab.apply(
                {"params": params["G"], "batch_stats": updg["batch_stats"]},
                batch["tgt_image"], True, mutable=["batch_stats"],
                rngs={"dropout": r3})
            tgt_d, updd2 = domain_cls.apply(
                {"params": params["D"], "batch_stats": updd["batch_stats"]},
                tgt_feat, True, mutable=["batch_stats"],
                rngs={"dropout": r4})
            d_l, d_acc = domain_loss(src_d, tgt_d)
            d_inv_l, _ = domain_loss(tgt_d, src_d)
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
