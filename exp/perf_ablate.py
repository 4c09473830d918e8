"""Perf ablation harness for the output-adapt step (run on the real TPU).

Times the full step plus component ablations so optimization targets are
measured, not guessed.  Usage:
    PYTHONPATH=/root/repo:$PYTHONPATH python exp/perf_ablate.py [names...]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_prng_impl", "rbg")
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from s2r_tpu.config import Config
from s2r_tpu.train.setup import build_method

H, W = 512, 1024


def make_batch(batch):
    rng = np.random.RandomState(0)
    return {
        "src_image": jnp.asarray(rng.randn(batch, H, W, 3), jnp.float32),
        "src_label": jnp.asarray(rng.randint(0, 19, (batch, H, W)), jnp.int32),
        "tgt_image": jnp.asarray(rng.randn(batch, H, W, 3), jnp.float32),
    }


def time_step(name, step, state, batch, iters=10, donate=True):
    if donate:
        # copy so the caller's state survives donation (arms share one
        # baseline state when several run in one process)
        state = jax.jit(lambda s: jax.tree.map(jnp.copy, s))(state)
    step = jax.jit(step, donate_argnums=0 if donate else ())
    t0 = time.perf_counter()
    state2, _ = step(state, batch)
    jax.block_until_ready(state2.params)
    compile_s = time.perf_counter() - t0
    # warmup (donated: keep threading new state)
    for _ in range(2):
        state2, _ = step(state2, batch)
    jax.block_until_ready(state2.params)
    t0 = time.perf_counter()
    for _ in range(iters):
        state2, _ = step(state2, batch)
    jax.block_until_ready(state2.params)
    dt = (time.perf_counter() - t0) / iters
    b = batch["src_image"].shape[0]
    print(f"{name:28s} {dt * 1e3:8.2f} ms  {b / dt:7.2f} img/s "
          f"(compile {compile_s:.0f}s)", flush=True)
    return dt


def build(batch=8):
    cfg = Config(crop_size=H, base_size=H, batch_size=batch, epochs=200,
                 precision="bf16")
    m = build_method(cfg, iters_per_epoch=1000, method="output_adapt")
    state = m.init_state(jax.random.PRNGKey(0))
    return m, state


def main():
    names = set(sys.argv[1:]) or {"full8", "full16", "segonly"}
    m, state = build(8)
    batch = make_batch(8)

    if "full8" in names:
        time_step("full step b8", m.step_fn, state, batch)

    if "logits_bf16" in names:
        # Config.logits_dtype='bf16' arm: full-res logits (and every
        # downstream full-res 19-ch tensor: softmax maps, D input + its
        # layout copies, CE input, gradients) at half width.  Opt-in,
        # non-parity; state/params structure is unchanged so the baseline
        # state is reused.
        cfg_b = Config(crop_size=H, base_size=H, batch_size=8, epochs=200,
                       precision="bf16", logits_dtype="bf16")
        m_b = build_method(cfg_b, iters_per_epoch=1000,
                           method="output_adapt")
        time_step("logits bf16 b8", m_b.step_fn, state, batch)

    if "split_concat" in names:
        # Config.split_concat arm: ASPP 1280-ch + decoder 304-ch concat
        # convs as split-kernel sums (no materialized concat; GAP branch
        # contribution computed at [N,1,1,C]).  Param tree unchanged, so
        # the baseline state is reused.
        cfg_s = Config(crop_size=H, base_size=H, batch_size=8, epochs=200,
                       precision="bf16", split_concat=True)
        m_s = build_method(cfg_s, iters_per_epoch=1000,
                           method="output_adapt")
        time_step("split concat b8", m_s.step_fn, state, batch)

    if "feature8" in names or "feature_split" in names:
        # feature-adapt step arms (3-optimizer joint-loss update); the
        # split_concat arm reuses the baseline feature state (same tree).
        cfg_f = Config(crop_size=H, base_size=H, batch_size=8, epochs=200,
                       precision="bf16")
        m_f = build_method(cfg_f, iters_per_epoch=1000,
                           method="feature_adapt")
        state_f = m_f.init_state(jax.random.PRNGKey(0))
        if "feature8" in names:
            time_step("feature step b8", m_f.step_fn, state_f, batch)
        if "feature_split" in names:
            m_fs = build_method(
                Config(crop_size=H, base_size=H, batch_size=8, epochs=200,
                       precision="bf16", split_concat=True),
                iters_per_epoch=1000, method="feature_adapt")
            time_step("feature split b8", m_fs.step_fn, state_f, batch)

    if "segonly" in names:
        from s2r_tpu.train.losses import cross_entropy
        deeplab = m.deeplab

        def seg_step(state, b):
            def loss(pg, bs):
                v = {"params": pg, "batch_stats": bs}
                (logits, _), upd = deeplab.apply(
                    v, b["src_image"], True, mutable=["batch_stats"],
                    rngs={"dropout": jax.random.PRNGKey(1)})
                return cross_entropy(logits, b["src_label"]), upd
            (l, upd), g = jax.value_and_grad(loss, has_aux=True)(
                state.params["G"], state.batch_stats)
            # SGD-ish update to keep buffers comparable
            pg = jax.tree.map(lambda p, gr: p - 1e-4 * gr,
                              state.params["G"], g)
            ns = state.replace(params={**state.params, "G": pg},
                               batch_stats=upd["batch_stats"])
            return ns, {"l": l}
        time_step("seg-only fwd+bwd b8", seg_step, state, batch)

    if "two_fwd" in names:
        deeplab = m.deeplab
        from s2r_tpu.train.losses import cross_entropy

        def two_fwd_step(state, b):
            def loss(pg, bs):
                v = {"params": pg, "batch_stats": bs}
                (sl, _), upd = deeplab.apply(
                    v, b["src_image"], True, mutable=["batch_stats"],
                    rngs={"dropout": jax.random.PRNGKey(1)})
                v2 = {"params": pg, "batch_stats": upd["batch_stats"]}
                (tl, _), upd2 = deeplab.apply(
                    v2, b["tgt_image"], True, mutable=["batch_stats"],
                    rngs={"dropout": jax.random.PRNGKey(2)})
                return (cross_entropy(sl, b["src_label"])
                        + jnp.mean(tl.astype(jnp.float32)) * 0.001), upd2
            (l, upd), g = jax.value_and_grad(loss, has_aux=True)(
                state.params["G"], state.batch_stats)
            pg = jax.tree.map(lambda p, gr: p - 1e-4 * gr,
                              state.params["G"], g)
            ns = state.replace(params={**state.params, "G": pg},
                               batch_stats=upd["batch_stats"])
            return ns, {"l": l}
        time_step("src+tgt fwd+bwd b8", two_fwd_step, state, batch)

    if "full16" in names:
        m16, state16 = build(16)
        time_step("full step b16", m16.step_fn, state16, make_batch(16),
                  iters=6)

    if "two_grad" in names:
        # PARITY §Performance A/B arm: the pre-joint formulation — separate
        # value_and_grad calls for G and D (duplicating the tgt D forward)
        # instead of one joint loss with stop_gradient partitioning.
        time_step("two-grad G/D b8", make_two_grad_step(m), state, batch)

    if "maskdrop" in names:
        # A/B arm: dropout with the forward mask SAVED for backward (the
        # default autodiff formulation) vs the shipped RNG-recompute vjp.
        from s2r_tpu.models import layers as L
        L.DROPOUT_SAVE_MASK = True
        try:
            m2, state2 = build(8)
            time_step("saved-mask dropout b8", m2.step_fn, state2, batch)
        finally:
            L.DROPOUT_SAVE_MASK = False

    if "pallas_d1" in names:
        # VERDICT r2 item 7 arm: discriminator conv1 as the Pallas W-minor
        # kernel (ops/pallas/disc_conv.py) — consumes the softmax side's
        # layout, skipping the 19->128 lane-pad relayouts the device
        # profile itemizes.  Exact conv semantics, same param shapes.
        from s2r_tpu.models import FCDiscriminator
        from s2r_tpu.train.lr_schedule import make_lr_schedule
        from s2r_tpu.train.losses import build_seg_loss
        from s2r_tpu.train.optim import SGD, Adam
        from s2r_tpu.train.steps import make_output_adapt_step

        cfg = Config(crop_size=H, base_size=H, batch_size=8, epochs=200,
                     precision="bf16")
        discr = FCDiscriminator(num_classes=19, dtype=jnp.bfloat16,
                                pallas_wminor_conv1=True)
        step = make_output_adapt_step(
            m.deeplab, discr,
            SGD(momentum=cfg.momentum, weight_decay=cfg.weight_decay,
                nesterov=cfg.nesterov), Adam(b1=0.9, b2=0.99),
            make_lr_schedule(cfg.lr_scheduler, cfg.lr, cfg.epochs, 1000),
            build_seg_loss(cfg.loss_type, None), cfg.adv_softmax_axis)
        time_step("pallas W-minor disc conv1 b8", step, state, batch)

    if "s2d" in names:
        # A/B arm: space-to-depth conv1+conv2 in the discriminator
        # (ops/s2d.py) — exact numerics, same param shapes, so the baseline
        # state is reused directly.
        from s2r_tpu.models import FCDiscriminator
        from s2r_tpu.train.lr_schedule import make_lr_schedule
        from s2r_tpu.train.losses import build_seg_loss
        from s2r_tpu.train.optim import SGD, Adam
        from s2r_tpu.train.steps import make_output_adapt_step

        cfg = Config(crop_size=H, base_size=H, batch_size=8, epochs=200,
                     precision="bf16")
        discr = FCDiscriminator(num_classes=19, dtype=jnp.bfloat16,
                                s2d_convs=2)
        step = make_output_adapt_step(
            m.deeplab, discr,
            SGD(momentum=cfg.momentum, weight_decay=cfg.weight_decay,
                nesterov=cfg.nesterov), Adam(b1=0.9, b2=0.99),
            make_lr_schedule(cfg.lr_scheduler, cfg.lr, cfg.epochs, 1000),
            build_seg_loss(cfg.loss_type, None), cfg.adv_softmax_axis)
        time_step("s2d discriminator b8", step, state, batch)


def make_two_grad_step(m):
    """Output-adapt step with TWO gradient calls (G then D) — the
    formulation make_output_adapt_step's joint loss replaced; kept here so
    the round-2 'joint loss: neutral' A/B is reproducible."""
    from s2r_tpu.train.losses import bce_with_logits, build_seg_loss
    from s2r_tpu.train.lr_schedule import make_lr_schedule
    from s2r_tpu.train.optim import (SGD, Adam, FusedOptimizer,
                                     lr_mult_tree)
    from s2r_tpu.train.steps import _adv_softmax

    cfg = Config(crop_size=H, base_size=H, batch_size=8, epochs=200,
                 precision="bf16")
    deeplab, discr = m.deeplab, m.aux_model
    seg_loss_fn = build_seg_loss(cfg.loss_type, None)
    lr_fn = make_lr_schedule(cfg.lr_scheduler, cfg.lr, cfg.epochs, 1000)
    g_opt = SGD(momentum=cfg.momentum, weight_decay=cfg.weight_decay,
                nesterov=cfg.nesterov)
    d_opt = Adam(b1=0.9, b2=0.99)
    fused = {}
    sg = jax.lax.stop_gradient

    def step(state, batch):
        if not fused:
            fused["G"] = FusedOptimizer(
                g_opt, state.params["G"],
                lr_mult_tree(state.params["G"],
                             {"backbone": 1.0, "aspp": 10.0,
                              "decoder": 10.0}))
            fused["D"] = FusedOptimizer(d_opt, state.params["D"])
        lr = lr_fn(state.step)
        rng, r_src, r_tgt = jax.random.split(state.rng, 3)
        mode = cfg.adv_softmax_axis

        def g_loss(params_g):
            v = {"params": params_g, "batch_stats": state.batch_stats}
            (src_logits, _), upd = deeplab.apply(
                v, batch["src_image"], True, mutable=["batch_stats"],
                rngs={"dropout": r_src})
            v2 = {"params": params_g, "batch_stats": upd["batch_stats"]}
            (tgt_logits, _), upd2 = deeplab.apply(
                v2, batch["tgt_image"], True, mutable=["batch_stats"],
                rngs={"dropout": r_tgt})
            l_seg = seg_loss_fn(src_logits, batch["src_label"])
            l_adv = bce_with_logits(
                discr.apply({"params": sg(state.params["D"])},
                            _adv_softmax(tgt_logits, mode)), 0.0)
            return l_seg + l_adv, (upd2["batch_stats"], src_logits,
                                   tgt_logits, l_seg, l_adv)

        (_, aux), grads_g = jax.value_and_grad(g_loss, has_aux=True)(
            state.params["G"])
        new_bstats, src_logits, tgt_logits, l_seg, l_adv = aux

        def d_loss(params_d):
            l_dsrc = bce_with_logits(
                discr.apply({"params": params_d},
                            _adv_softmax(sg(src_logits), mode)), 0.0)
            l_dtgt = bce_with_logits(
                discr.apply({"params": params_d},
                            _adv_softmax(sg(tgt_logits), mode)), 1.0)
            return l_dsrc + l_dtgt

        l_d, grads_d = jax.value_and_grad(d_loss)(state.params["D"])
        params_g, g_state = fused["G"].apply(grads_g, state.opt_state["G"],
                                             state.params["G"], lr)
        params_d, d_state = fused["D"].apply(grads_d, state.opt_state["D"],
                                             state.params["D"], lr)
        new_state = state.replace(
            step=state.step + 1, params={"G": params_g, "D": params_d},
            batch_stats=new_bstats,
            opt_state={"G": g_state, "D": d_state}, rng=rng)
        return new_state, {"seg_loss": l_seg, "adv_loss": l_adv,
                           "d_loss": l_d, "lr": lr}

    return step


if __name__ == "__main__":
    main()
