"""Per-config device profiles (VERDICT r2 item 1).

Captures a jax.profiler XPlane trace of N steps of a tracked config on the
real TPU and prints an itemized per-category device-time table — the
methodology behind the PARITY.md §Performance device-profile tables.

Usage:
    PYTHONPATH=/root/repo:$PYTHONPATH python exp/profile_step.py [config]
configs: mobilenet_b8 (default) | resnet101_b4 | resnet101_b8 |
         xception_b8 | drn_b8 | feature_b8 | eval_fullres | serve_fullres |
         serve_decoder | serve_decoder_int8 | mobilenet_b8_split |
         serve_decoder_split
"""

from __future__ import annotations

import collections
import glob
import os
import re
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
TRACE_STEPS = 3


def make_batch(batch, h=H, w=W):
    rng = np.random.RandomState(0)
    return {
        "src_image": jnp.asarray(rng.randn(batch, h, w, 3), jnp.float32),
        "src_label": jnp.asarray(rng.randint(0, 19, (batch, h, w)),
                                 jnp.int32),
        "tgt_image": jnp.asarray(rng.randn(batch, h, w, 3), jnp.float32),
    }


CONFIGS = {
    "mobilenet_b8": dict(backbone="mobilenet", batch=8, method="output_adapt"),
    "resnet101_b4": dict(backbone="resnet101", batch=4, method="output_adapt"),
    "resnet101_b8": dict(backbone="resnet101", batch=8, method="output_adapt"),
    "xception_b8": dict(backbone="xception", batch=8, method="output_adapt"),
    "drn_b8": dict(backbone="drn", batch=8, method="output_adapt"),
    "feature_b8": dict(backbone="mobilenet", batch=8, method="feature_adapt"),
    "eval_fullres": dict(backbone="mobilenet", batch=1, method="eval"),
    "eval_fullres_b8": dict(backbone="mobilenet", batch=8, method="eval"),
    "serve_fullres": dict(backbone="mobilenet", batch=8, method="serve"),
    "serve_decoder": dict(backbone="mobilenet", batch=8, method="serve",
                          argmax_res="decoder"),
    "serve_decoder_int8": dict(backbone="mobilenet", batch=8, method="serve",
                               argmax_res="decoder", quant="decoder_int8"),
    # --split-concat arms (models/deeplab.py split_concat)
    "mobilenet_b8_split": dict(backbone="mobilenet", batch=8,
                               method="output_adapt", split_concat=True),
    "serve_decoder_split": dict(backbone="mobilenet", batch=8,
                                method="serve", argmax_res="decoder",
                                split_concat=True),
}


def _serving_fn_and_input(c):
    """The deployment-path closure: rgb8 -> labels, weights as constants
    (exactly what cli.export --format servable bakes into the artifact)."""
    from s2r_tpu.io.serving import make_serving_fn

    cfg = Config(crop_size=H, base_size=H, batch_size=c["batch"], epochs=200,
                 precision="bf16", backbone=c["backbone"],
                 split_concat=c.get("split_concat", False))
    m = build_method(cfg, 1000, method="output_adapt")
    state = m.init_state(jax.random.PRNGKey(0))
    params, bstats = m.eval_variables(state)
    eval_deeplab = (m.deeplab.clone(logits_dtype=None)
                    if m.deeplab.logits_dtype is not None else m.deeplab)
    quant = c.get("quant", "none")
    quant_scales = None
    if quant != "none":
        from s2r_tpu.io.quant import calibrate_decoder_int8

        calib = [np.random.RandomState(1).rand(1, 257, 513, 3)
                 .astype(np.float32)]
        quant_scales = calibrate_decoder_int8(eval_deeplab, params, bstats,
                                              calib)
    sfn = make_serving_fn(eval_deeplab, params, bstats, output="labels",
                          input="rgb8",
                          argmax_res=c.get("argmax_res", "full"),
                          quant=quant, quant_scales=quant_scales)
    img = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, (c["batch"], 1024, 2048, 3), np.uint8))
    return sfn, img


def build(name):
    c = CONFIGS[name]
    out_stride = 8 if c["backbone"] == "drn" else 16
    cfg = Config(crop_size=H, base_size=H, batch_size=c["batch"], epochs=200,
                 precision="bf16", backbone=c["backbone"],
                 out_stride=out_stride,
                 split_concat=c.get("split_concat", False))
    if c["method"] == "serve":
        sfn, img = _serving_fn_and_input(c)
        fn = jax.jit(sfn)

        def run_one(carry):
            jax.block_until_ready(fn(img))
            return carry
        return run_one, None
    if c["method"] == "eval":
        m = build_method(cfg, 1000, method="output_adapt")
        state = m.init_state(jax.random.PRNGKey(0))
        params, bstats = m.eval_variables(state)
        rng = np.random.RandomState(0)
        img = jnp.asarray(rng.randn(1, 1024, 2048, 3), jnp.float32)
        lbl = jnp.asarray(rng.randint(0, 19, (1, 1024, 2048)), jnp.int32)
        fn = jax.jit(m.eval_step)

        def run_one(carry):
            loss, cm, _ = fn(params, bstats, img, lbl)
            jax.block_until_ready(cm)
            return carry
        return run_one, None
    m = build_method(cfg, 1000, method=c["method"])
    state = m.init_state(jax.random.PRNGKey(0))
    step = jax.jit(m.step_fn, donate_argnums=0)
    batch = make_batch(c["batch"])

    def run_one(state):
        state, _m = step(state, batch)
        return state
    return run_one, state


def _strip(name: str) -> str:
    """Bucket an op event name into its HLO opcode-ish category.  Trace
    event names may be bare ('fusion.123') or the full instruction text
    ('%fusion.607 = bf16[8,128,256,304]{...} fusion(...)')."""
    name = name.split(" = ")[0].strip().lstrip("%")
    return re.sub(r"[.-]\d+$", "", name)


def _shape_of(name: str) -> str:
    m = re.search(r"= (\w+\[[\d,]*\])", name)
    return m.group(1) if m else ""


def parse_xplane(logdir: str):
    """Aggregate device-op durations by stripped op name from the
    TensorCore plane of the newest .xplane.pb under logdir."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    assert paths, f"no xplane trace under {logdir}"
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    totals = collections.Counter()
    per_op = collections.Counter()
    total_ns = 0
    for plane in xs.planes:
        if "TPU" not in plane.name and "TensorCore" not in plane.name:
            continue
        ev_names = plane.event_metadata
        for line in plane.lines:
            if line.name not in ("XLA Ops", "XLA TraceMe",
                                 "Tensorflow Ops", "Steps"):
                # TPU traces put the op timeline in 'XLA Ops'; fall through
                # only for unknown single-line planes
                if len(plane.lines) > 1:
                    continue
            if line.name == "Steps":
                continue
            for ev in line.events:
                name = ev_names[ev.metadata_id].name
                totals[_strip(name)] += ev.duration_ps
                per_op[name.split(" = ")[0].strip() + " "
                       + _shape_of(name)] += ev.duration_ps
                total_ns += ev.duration_ps
    return totals, per_op, total_ns, paths[-1]


def report(name, wall_ms, logdir):
    totals, per_op, total_ps, path = parse_xplane(logdir)
    dev_ms = total_ps / 1e9 / TRACE_STEPS
    print(f"\n== {name}: wall {wall_ms:.1f} ms/step (trace-inflated on the "
          f"tunnel), device ops {dev_ms:.1f} ms/step  ({path})")
    print(f"{'category':44s} {'ms/step':>9s} {'%':>6s}")
    for cat, ps in totals.most_common(14):
        ms = ps / 1e9 / TRACE_STEPS
        print(f"{cat[:44]:44s} {ms:9.2f} {100 * ps / total_ps:6.1f}")
    rest = total_ps - sum(ps for _, ps in totals.most_common(14))
    if rest > 0:
        print(f"{'(rest)':44s} {rest / 1e9 / TRACE_STEPS:9.2f} "
              f"{100 * rest / total_ps:6.1f}")
    print(f"\n{'top ops':64s} {'ms/step':>9s} {'%':>6s}")
    for op, ps in per_op.most_common(16):
        ms = ps / 1e9 / TRACE_STEPS
        print(f"{op[:64]:64s} {ms:9.2f} {100 * ps / total_ps:6.1f}")


# v5e-1 peaks for roofline placement (bf16 MXU, HBM).
PEAK_GBPS = 819.0
PEAK_TFLOPS = 197.0


def cost(name, dev_ms=None):
    """XLA cost analysis of the compiled step: logical HBM bytes + flops,
    placed on the v5e roofline against a measured device-ms (pass it, or it
    is read from the saved trace under /tmp/prof_<name>)."""
    c = CONFIGS[name]
    out_stride = 8 if c["backbone"] == "drn" else 16
    cfg = Config(crop_size=H, base_size=H, batch_size=c["batch"], epochs=200,
                 precision="bf16", backbone=c["backbone"],
                 out_stride=out_stride,
                 split_concat=c.get("split_concat", False))
    if c["method"] == "serve":
        sfn, img = _serving_fn_and_input(c)
        lowered = jax.jit(sfn).lower(img)
    elif c["method"] == "eval":
        m = build_method(cfg, 1000, method="output_adapt")
        state = m.init_state(jax.random.PRNGKey(0))
        params, bstats = m.eval_variables(state)
        rng = np.random.RandomState(0)
        img = jnp.zeros((1, 1024, 2048, 3), jnp.float32)
        lbl = jnp.zeros((1, 1024, 2048), jnp.int32)
        lowered = jax.jit(m.eval_step).lower(params, bstats, img, lbl)
    else:
        m = build_method(cfg, 1000, method=c["method"])
        state = m.init_state(jax.random.PRNGKey(0))
        lowered = jax.jit(m.step_fn, donate_argnums=0).lower(
            state, make_batch(c["batch"]))
    ca = lowered.compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    gb = ca.get("bytes accessed", 0.0) / 1e9
    tflop = ca.get("flops", 0.0) / 1e12
    print(f"{name}: cost analysis {gb:.1f} GB accessed, {tflop:.2f} TFLOP")
    if dev_ms is None:
        try:
            _, _, total_ps, _ = parse_xplane(f"/tmp/prof_{name}")
            dev_ms = total_ps / 1e9 / TRACE_STEPS
        except AssertionError:
            return
    bw = gb / (dev_ms / 1e3)
    fl = tflop / (dev_ms / 1e3)
    print(f"  @ {dev_ms:.1f} ms/step: {bw:.0f} GB/s logical = "
          f"{100 * bw / PEAK_GBPS:.0f}% of HBM roofline; "
          f"{fl:.1f} TFLOP/s = {100 * fl / PEAK_TFLOPS:.0f}% of bf16 MXU")


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "mobilenet_b8"
    if "--parse-only" in sys.argv[2:]:
        report(name, float("nan"), f"/tmp/prof_{name}")
        return
    if "--cost" in sys.argv[2:]:
        cost(name)
        return
    run_one, carry = build(name)

    # compile + warm
    t0 = time.perf_counter()
    carry = run_one(carry)
    print(f"compile+1st step: {time.perf_counter() - t0:.0f}s", flush=True)
    for _ in range(2):
        carry = run_one(carry)
    if carry is not None:
        jax.block_until_ready(jax.tree.leaves(carry)[0])

    # timed + traced
    logdir = f"/tmp/prof_{name}"
    t0 = time.perf_counter()
    jax.profiler.start_trace(logdir)
    for _ in range(TRACE_STEPS):
        carry = run_one(carry)
    if carry is not None:
        jax.block_until_ready(jax.tree.leaves(carry)[0])
    jax.profiler.stop_trace()
    wall_ms = (time.perf_counter() - t0) / TRACE_STEPS * 1e3

    report(name, wall_ms, logdir)


if __name__ == "__main__":
    main()
