"""Full-res agreement of the decoder-argmax serving fast path vs exact.

Loads the committed convergence checkpoint (run/synthetic/conv-reval,
held-out synthetic mIoU ~0.81 — PARITY.md §End-to-end convergence
evidence), builds the two
serving closures (argmax_res='full' exact eval semantics vs 'decoder'
fast mode), and sweeps trained-distribution synthetic scenes at full
serving resolution.  Reports pixel agreement between the two modes and
each mode's mIoU/accuracy vs the scene labels — the accuracy half of the
fast-mode evidence (speed half: exp/serve_bench.py --argmax decoder).

    PYTHONPATH=/root/repo python exp/serve_agree.py \
        [--size 1024 2048] [--batch 8] [--batches 2]

Only scalars and the two 19x19 confusion matrices ever leave the device
(full-res label planes stay resident — the tunnel is ~30 MB/s).
"""

from __future__ import annotations

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, nargs=2, default=[1024, 2048],
                    metavar=("H", "W"))
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--batches", type=int, default=2)
    ap.add_argument("--ckpt", type=str,
                    default="run/synthetic/conv-reval/model_best.ckpt")
    ap.add_argument("--quant", type=str, default="none",
                    choices=["none", "decoder-int8"],
                    help="compare exact vs decoder-mode WITH the int8 "
                         "decoder tail (io/quant.py), calibrated on one "
                         "trained-distribution scene batch")
    ap.add_argument("--compare", type=str, default="argmax",
                    choices=["argmax", "split-concat", "recipe"],
                    help="argmax: exact vs decoder-argmax fast mode "
                         "(default).  split-concat: default arithmetic vs "
                         "models/deeplab.py split_concat=True under the "
                         "SAME exact full-argmax mode (pins that the "
                         "concat-free head convs are numerically "
                         "indistinguishable at deployment precision).  "
                         "recipe: exact vs the full recommended throughput "
                         "deployment (decoder-argmax AND split-concat "
                         "together)")
    args = ap.parse_args()
    if args.compare != "argmax" and args.quant != "none":
        ap.error(f"--compare {args.compare} is quant-free")

    from s2r_tpu.config import apply_platform_override
    apply_platform_override()  # honor S2R_PLATFORM=cpu (agreement needs no TPU)

    import jax
    import jax.numpy as jnp

    from s2r_tpu.config import Config
    from s2r_tpu.data.synthetic import _scene
    from s2r_tpu.eval.metrics import Evaluator, confusion_matrix
    from s2r_tpu.io.checkpoint import load_checkpoint
    from s2r_tpu.io.serving import make_serving_fn
    from s2r_tpu.train.setup import build_method

    h, w = args.size
    cfg = Config(dataset="synthetic", crop_size=128, base_size=128,
                 batch_size=args.batch)
    m = build_method(cfg, iters_per_epoch=1, method="output_adapt")
    state = m.init_state(jax.random.PRNGKey(0))
    state = load_checkpoint(args.ckpt, state)["state"]
    params, bstats = m.eval_variables(state)
    deeplab = (m.deeplab.clone(logits_dtype=None)
               if m.deeplab.logits_dtype is not None else m.deeplab)

    quant = args.quant.replace("-", "_")
    quant_scales = None
    if quant != "none":
        from s2r_tpu.io.quant import calibrate_decoder_int8

        rng = np.random.RandomState(123)
        calib = np.stack([_scene(rng, 512, 1024)[0] for _ in range(2)])
        quant_scales = calibrate_decoder_int8(deeplab, params, bstats,
                                              [calib], input="rgb8")
        print(f"calibrated int8 scales: {quant_scales}")

    fn_full = jax.jit(make_serving_fn(deeplab, params, bstats, input="rgb8"))
    if args.compare == "split-concat":
        fn_fast = jax.jit(make_serving_fn(
            deeplab.clone(split_concat=True), params, bstats, input="rgb8"))
    elif args.compare == "recipe":
        fn_fast = jax.jit(make_serving_fn(
            deeplab.clone(split_concat=True), params, bstats, input="rgb8",
            argmax_res="decoder"))
    else:
        fn_fast = jax.jit(make_serving_fn(
            deeplab, params, bstats, input="rgb8", argmax_res="decoder",
            quant=quant, quant_scales=quant_scales))

    @jax.jit
    def compare(pf, pd, lbl):
        agree = jnp.sum(pf == pd)
        return (agree, confusion_matrix(lbl, pf, 19),
                confusion_matrix(lbl, pd, 19))

    ev_full, ev_fast = Evaluator(19), Evaluator(19)
    agree = total = 0
    for b in range(args.batches):
        imgs, lbls = [], []
        for i in range(args.batch):
            rng = np.random.RandomState(777 + b * args.batch + i)
            img, lbl = _scene(rng, h, w)
            imgs.append(img)
            lbls.append(lbl)
        x = jnp.asarray(np.stack(imgs))
        lbl = jnp.asarray(np.stack(lbls))
        pf, pd = fn_full(x), fn_fast(x)
        a, cm_f, cm_d = compare(pf, pd, lbl)
        ev_full.merge(cm_f)
        ev_fast.merge(cm_d)
        agree += int(a)
        total += int(np.prod(pf.shape))
        print(f"batch {b}: running agreement {agree / total:.6f}")
    miou_f, _ = ev_full.Mean_Intersection_over_Union()
    miou_d, _ = ev_fast.Mean_Intersection_over_Union()
    tag = ("split-concat" if args.compare == "split-concat"
           else "recipe(decoder+split)" if args.compare == "recipe"
           else "decoder-int8" if quant != "none" else "decoder")
    print(f"{tag}-vs-full @{h}x{w} b{args.batch} x{args.batches} "
          f"(trained ckpt {args.ckpt}):")
    print(f"  pixel agreement {100.0 * agree / total:.3f}%")
    print(f"  mIoU exact {miou_f:.4f}  fast {miou_d:.4f}  "
          f"(delta {miou_d - miou_f:+.4f})")
    print(f"  pixel acc exact {ev_full.Pixel_Accuracy():.4f}  "
          f"fast {ev_fast.Pixel_Accuracy():.4f}")


if __name__ == "__main__":
    main()
