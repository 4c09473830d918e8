"""Convert an s2r_tpu checkpoint to a deployable artifact.

Two formats:

--format torch (default): reference-format .pth.tar.
    python -m s2r_tpu.cli.export --resume run/.../model_best.ckpt \
        --out exported.pth.tar [--schema single|four]
  'single' matches train_adapt.py's checkpoint layout; 'four' matches
  train.py's (feature-adaption checkpoints include the domain classifier).
  The exported file strict-loads into the reference's torch modules
  (tests/test_torch_export.py).

--format servable: AOT StableHLO serving artifact (io/serving.py) — the
  eval forward with weights baked in, loadable without model code or
  checkpoint by any JAX/XLA process.
    python -m s2r_tpu.cli.export --resume .../model_best.ckpt \
        --format servable --out model.shlo \
        [--serve-shape 8 1024 2048] [--serve-output labels] \
        [--serve-input rgb8] [--serve-batch-poly]
"""

from __future__ import annotations

import argparse

from s2r_tpu.config import (add_common_flags, apply_platform_override,
                            config_from_args)


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="export s2r_tpu checkpoint to reference torch format")
    add_common_flags(parser)
    parser.add_argument("--out", type=str, required=True)
    parser.add_argument("--format", type=str, default="torch",
                        choices=["torch", "servable"])
    parser.add_argument("--schema", type=str, default="single",
                        choices=["single", "four"])
    parser.add_argument("--method", type=str, default="output_adapt",
                        choices=["output_adapt", "feature_adapt",
                                 "source_only"])
    parser.add_argument("--serve-shape", type=int, nargs=3,
                        default=[1, 1024, 2048], metavar=("N", "H", "W"),
                        help="servable input shape (default full-res "
                             "Cityscapes eval, batch 1; TPU serving should "
                             "prefer N a multiple of 8)")
    parser.add_argument("--serve-output", type=str, default="labels",
                        choices=["labels", "logits", "probs"])
    parser.add_argument("--serve-input", type=str, default="normalized",
                        choices=["normalized", "rgb8"])
    parser.add_argument("--serve-argmax", type=str, default="full",
                        choices=["full", "decoder"],
                        help="labels output only: 'full' = exact eval "
                             "semantics (bilinear-upsample logits, then "
                             "argmax); 'decoder' = fast mode (argmax at "
                             "stride-4 decoder resolution, nearest-upsample "
                             "labels — skips all full-res 19-channel "
                             "tensors; measured 7.61 vs 8.35-8.56 ms/image "
                             "full-res b8 on v5e at 99.40%% pixel agreement, "
                             "mIoU -0.004 — PARITY.md §Performance)")
    parser.add_argument("--serve-split-concat", action="store_true",
                        dest="serve_split_concat",
                        help="compute the ASPP/decoder concat convs as "
                             "split-kernel sums — no materialized 1280/304-"
                             "channel concat, same checkpoint, float-sum "
                             "reassociation only (measured 7.21 vs 7.62 "
                             "ms/image full-res b8 decoder mode on v5e — "
                             "PARITY.md §Performance)")
    parser.add_argument("--serve-label-dtype", type=str, default="int32",
                        choices=["int32", "uint8"],
                        help="labels output only: uint8 halves nothing "
                             "on-device in 'full' mode but moves 4x fewer "
                             "device->host bytes per frame (labelId PNGs "
                             "are 8-bit anyway); in 'decoder' mode the "
                             "full-res label pass also moves 4x less HBM")
    parser.add_argument("--serve-quant", type=str, default="none",
                        choices=["none", "decoder-int8"],
                        help="'decoder-int8': the decoder head's two 3x3 "
                             "convs run int8 with folded BN (io/quant.py). "
                             "Measured SLOWER end-to-end on v5e-1 at "
                             "full-res b8 (8.83 vs 7.62 ms/image decoder "
                             "mode — the requant boundary passes eat the "
                             "isolated 1.72x conv win; PARITY.md "
                             "§Performance).  Kept for hardware/shapes "
                             "where int8 convs win bigger.  NOT exact; "
                             "the default 'none' keeps eval-path numerics")
    parser.add_argument("--calib-batches", type=int, default=4,
                        help="val batches used to calibrate int8 activation "
                             "scales (--serve-quant decoder-int8 only)")
    parser.add_argument("--serve-pad-batch", type=int, default=None,
                        metavar="P",
                        help="zero-pad the input batch to P inside the "
                             "graph and slice the output back (io/serving "
                             "pad_batch_to) — one compiled shape for ragged "
                             "batches; NOT a latency win (a padded call "
                             "costs the full padded-batch time)")
    parser.add_argument("--serve-batch-poly", action="store_true",
                        help="export the batch dim as symbolic")
    parser.add_argument("--serve-platforms", type=str, nargs="+",
                        default=None,
                        help="lowering targets; default = current backend "
                             "only (multi-platform is on-device neutral, "
                             "just a bigger artifact — exp/serve_bench.py)")
    args = parser.parse_args(argv)
    if args.serve_argmax == "decoder" and args.serve_output != "labels":
        parser.error("--serve-argmax decoder requires --serve-output labels")
    if args.serve_label_dtype != "int32" and args.serve_output != "labels":
        parser.error("--serve-label-dtype requires --serve-output labels")
    apply_platform_override()
    cfg = config_from_args(args)
    if not cfg.resume:
        parser.error("--resume <checkpoint> is required")

    import dataclasses

    import jax

    from s2r_tpu.core.mesh import make_mesh
    from s2r_tpu.io.torch_export import save_reference_checkpoint
    from s2r_tpu.train.setup import build_method
    from s2r_tpu.train.trainer import Trainer

    m = build_method(cfg, iters_per_epoch=1, method=args.method)
    t = object.__new__(Trainer)
    # ft=True (the resume default) would zero start_epoch; the exported
    # 'epoch' field must reflect the checkpoint's own epoch
    t.cfg = cfg = dataclasses.replace(cfg, ft=False)
    t.method = m
    t.state = m.init_state(jax.random.PRNGKey(cfg.seed))
    t.best_pred = 0.0
    t.start_epoch = 0
    t.mesh = make_mesh(1)
    t._resume(cfg.resume)
    params, bstats = m.eval_variables(t.state)

    if args.format == "servable":
        from s2r_tpu.io.serving import export_servable

        # serve with the f32-logits eval clone, matching the eval path
        deeplab = (m.deeplab.clone(logits_dtype=None)
                   if m.deeplab.logits_dtype is not None else m.deeplab)
        if args.serve_split_concat:
            deeplab = deeplab.clone(split_concat=True)
        n, h, w = args.serve_shape
        quant = args.serve_quant.replace("-", "_")
        quant_scales = None
        if quant != "none":
            import itertools

            from s2r_tpu.data.loader import make_data_loader
            from s2r_tpu.io.quant import calibrate_decoder_int8

            _, val_loader, _, _ = make_data_loader(cfg)
            batches = [b["image"] for b in itertools.islice(
                iter(val_loader), args.calib_batches)]
            quant_scales = calibrate_decoder_int8(deeplab, params, bstats,
                                                  batches)
            print(f"calibrated int8 scales on {len(batches)} val batches: "
                  f"{quant_scales}")
        info = export_servable(
            deeplab, params, bstats, (n, h, w, 3), args.out,
            output=args.serve_output, input=args.serve_input,
            argmax_res=args.serve_argmax,
            label_dtype=args.serve_label_dtype,
            quant=quant, quant_scales=quant_scales,
            pad_batch_to=args.serve_pad_batch,
            platforms=args.serve_platforms,
            batch_polymorphic=args.serve_batch_poly,
            meta={"epoch": t.start_epoch, "best_pred": float(t.best_pred)})
        q = (f", quant {info['quant']}" if info["quant"] != "none" else "")
        print(f"exported servable ({info['output']}, {info['input']}, "
              f"shape {info['input_shape']}, platforms "
              f"{info['platforms']}{q}) to {args.out}")
        return

    domain = None
    if args.schema == "four" and m.name != "output_adapt":
        # feature-method states carry the domain classifier under 'D'
        domain = (t.state.params["D"], t.state.batch_stats["D"])
    save_reference_checkpoint(args.out, params, bstats,
                              epoch=t.start_epoch, best_pred=t.best_pred,
                              output_stride=cfg.out_stride,
                              schema=args.schema, domain=domain,
                              backbone=cfg.backbone)
    print(f"exported {args.schema}-schema checkpoint to {args.out}")


if __name__ == "__main__":
    main()
