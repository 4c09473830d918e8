"""AOT serving artifacts via jax.export (StableHLO).

The reference's only deployment path is a torch checkpoint consumed by its
own Python drivers (reference: train_adapt.py:139-156 saving, val_adapt.py
loading).  The TPU-native deployment story is ahead-of-time: lower the
jitted eval forward — weights baked in as constants — to a serialized
StableHLO artifact that any JAX process (or an XLA-based server) can load
and run WITHOUT the framework, the model code, or the checkpoint.

    export_servable(deeplab, params, bstats, (1, 1024, 2048, 3), "m.shlo")
    serve = load_servable("m.shlo")
    labels = serve(images)          # re-traces nothing; compiles the
                                    # embedded StableHLO for the local chip

Artifact layout: a 16-byte header ``S2RSHLO1`` + u64 JSON-length, a JSON
meta block (backbone, classes, input spec, output kind, preprocessing
contract), then the ``jax.export`` serialization.  ``platforms`` defaults
to the current backend; pass e.g. ("tpu", "cpu") for a portable artifact
(measured on-device-neutral on v5e — exp/serve_bench.py).

Preprocessing contract: ``input="normalized"`` expects the eval-transform
tensor ((x/255 - IMAGENET_MEAN) / IMAGENET_STD, f32 NHWC); ``input="rgb8"``
bakes that normalization into the graph so servers feed raw RGB bytes —
one less host-side pass over every frame, and the divide rides the same
HBM read as the first conv.
"""

from __future__ import annotations

import dataclasses
import json
import struct
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from s2r_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
from s2r_tpu.ops.argmax import argmax_first
from s2r_tpu.ops.resize import resize_bilinear_align_corners

_MAGIC = b"S2RSHLO1"

_OUTPUTS = ("labels", "logits", "probs")


def _nearest_ac_indices(out_size: int, in_size: int) -> np.ndarray:
    """Align-corners nearest-neighbor gather indices (out_size,) int32.

    Output coordinate i samples input coordinate i*(in-1)/(out-1) — the same
    grid the align-corners bilinear resize interpolates on — rounded to the
    nearest input pixel.
    """
    if out_size == 1:
        return np.zeros((1,), np.int32)
    scale = (in_size - 1) / (out_size - 1)
    # floor(x + 0.5), not np.rint: rint's half-to-even tie-breaking makes
    # ties at integer upsample ratios alternate down/up, giving an uneven
    # nearest grid (some source pixels duplicated, neighbors skipped)
    return np.floor(np.arange(out_size) * scale + 0.5).astype(np.int32)


def make_serving_fn(deeplab, params, batch_stats, *, output: str = "labels",
                    input: str = "normalized",
                    argmax_res: str = "full",
                    label_dtype: str = "int32",
                    quant: str = "none",
                    quant_scales: Optional[dict] = None,
                    quant_requant: str = "auto",
                    pad_batch_to: Optional[int] = None) -> Callable:
    """Closure over the variables: image batch -> prediction.

    output: 'labels' (argmax trainIds, int32), 'logits' (f32 [N,H,W,C]) or
    'probs' (softmax f32).  input: 'normalized' | 'rgb8' (see module doc).

    label_dtype (output='labels' only): 'int32' (default, matches the
    eval path and the reference's numpy argmax) or 'uint8' — trainIds fit
    a byte (19 classes), PNG labelId files are 8-bit anyway (reference:
    test_adapt.py:118-157 saves mode-'L' images), and a byte label plane
    is 4x fewer device->host bytes per frame (full-res batch 8: 16.8 vs
    67 MB per call — that is ~1 GB/s of PCIe saved at the measured 118
    img/s serving rate).  In 'decoder' mode the cast happens BEFORE the
    nearest-upsample gather, so the full-res label pass also moves 4x
    less HBM.  Values are identical to int32 mode (labels < 256).

    argmax_res (output='labels' only): 'full' (exact — bilinear-upsample the
    19-channel logits to input resolution, then argmax; the eval-path
    semantics) or 'decoder' (fast — argmax at the decoder's stride-4
    resolution, then nearest-upsample the int32 LABELS on the same
    align-corners grid).  'decoder' skips every full-res 19-channel tensor
    (~2.5 GB of HBM traffic per full-res batch-8 call); it differs from
    'full' only where the bilinear blend flips the winner near class
    boundaries.  Measured (PARITY.md §Performance, serving paragraph):
    7.86 vs 8.35-8.56 ms/image full-res b8 on v5e (~7% faster) at 99.40%
    full-res pixel agreement on the trained checkpoint, mIoU 0.9083 vs
    0.9125 exact (exp/serve_bench.py --argmax decoder, exp/serve_agree.py);
    index-math
    and trained-ckpt agreement tests in tests/test_serving.py.

    quant: 'none' (default — exact model numerics) or 'decoder_int8'
    (the decoder head's two 3x3 convs run int8 with folded BN; measured
    SLOWER end-to-end on v5e-1 full-res b8 despite the isolated 1.72x
    conv-class win — io/quant.py module doc has the verdict).  Requires
    `quant_scales` from
    `s2r_tpu.io.quant.calibrate_decoder_int8`.  Composes with every
    output/argmax_res/label_dtype combination (the quantized tail
    produces decoder-resolution logits; upsample/argmax/softmax apply
    downstream with the same semantics as the unquantized path).
    quant_requant: lowering of the tail's s32->s8 pass ('auto' = 'xla',
    the measured default — the Pallas boundary kernel was end-to-end
    neutral, see io/quant.py; 'pallas' is the A/B arm, TPU-only).

    pad_batch_to: if set, the graph zero-pads the input batch N up to
    this size, runs the whole network at the padded batch, and slices
    the output back to N — the serve-time analogue of training's
    `--batch-pad auto`.  Eval-mode BN has no cross-sample coupling, so
    real-row outputs are identical to an unpadded run.  This trades
    padded COMPUTE for a fixed compiled shape: a deployer can ship one
    b8-internal artifact per ragged size instead of distinct graphs.
    It is NOT a latency optimization — a padded call costs the full
    padded-batch time (measured refutation for b1 in PARITY.md
    §Performance) — serving's batch-size cliff is far gentler than the
    train step's (eval b4 is within 8% of b8 per image), so feed real
    multiples of 8 when you can.
    """
    if pad_batch_to is not None and pad_batch_to < 1:
        raise ValueError("pad_batch_to must be >= 1")
    if quant not in ("none", "decoder_int8"):
        raise ValueError("quant must be 'none' or 'decoder_int8'")
    if quant != "none" and not (quant_scales and "a0" in quant_scales
                                and "a1" in quant_scales):
        raise ValueError("quant='decoder_int8' needs quant_scales from "
                         "s2r_tpu.io.quant.calibrate_decoder_int8")
    if output not in _OUTPUTS:
        raise ValueError(f"output must be one of {_OUTPUTS}")
    if argmax_res not in ("full", "decoder"):
        raise ValueError("argmax_res must be 'full' or 'decoder'")
    if argmax_res == "decoder" and output != "labels":
        raise ValueError("argmax_res='decoder' only applies to "
                         "output='labels'")
    if label_dtype not in ("int32", "uint8"):
        raise ValueError("label_dtype must be 'int32' or 'uint8'")
    if label_dtype == "uint8" and output != "labels":
        raise ValueError("label_dtype='uint8' only applies to "
                         "output='labels'")
    if label_dtype == "uint8" and deeplab.num_classes > 256:
        raise ValueError("label_dtype='uint8' needs num_classes <= 256")
    out_dtype = jnp.int32 if label_dtype == "int32" else jnp.uint8
    if argmax_res == "decoder" or quant != "none":
        deeplab = deeplab.clone(upsample_logits=False)
    variables = {"params": params, "batch_stats": batch_stats}
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32) * 255.0
    std = jnp.asarray(IMAGENET_STD, jnp.float32) * 255.0
    if quant != "none":
        from s2r_tpu.io.quant import backbone_taps, make_decoder_tail

        tail = make_decoder_tail(params["decoder"], batch_stats["decoder"],
                                 scales=quant_scales,
                                 compute_dtype=deeplab.dtype,
                                 requant=quant_requant)

    def fn(image):
        full_hw = image.shape[1:3]
        n_real = image.shape[0]
        if pad_batch_to is not None:
            if n_real > pad_batch_to:
                raise ValueError(f"batch {n_real} exceeds "
                                 f"pad_batch_to={pad_batch_to}")
            if n_real < pad_batch_to:
                image = jnp.concatenate(
                    [image, jnp.zeros((pad_batch_to - n_real,)
                                      + image.shape[1:], image.dtype)])
        if input == "rgb8":
            image = (image.astype(jnp.float32) - mean) / std
        if quant != "none":
            feat, low = backbone_taps(deeplab, variables, image)
            logits = tail(feat, low)  # decoder-res, f32
            if output != "labels" or argmax_res == "full":
                # reproduce the composite's final upsample (deeplab.py:94-98)
                logits = resize_bilinear_align_corners(logits, full_hw,
                                                       dtype=jnp.float32)
        else:
            logits, _ = deeplab.apply(variables, image, False)
            logits = logits.astype(jnp.float32)
        if output == "labels":
            # argmax_first (two simple reduces) wins at decoder resolution
            # (7.86 -> 7.61 ms/image) but XLA compiles it pathologically
            # slowly at full res (the round-4 rehearsal's servable export
            # went 73 s -> 2187 s) for a neutral runtime — so the exact
            # 'full' path keeps jnp.argmax.
            if argmax_res == "full":
                labels = jnp.argmax(logits, axis=-1).astype(out_dtype)
            else:
                # cast before the nearest gather: the full-res label pass
                # (the decoder mode's only full-res tensor) moves 4x less
                # HBM as bytes
                labels = argmax_first(logits, axis=-1).astype(out_dtype)
                rows = _nearest_ac_indices(full_hw[0], labels.shape[1])
                cols = _nearest_ac_indices(full_hw[1], labels.shape[2])
                labels = jnp.take(jnp.take(labels, rows, axis=1), cols,
                                  axis=2)
            return labels[:n_real]  # no-op slice when unpadded
        if output == "probs":
            return jax.nn.softmax(logits[:n_real], axis=-1)
        return logits[:n_real]

    return fn


def export_servable(deeplab, params, batch_stats, input_shape: Sequence[int],
                    path: str, *, output: str = "labels",
                    input: str = "normalized",
                    argmax_res: str = "full",
                    label_dtype: str = "int32",
                    quant: str = "none",
                    quant_scales: Optional[dict] = None,
                    quant_requant: str = "auto",
                    pad_batch_to: Optional[int] = None,
                    platforms: Optional[Sequence[str]] = None,
                    batch_polymorphic: bool = False,
                    meta: Optional[dict] = None) -> dict:
    """Serialize the eval forward (weights embedded) to `path`.

    input_shape: [N, H, W, 3]; with batch_polymorphic=True the N is
    exported as a symbolic dimension 'b' and the artifact accepts any
    batch size (each new size compiles once at serve time — TPU serving
    should still pick a fixed N, ideally a multiple of 8, see CLAUDE.md
    batch-layout note).  Returns the meta dict written into the header.

    platforms: None (default) targets the CURRENT backend only; pass
    e.g. ("tpu", "cpu") for a portable artifact.  Measured on v5e: the
    multi-platform lowering is on-device NEUTRAL (8.48 vs 8.45 ms/image
    full-res b8 — exp/serve_bench.py), so portability costs only
    artifact size; the current-backend default just keeps single-target
    deploys lean.
    """
    if platforms is None:
        platforms = [jax.default_backend()]
    # the Pallas requant custom call only lowers for TPU; multi-platform
    # quant artifacts fall back to the XLA chain (same values)
    requant = quant_requant if all(p == "tpu" for p in platforms) else "xla"
    fn = make_serving_fn(deeplab, params, batch_stats, output=output,
                         input=input, argmax_res=argmax_res,
                         label_dtype=label_dtype, quant=quant,
                         quant_scales=quant_scales, quant_requant=requant,
                         pad_batch_to=pad_batch_to)
    dtype = jnp.uint8 if input == "rgb8" else jnp.float32
    if batch_polymorphic:
        # '_' placeholders take the concrete trailing dims from input_shape
        spec = jax_export.symbolic_args_specs(
            jax.ShapeDtypeStruct(tuple(input_shape), dtype),
            "b, " + ", ".join("_" for _ in input_shape[1:]))
    else:
        spec = jax.ShapeDtypeStruct(tuple(input_shape), dtype)
    exported = jax_export.export(jax.jit(fn),
                                 platforms=list(platforms))(spec)
    blob = exported.serialize()
    info = {"format": "jax.export", "output": output, "input": input,
            "argmax_res": argmax_res, "label_dtype": label_dtype,
            "quant": quant,
            "quant_requant": requant if quant != "none" else None,
            "pad_batch_to": pad_batch_to,
            "quant_scales": ({k: float(v) for k, v in quant_scales.items()}
                             if quant != "none" else None),
            "input_shape": list(input_shape),
            "input_dtype": str(np.dtype(dtype)),
            "batch_polymorphic": bool(batch_polymorphic),
            "platforms": list(platforms),
            "backbone": deeplab.backbone,
            "output_stride": deeplab.output_stride,
            "num_classes": deeplab.num_classes,
            "normalization": ("baked-in (raw RGB8 in)" if input == "rgb8"
                              else "(x/255 - IMAGENET_MEAN) / IMAGENET_STD")}
    if meta:
        info.update(meta)
    payload = json.dumps(info).encode()
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<Q", len(payload)))
        f.write(payload)
        f.write(blob)
    return info


@dataclasses.dataclass
class Servable:
    """A loaded serving artifact: `serve(images)` runs on the local backend."""
    meta: dict
    exported: "jax_export.Exported"

    def __post_init__(self):
        # jit ONCE: jax.jit keys its cache on function identity, and
        # `self.exported.call` is a fresh bound method per access — jitting
        # inside __call__ would re-trace on every request
        self._jitted = jax.jit(self.exported.call)

    def __call__(self, images):
        return self._jitted(images)


def load_servable(path: str) -> Servable:
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path}: not an s2r_tpu serving artifact "
                             f"(bad magic {magic!r})")
        (n,) = struct.unpack("<Q", f.read(8))
        meta = json.loads(f.read(n).decode())
        blob = f.read()
    return Servable(meta, jax_export.deserialize(blob))
