"""Post-training int8 quantization for the serving decoder tail.

Measured basis (exp/int8_probe.py; PARITY.md §Performance int8 lines):
per-op-class probes on v5e REFUTE full-model PTQ for mobilenet's
inverted-residual mix (invres chain 0.98x — the extra requant elementwise
passes eat the halved conv traffic at low channel counts), but the
decoder's 3x3/256-channel conv class wins 1.72x, and those two convs are
the serve_decoder profile's top fusions (8.7 + 6.4 of 55.1 ms/step, ~27%
of serving device time).  Quantization here is therefore scoped to
exactly that measured winner: the decoder head's two 3x3 convs
(last_conv_0/1 — reference modeling/decoder.py:22-30), with their BNs
folded into the weights.  Backbone, ASPP, the low-level 1x1 and the
classifier stay in the model's compute dtype.

END-TO-END VERDICT (v5e-1, full-res 2048x1024 b8 rgb8->labels decoder
mode): REFUTED — 8.83 ms/image int8 vs 7.62 exact (exp/serve_bench.py
--argmax decoder --quant decoder-int8), even with per-branch pre-concat
quantization; re-confirmed in the round-5 three-arm window (8.81 int8
vs 7.60 exact), where the Pallas requant-boundary kernel also measured
NEUTRAL (8.82 — the PARITY.md Pallas-requant end-to-end A/B).  The quantize/requant boundary passes (full-size
elementwise round/clip/cast at the 304-ch concat and between the convs)
cost more than the halved conv traffic saves in this bandwidth-bound
regime, and the int8 subgraph breaks XLA's existing conv+BN+ReLU
fusions — the same failure class as the Pallas W-minor conv1 (PARITY
§Performance).  The mode stays available (cli.export --serve-quant)
for hardware/shapes where the int8 conv-class win is larger, with the
measured numbers in its --help.

Scheme (symmetric linear, the probe-arm arithmetic):

    weights      q_W = round(W_folded / s_w) in [-127,127], s_w per OUTPUT
                 channel = max|W_folded[..., c]| / 127
    activations  q_x = round(x / s_a) in [-127,127], s_a = calib_max / 127
                 (per tensor, from `calibrate_decoder_int8`)
    conv         int8 x int8 -> s32 accumulation on the MXU
    requant      one f32 elementwise pass: s32 * (s_a * s_w)[c] + bn_shift[c],
                 whose clamp-to-[0,127] doubles as the ReLU before conv #2

Eval-mode BN is the affine y = x*inv + shift with inv = scale/sqrt(var+eps),
shift = bias - mean*inv (models/layers.py:231-238), so folding inv into the
conv kernel and keeping shift as the bias is exact up to f32 rounding; the
`quantize=False` debug tail pins that wiring against the real decoder
module in tests/test_quant.py.

Accuracy contract: int8 is NOT exact — use it only through the serving
fast path (io/serving.py `quant="decoder_int8"`), never for training or
the framework eval.  Agreement on the trained convergence checkpoint is
pinned in tests/test_quant.py; the TPU speed numbers live in PARITY.md
§Performance.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from s2r_tpu.ops.resize import resize_bilinear_align_corners

_BN_EPS = 1e-5  # models/layers.py BatchNorm default


def fold_bn(kernel, bn_params, bn_stats, eps: float = _BN_EPS
            ) -> Tuple[np.ndarray, np.ndarray]:
    """Fold an eval-mode BatchNorm into the preceding conv.

    kernel [kh,kw,I,O]; returns (W*inv, shift) as f32 numpy, where
    conv(x, W*inv) + shift == BN_eval(conv(x, W)) exactly in real
    arithmetic (BN eval is the affine x*inv + shift).
    """
    k = np.asarray(kernel, np.float32)
    scale = np.asarray(bn_params["scale"], np.float32)
    bias = np.asarray(bn_params["bias"], np.float32)
    mean = np.asarray(bn_stats["mean"], np.float32)
    var = np.asarray(bn_stats["var"], np.float32)
    inv = scale / np.sqrt(var + eps)
    return k * inv, bias - mean * inv


def _quantize_weights(w: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-output-channel symmetric int8: (q [kh,kw,I,O] int8, s_w [O] f32)."""
    s = np.max(np.abs(w), axis=(0, 1, 2)) / 127.0
    s = np.maximum(s, np.finfo(np.float32).tiny).astype(np.float32)
    q = np.clip(np.round(w / s), -127, 127).astype(np.int8)
    return q, s


def _conv(x, k, padding, accum):
    dn = lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(x, k, (1, 1), padding,
                                    dimension_numbers=dn,
                                    preferred_element_type=accum)


def backbone_taps(deeplab, variables, image):
    """(ASPP feature, low-level feature) without touching model code.

    The composite already returns the ASPP output (models/deeplab.py); the
    backbone's low-level map is captured via flax intermediates.  The
    composite's own decoder/upsample outputs go unused and XLA dead-code-
    eliminates them under jit.
    """
    out, st = deeplab.apply(variables, image, False,
                            capture_intermediates=lambda m, _:
                            m.name == "backbone")
    high_low = st["intermediates"]["backbone"]["__call__"][0]
    return out[1], high_low[1]


def make_decoder_tail(dec_params, dec_stats, *, scales: Dict[str, float],
                      compute_dtype=jnp.float32,
                      quantize: bool = True,
                      requant: str = "auto") -> Callable:
    """(aspp_feat, low_level_feat) -> decoder-resolution logits (f32).

    Replicates models/decoder.py eval-mode exactly (dropout off, BN in
    running-stats affine form), with the two 3x3 head convs in int8 when
    `quantize=True`.  `quantize=False` is the folded-f32 debug path used
    by tests to pin the wiring against the real decoder module.

    scales: {'a0': concat-input scale, 'a1': conv-1-input scale} from
    `calibrate_decoder_int8` (ignored when quantize=False).

    requant: how the s32->s8 pass between the convs is lowered —
    'xla' (the fused clamp/convert chain), 'pallas'
    (ops/pallas/requant.py tile kernel; same values bit-for-bit), or
    'auto' (= 'xla', the measured default).  The end-to-end A/B on v5e
    (PARITY.md §Performance, Pallas-requant end-to-end A/B) measured
    the two lowerings NEUTRAL at full-res b8 decoder-int8 serving
    (8.82 pallas vs 8.81 xla ms/image) — the kernel's isolated 1.2x
    (6.84 vs 8.10 ms, exp/requant_probe.py) does not move the
    end-to-end number, so 'auto' keeps the simpler custom-call-free
    lowering that also serializes for any platform.
    """
    if requant not in ("auto", "xla", "pallas"):
        raise ValueError("requant must be 'auto', 'xla' or 'pallas'")
    if requant == "auto":
        requant = "xla"
    w_low, b_low = fold_bn(dec_params["conv1"]["kernel"],
                           dec_params["bn1"], dec_stats["bn1"])
    w0, b0 = fold_bn(dec_params["last_conv_0"]["kernel"],
                     dec_params["last_bn_0"], dec_stats["last_bn_0"])
    w1, b1 = fold_bn(dec_params["last_conv_1"]["kernel"],
                     dec_params["last_bn_1"], dec_stats["last_bn_1"])
    kc = np.asarray(dec_params["classifier"]["kernel"], np.float32)
    bc = np.asarray(dec_params["classifier"]["bias"], np.float32)
    cd = compute_dtype
    pad1 = [(1, 1), (1, 1)]
    pad0 = [(0, 0), (0, 0)]

    if quantize:
        q0, sw0 = _quantize_weights(w0)
        q1, sw1 = _quantize_weights(w1)
        a0 = np.float32(scales["a0"])
        a1 = np.float32(scales["a1"])
        m0 = (a0 * sw0).astype(np.float32)
        m1 = (a1 * sw1).astype(np.float32)

    def quant_in(t):
        # input quantization for conv #0; elementwise, so it commutes with
        # the concat — applying it per branch BEFORE concatenation lets the
        # round/clip/cast fuse into each producer's epilogue (the resize
        # matmul, the low-path conv) and the 304-channel tensor only ever
        # materializes as int8, never as bf16
        return jnp.clip(jnp.round(t.astype(jnp.float32) / a0),
                        -127, 127).astype(jnp.int8)

    def tail(feat, low):
        low = _conv(low.astype(cd), jnp.asarray(w_low, cd), pad0,
                    jnp.float32).astype(cd) + jnp.asarray(b_low, cd)
        low = jnp.maximum(low, 0)
        x = resize_bilinear_align_corners(feat, low.shape[1:3], dtype=cd)
        if quantize:
            qy = jnp.concatenate([quant_in(x), quant_in(low)], axis=-1)
            s32 = _conv(qy, jnp.asarray(q0), pad1, jnp.int32)
            # clamp-to-[0,127] IS the ReLU + requant for conv #2.  Both
            # lowerings share the SAME pre-folded arithmetic
            # round(s32*(m0/a1) + b0/a1) — f32 multiplies are exact IEEE
            # ops, so 'xla' and 'pallas' agree bit-for-bit
            # (tests/test_quant.py::test_quant_requant_lowerings_agree).
            if requant == "pallas":
                from s2r_tpu.ops.pallas.requant import requant_s32_to_s8

                q2 = requant_s32_to_s8(s32, m0, b0, jnp.float32(1.0 / a1))
            else:
                from s2r_tpu.ops.pallas.requant import requant_xla

                inv_a1 = np.float32(1.0 / a1)
                q2 = requant_xla(s32, m0 * inv_a1, b0 * inv_a1)
            s32 = _conv(q2, jnp.asarray(q1), pad1, jnp.int32)
            z = s32.astype(jnp.float32) * m1 + b1
            z = jnp.maximum(z, 0).astype(cd)
        else:
            y = jnp.concatenate([x, low], axis=-1)
            z = _conv(y, jnp.asarray(w0, cd), pad1,
                      jnp.float32).astype(cd) + jnp.asarray(b0, cd)
            z = jnp.maximum(z, 0)
            z = _conv(z, jnp.asarray(w1, cd), pad1,
                      jnp.float32).astype(cd) + jnp.asarray(b1, cd)
            z = jnp.maximum(z, 0)
        logits = _conv(z, jnp.asarray(kc, cd), pad0, jnp.float32)
        return logits.astype(jnp.float32) + bc

    return tail


def calibrate_decoder_int8(deeplab, params, batch_stats,
                           batches: Iterable, *, input: str = "normalized"
                           ) -> Dict[str, float]:
    """Activation scales for the int8 decoder tail from calibration images.

    batches: iterable of image arrays in the given input format
    ('normalized' = eval-transform f32, 'rgb8' = raw bytes).  Runs the
    folded-f32 decoder path and records per-tensor max magnitudes of (a)
    the 304-channel concat feeding last_conv_0 and (b) the ReLU output
    feeding last_conv_1; scales are max/127 (symmetric).  Scales depend
    only on post-normalization activations, so calibrating with
    'normalized' images is valid for an 'rgb8' artifact.
    """
    from s2r_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

    deeplab = deeplab.clone(upsample_logits=False)
    variables = {"params": params, "batch_stats": batch_stats}
    dp, ds = params["decoder"], batch_stats["decoder"]
    w_low, b_low = fold_bn(dp["conv1"]["kernel"], dp["bn1"], ds["bn1"])
    w0, b0 = fold_bn(dp["last_conv_0"]["kernel"], dp["last_bn_0"],
                     ds["last_bn_0"])
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32) * 255.0
    std = jnp.asarray(IMAGENET_STD, jnp.float32) * 255.0
    pad1 = [(1, 1), (1, 1)]

    @jax.jit
    def stats(image):
        if input == "rgb8":
            image = (image.astype(jnp.float32) - mean) / std
        feat, low = backbone_taps(deeplab, variables, image)
        low = _conv(low.astype(jnp.float32), jnp.asarray(w_low),
                    [(0, 0), (0, 0)], jnp.float32) + b_low
        low = jnp.maximum(low, 0)
        x = resize_bilinear_align_corners(feat, low.shape[1:3],
                                          dtype=jnp.float32)
        y = jnp.concatenate([x, low], axis=-1)
        z = _conv(y, jnp.asarray(w0), pad1, jnp.float32) + b0
        z = jnp.maximum(z, 0)
        return jnp.max(jnp.abs(y)), jnp.max(z)

    m0 = m1 = 0.0
    count = 0
    for batch in batches:
        a, b = stats(jnp.asarray(batch))
        m0 = max(m0, float(a))
        m1 = max(m1, float(b))
        count += 1
    if count == 0:
        raise ValueError("calibration needs at least one image batch")
    if m0 <= 0.0 or m1 <= 0.0:
        raise ValueError(f"degenerate calibration maxima ({m0}, {m1}) — "
                         "are the calibration images all zero?")
    return {"a0": m0 / 127.0, "a1": m1 / 127.0}
