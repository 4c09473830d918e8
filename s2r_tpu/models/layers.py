"""NHWC primitive layers with torch-compatible initialization and semantics.

These are the building blocks of the model zoo.  Initialization mirrors the
reference so that training dynamics match:
- `kaiming_normal`: torch.nn.init.kaiming_normal_ with defaults
  (fan_in, leaky_relu a=0 => std = sqrt(2/fan_in)); used by every module that
  calls `_init_weight` (reference: mobilenet.py:134-145, assp.py:80-91,
  decoder.py:45-54, domian.py:35-44).
- `torch_default`: torch Conv2d.reset_parameters (kaiming_uniform a=sqrt(5)
  => U(+-1/sqrt(fan_in)) for weight and bias); used by FCDiscriminator, which
  never re-initializes (reference: discriminator.py:6-35).

BatchNorm reproduces torch BatchNorm2d / the vendored SynchronizedBatchNorm2d
statistics rules (reference: modeling/sync_batchnorm/batchnorm.py:113-125):
biased variance for normalization, unbiased for the running estimate,
`running = (1 - momentum) * running + momentum * batch` with momentum 0.1.

Cross-replica synchronization is implicit: under a jitted, batch-sharded
(GSPMD) train step, jnp.mean over the batch axis IS the global mean — XLA
inserts the ICI all-reduce.  This single module therefore covers both the
reference's nn.BatchNorm2d and its entire sync_batchnorm/ package.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

Dtype = jnp.dtype


def _pair(v) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))


def kaiming_normal_conv_init(key, shape, dtype=jnp.float32):
    """torch kaiming_normal_ for an HWIO conv kernel: N(0, 2/fan_in)."""
    kh, kw, in_pg, _ = shape
    fan_in = kh * kw * in_pg
    std = (2.0 / fan_in) ** 0.5
    return std * jax.random.normal(key, shape, dtype)


def torch_default_conv_init(key, shape, dtype=jnp.float32):
    """torch Conv2d default weight init: U(+-1/sqrt(fan_in))."""
    kh, kw, in_pg, _ = shape
    bound = 1.0 / (kh * kw * in_pg) ** 0.5
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


class Conv2d(nn.Module):
    """2-D convolution on NHWC inputs with an HWIO kernel.

    `padding` is a symmetric int per spatial dim (torch-style).  The
    reference's `fixed_padding` (mobilenet.py:17-23) always produces the
    symmetric pad (d, d) for its 3x3 kernels, so a plain symmetric pad is
    exact.  Accumulation runs in f32 on the MXU regardless of compute dtype.
    """

    features: int
    kernel_size: Union[int, Tuple[int, int]]
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    dilation: Union[int, Tuple[int, int]] = 1
    groups: int = 1
    use_bias: bool = False
    weight_init: str = "kaiming_normal"  # or 'torch_default'
    dtype: Dtype = jnp.float32  # compute dtype
    s2d: bool = False  # 4x4/s2/p1 and 3x3/s2/p1 convs (even H/W only):
    # space-to-depth formulation (ops/s2d.py) — exact numerics, param shape
    # unchanged.  Measured SLOWER on the discriminator's 4x4 convs in the
    # 512x1024 train step (see ops/s2d.py); the 3x3 variant targets the
    # C=3 backbone stem where the 3->128 lane pad dominates.  Off by
    # default.
    pallas_wminor: bool = False  # 4x4/s2/p1 biased convs only: Pallas
    # kernel consuming the producer's W-minor layout (ops/pallas/
    # disc_conv.py) — kills the 19->128 lane-pad relayout at the
    # discriminator input.  Param shapes unchanged; off by default.

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 fill: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """`fill` ([C] per-channel constants, depthwise only): convolve as
        if the padding ring held `fill` instead of zeros, WITHOUT
        materializing a padded tensor:  conv(pad_v(x)) = conv(pad_0(x - v))
        + v * sum(kernel).  Used for the reference's fixed_padding BN
        quirk (models/mobilenet.py) at zero cost."""
        kh, kw = _pair(self.kernel_size)
        # A tuple/list input means "convolve the channel-concat of these
        # WITHOUT materializing it": conv is linear in input channels, so
        # conv(concat(xs), K) == sum_i conv(xs[i], K[:, :, off_i:off_i+c_i]).
        # The parameter keeps the full concat kernel shape, so checkpoints
        # and torch import/export are unchanged.  Parts whose spatial dims
        # are [1, 1] (1x1 convs only) broadcast into the sum — the ASPP
        # global-pool branch's contribution is spatially constant, so it is
        # computed at [N,1,1,C] instead of full feature resolution.
        # Float-sum reassociation only (concat-order arithmetic regrouped).
        xs = tuple(x) if isinstance(x, (tuple, list)) else None
        if xs is not None:
            in_ch = sum(int(a.shape[-1]) for a in xs)
        else:
            in_ch = x.shape[-1]
        assert in_ch % self.groups == 0, (in_ch, self.groups)
        kshape = (kh, kw, in_ch // self.groups, self.features)
        init = {"kaiming_normal": kaiming_normal_conv_init,
                "torch_default": torch_default_conv_init}[self.weight_init]
        kernel = self.param("kernel", init, kshape)
        ph, pw = _pair(self.padding)
        if xs is not None:
            assert (self.groups == 1 and fill is None and not self.s2d
                    and not self.pallas_wminor), \
                "split-concat conv: grouped/filled/s2d/pallas unsupported"
            full_hw = max((a.shape[1:3] for a in xs),
                          key=lambda s: s[0] * s[1])
            y = None
            off = 0
            for a in xs:
                c = int(a.shape[-1])
                if a.shape[1:3] == (1, 1) and (kh, kw) != (1, 1):
                    raise ValueError("[1,1]-spatial split part needs a "
                                     "1x1 kernel to broadcast")
                if a.shape[1:3] not in ((1, 1), full_hw):
                    raise ValueError(
                        f"split part spatial {a.shape[1:3]} must match "
                        f"{full_hw} (or be [1,1] under a 1x1 kernel)")
                part = lax.conv_general_dilated(
                    a.astype(self.dtype),
                    kernel[:, :, off:off + c, :].astype(self.dtype),
                    window_strides=_pair(self.stride),
                    padding=((ph, ph), (pw, pw)),
                    rhs_dilation=_pair(self.dilation),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=1,
                )
                y = part if y is None else y + part
                off += c
            assert off == in_ch
            if self.use_bias:
                bias = self.param("bias", self._bias_init(kh, kw, in_ch),
                                  (self.features,))
                y = y + bias.astype(y.dtype)
            return y.astype(self.dtype)
        xin = x.astype(self.dtype)
        if fill is not None:
            assert self.groups == in_ch and self.features == in_ch, \
                "fill is only defined for depthwise convs"
            xin = xin - fill.astype(self.dtype)
        is_4x4s2p1 = ((kh, kw) == (4, 4) and _pair(self.stride) == (2, 2)
                      and (ph, pw) == (1, 1)
                      and _pair(self.dilation) == (1, 1)
                      and self.groups == 1
                      and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0)
        # 3x3/s2/p1 (the backbone stems): same trade, 2x2/s1 kernel in s2d
        # space (ops/s2d.py::conv3x3s2_via_s2d).  Falls back to the direct
        # conv on odd spatial dims (e.g. 513x513 crops).
        is_3x3s2p1 = ((kh, kw) == (3, 3) and _pair(self.stride) == (2, 2)
                      and (ph, pw) == (1, 1)
                      and _pair(self.dilation) == (1, 1)
                      and self.groups == 1 and fill is None
                      and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0)
        use_s2d = self.s2d and (is_4x4s2p1 or is_3x3s2p1)
        if self.pallas_wminor and is_4x4s2p1 and self.use_bias:
            from s2r_tpu.ops.pallas import disc_conv
            bias = self.param("bias", self._bias_init(kh, kw, in_ch),
                              (self.features,))
            # NHWC -> NHCW: a layout no-op when the producer is W-minor
            # (the kernel's operand layout IS W-minor; see disc_conv.py).
            y = disc_conv.disc_conv1(jnp.transpose(xin, (0, 1, 3, 2)),
                                     kernel.astype(self.dtype),
                                     bias.astype(self.dtype),
                                     disc_conv.INTERPRET)
            return y.astype(self.dtype)
        if use_s2d:
            from s2r_tpu.ops.s2d import conv3x3s2_via_s2d, conv4x4s2_via_s2d
            lower = conv4x4s2_via_s2d if is_4x4s2p1 else conv3x3s2_via_s2d
            y = lower(xin, kernel.astype(self.dtype))
        else:
            # No explicit preferred_element_type: the TPU MXU accumulates
            # bf16 operands in f32 internally, and a widened output dtype
            # breaks the conv VJP (mixed-dtype transposed conv).
            y = lax.conv_general_dilated(
                xin,
                kernel.astype(self.dtype),
                window_strides=_pair(self.stride),
                padding=((ph, ph), (pw, pw)),
                rhs_dilation=_pair(self.dilation),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.groups,
            )
        if fill is not None:
            ksum = jnp.sum(kernel, axis=(0, 1, 2))  # [C] for depthwise
            y = y + (fill.astype(jnp.float32)
                     * ksum.astype(jnp.float32)).astype(y.dtype)
        if self.use_bias:
            bias = self.param("bias", self._bias_init(kh, kw, in_ch),
                              (self.features,))
            y = y + bias.astype(y.dtype)
        return y.astype(self.dtype)

    def _bias_init(self, kh: int, kw: int, in_ch: int):
        fan_in = kh * kw * (in_ch // self.groups)
        bound = 1.0 / fan_in ** 0.5

        def bias_init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        return bias_init


_BN_IMPL = "xla"  # 'xla' | 'pallas' | 'pallas_interpret' (process-wide)

# Number of REAL samples in a padded batch (None = all real).  XLA's TPU
# layouts put N in the 8-wide sublane dim: a per-chip batch that is not a
# multiple of 8 costs up to 2.6x throughput (see CLAUDE.md), so the train
# step may pad the batch with dummy samples and mask them out of every
# cross-sample reduction.  BatchNorm reads this at TRACE time (the step
# factories set it via `bn_real_batch` around their model applies), so stats
# are computed over the first k samples only — exact small-batch semantics
# at padded-batch speed.
_BN_REAL_N = None


class bn_real_batch:
    """Context manager: trace BatchNorm stats over the first `n` samples."""

    def __init__(self, n):
        self.n = n

    def __enter__(self):
        global _BN_REAL_N
        self._prev = _BN_REAL_N
        _BN_REAL_N = self.n

    def __exit__(self, *exc):
        global _BN_REAL_N
        _BN_REAL_N = self._prev


def set_bn_impl(impl: str) -> None:
    """Select the training-mode BN implementation for subsequently *traced*
    programs.  'pallas' uses the fused single-pass reduction kernels
    (ops/pallas/batchnorm.py) — single-device only (the kernel reduces over
    the local array; a GSPMD-sharded step must keep 'xla', whose reductions
    become cross-chip psums automatically)."""
    assert impl in ("xla", "pallas", "pallas_interpret"), impl
    global _BN_IMPL
    _BN_IMPL = impl


class BatchNorm(nn.Module):
    """BatchNorm2d with torch statistics semantics (see module docstring).

    Train mode normalizes with biased batch variance computed in f32 over
    (N, H, W) and updates running stats; eval mode uses running stats.
    Under GSPMD data parallelism the batch reductions are global (synced).
    """

    momentum: float = 0.1
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool,
                 zero_pad_width: int = 0):
        """zero_pad_width=d computes statistics AS IF x were zero-padded by
        d on both spatial dims (without materializing the padding) and
        additionally returns the per-channel value the padding ring takes
        after normalization — the analytic form of the reference's
        fixed_padding BN quirk (models/mobilenet.py).  Returns y, or
        (y, ring) when zero_pad_width > 0."""
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((features,), jnp.float32))
        d = zero_pad_width

        # Statistics accumulate in f32 (reduction dtype), but the per-element
        # normalization runs in the compute dtype so no f32 copy of the
        # activation is ever materialized or saved as a backward residual —
        # the step is HBM-bandwidth-bound and BN touches every activation.
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
            inv = lax.rsqrt(var + self.eps) * scale
            shift = bias - mean * inv
            y = x * inv.astype(x.dtype) + shift.astype(x.dtype)
            if d:
                return y.astype(self.dtype), shift
            return y.astype(self.dtype)

        real_n = _BN_REAL_N
        if real_n is not None and real_n >= x.shape[0]:
            real_n = None  # nothing padded

        if d == 0 and real_n is None and _BN_IMPL.startswith("pallas") \
                and not self.is_initializing():
            from s2r_tpu.ops.pallas.batchnorm import batch_norm_train

            y, mean, var = batch_norm_train(
                x, scale, bias, self.eps,
                _BN_IMPL == "pallas_interpret")
            shift = None
        else:
            # Single pass: E[x] and E[x^2] reduce together over one read of
            # x; the >=f32 casts fuse into the reduction (no widened copy
            # lands in HBM).
            stat_t = jnp.promote_types(x.dtype, jnp.float32)
            x32 = x.astype(stat_t)
            if real_n is not None:
                # padded batch: zero the dummy samples inside the reduction
                # pass and divide by the real count (w in {0,1}, so
                # square(x*w) == square(x)*w — one masked copy serves both
                # sums and never lands in HBM).
                wm = (jnp.arange(x.shape[0]) < real_n).astype(stat_t)
                x32 = x32 * wm[:, None, None, None]
                denom = real_n * x.shape[1] * x.shape[2]
                mean = jnp.sum(x32, axis=(0, 1, 2)) / denom
                mean2 = jnp.sum(jnp.square(x32), axis=(0, 1, 2)) / denom
            else:
                mean = jnp.mean(x32, axis=(0, 1, 2))
                mean2 = jnp.mean(jnp.square(x32), axis=(0, 1, 2))
            if d:
                # zero-padded-extent statistics: sums are unchanged, the
                # pixel count grows by the ring
                h, w = x.shape[1], x.shape[2]
                r = (h * w) / ((h + 2 * d) * (w + 2 * d))
                mean = mean * r
                mean2 = mean2 * r
            var = mean2 - jnp.square(mean)
            inv = lax.rsqrt(var + self.eps) * scale.astype(stat_t)
            shift = bias.astype(stat_t) - mean * inv
            y = x * inv.astype(x.dtype) + shift.astype(x.dtype)
        if not self.is_initializing():
            # Unbiased variance feeds the running estimate
            # (reference: batchnorm.py:113-125).
            n_real = x.shape[0] if real_n is None else real_n
            n = n_real * (x.shape[1] + 2 * d) * (x.shape[2] + 2 * d)
            unbiased = var * (n / max(n - 1, 1))
            m = self.momentum
            ra_mean.value = (1 - m) * ra_mean.value + m * mean
            ra_var.value = (1 - m) * ra_var.value + m * unbiased
        if d:
            return y.astype(self.dtype), shift
        return y.astype(self.dtype)


def relu(x):
    return jnp.maximum(x, 0)


@jax.custom_jvp
def relu6(x):
    """ReLU6 with torch's hardtanh subgradient: d/dx = 1 iff 0 < x < 6
    (STRICT — zero at the kinks).

    This matters: the reference's fixed_padding structure parks thousands of
    activations *exactly* on the x=0 kink (the padded rings), where JAX's
    default clip/max tie-breaking picks a different subgradient than torch
    and training dynamics diverge (found by finite-difference arbitration in
    the full-train-step parity work)."""
    return jnp.clip(x, 0, 6)


@relu6.defjvp
def _relu6_jvp(primals, tangents):
    (x,), (t,) = primals, tangents
    y = jnp.clip(x, 0, 6)
    mask = (x > 0) & (x < 6)
    return y, jnp.where(mask, t, 0).astype(t.dtype)


def leaky_relu(x, negative_slope=0.2):
    return jnp.where(x >= 0, x, negative_slope * x)


from functools import partial


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _rng_dropout(x, key, keep: float):
    mask = jax.random.bernoulli(key, p=keep, shape=x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def _rng_dropout_fwd(x, key, keep: float):
    # Save ONLY the key: the mask (a [8,H,W,C] pred tensor on the hot path)
    # is regenerated in the backward pass.  RNG bits are nearly free on the
    # TPU (rbg impl) while the saved mask costs an HBM write + read + the
    # layout copies XLA inserts between fwd/bwd fusions.
    return _rng_dropout(x, key, keep), key


def _rng_dropout_bwd(keep: float, key, g):
    mask = jax.random.bernoulli(key, p=keep, shape=g.shape)
    return (jnp.where(mask, g / keep, jnp.zeros_like(g)), None)


_rng_dropout.defvjp(_rng_dropout_fwd, _rng_dropout_bwd)


# A/B switch (exp/perf_ablate.py 'maskdrop' arm): True = let autodiff save
# the forward mask (the formulation the recompute path was measured
# against); False (default) = recompute it in the backward pass.
DROPOUT_SAVE_MASK = False


class Dropout(nn.Module):
    """Element-wise dropout (reference uses nn.Dropout, not Dropout2d).

    Forward/backward values are the torch ones (mask ~ Bernoulli(keep),
    kept elements scaled by 1/keep; grad passes through kept elements only).
    The backward mask is recomputed from the same RNG key rather than saved
    (see _rng_dropout_fwd) — a pure memory-traffic optimization with
    bit-identical semantics."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool):
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        if DROPOUT_SAVE_MASK:
            mask = jax.random.bernoulli(rng, p=keep, shape=x.shape)
            return jnp.where(mask, x / keep, jnp.zeros_like(x))
        return _rng_dropout(x, rng, keep)
