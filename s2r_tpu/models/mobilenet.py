"""MobileNetV2 backbone with atrous (dilated) depthwise-separable convs.

Capability parity with reference modeling/backbone/mobilenet.py:9-145:
- stem: 3x3 stride-2 conv + BN + ReLU6 (conv_bn, mobilenet.py:9-14)
- 17 InvertedResidual blocks per the (t, c, n, s) table (mobilenet.py:78-87)
- output_stride 16 (default) or 8: once the running stride reaches the target,
  later stages switch to stride 1 and accumulate dilation (mobilenet.py:94-102)
- returns (high_level [N,H/os,W/os,320], low_level [N,H/4,W/4,24]); the low
  split is after block 3 (mobilenet.py:116-117)

TPU-native notes:
- NHWC + HWIO; depthwise convs via feature_group_count=channels.
- The reference's `fixed_padding` before each block (mobilenet.py:62-63)
  pads the block *input*, so the expand BN's train-mode statistics include
  the resulting zero ring.  `pad_stats=True` (default) reproduces that
  exactly — see InvertedResidual — making one full train step match torch
  (test_train_step_parity.py); eval-mode logits are identical either way.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from s2r_tpu.models.layers import BatchNorm, Conv2d, relu6

# (expand_ratio t, out_channels c, repeats n, stride s) — mobilenet.py:78-87.
INVERTED_RESIDUAL_SETTING = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)

# Index of the last block included in the low-level feature path
# (reference takes features[0:4]: stem + 3 blocks — mobilenet.py:116).
LOW_LEVEL_SPLIT = 3


def block_plan(output_stride: int, width_mult: float = 1.0):
    """Static per-block (in_ch, out_ch, stride, dilation, expand) plan.

    Reproduces the stride/dilation bookkeeping of mobilenet.py:77-109: once
    the cumulative stride hits `output_stride`, subsequent stages use stride 1
    and the *previous* rate as dilation, multiplying the rate by the stage's
    nominal stride.
    """
    plan = []
    input_channel = int(32 * width_mult)
    current_stride = 2  # after stem
    rate = 1
    for t, c, n, s in INVERTED_RESIDUAL_SETTING:
        if current_stride == output_stride:
            stride, dilation = 1, rate
            rate *= s
        else:
            stride, dilation = s, 1
            current_stride *= s
        out_ch = int(c * width_mult)
        for i in range(n):
            plan.append((input_channel, out_ch, stride if i == 0 else 1,
                         dilation, t))
            input_channel = out_ch
    return plan


class InvertedResidual(nn.Module):
    """[1x1 expand + BN + ReLU6] -> 3x3 depthwise (stride/dilation) + BN +
    ReLU6 -> 1x1 project + BN, with identity residual when stride==1 and
    in==out (reference: mobilenet.py:26-68).

    pad_stats=True reproduces the reference's `fixed_padding`-before-the-
    block quirk (mobilenet.py:62-63): the block INPUT is zero-padded by
    `dilation`, so the bias-free 1x1 expand conv emits a zero ring, the
    expand BN computes its train-mode batch statistics over the padded
    extent, and the depthwise conv's effective padding value is the ring's
    post-BN/ReLU6 value rather than zero.  Eval-mode outputs are identical
    either way; training dynamics only match torch exactly with the ring
    included (full-train-step parity test).

    The ring is reproduced ANALYTICALLY, never materialized: a 1x1 conv
    commutes with zero-padding, so padded-extent BN statistics are the
    unpadded sums over a larger count (BatchNorm(zero_pad_width=d)) and the
    ring's constant value v = relu6(shift) enters the depthwise conv via
    conv(pad_v(x)) = conv(pad_0(x - v)) + v*sum(kernel) (Conv2d fill=).
    Tensors keep their unpadded (tile-friendly) shapes — exact semantics at
    zero cost.
    """

    out_ch: int
    stride: int
    dilation: int
    expand_ratio: int
    dtype: jnp.dtype = jnp.float32
    pad_stats: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        in_ch = x.shape[-1]
        hidden = int(round(in_ch * self.expand_ratio))
        use_res = self.stride == 1 and in_ch == self.out_ch
        d = self.dilation
        y = x
        fill = None
        if self.expand_ratio != 1:
            y = Conv2d(hidden, 1, dtype=self.dtype, name="expand_conv")(y)
            if self.pad_stats:
                y, ring = BatchNorm(dtype=self.dtype, name="expand_bn")(
                    y, not train, zero_pad_width=d)
                fill = relu6(ring)
            else:
                y = BatchNorm(dtype=self.dtype, name="expand_bn")(y, not train)
            y = relu6(y)
        y = Conv2d(hidden, 3, stride=self.stride, padding=d,
                   dilation=d, groups=hidden, dtype=self.dtype,
                   name="dw_conv")(y, fill=fill)
        y = BatchNorm(dtype=self.dtype, name="dw_bn")(y, not train)
        y = relu6(y)
        y = Conv2d(self.out_ch, 1, dtype=self.dtype, name="project_conv")(y)
        y = BatchNorm(dtype=self.dtype, name="project_bn")(y, not train)
        return x + y if use_res else y


class MobileNetV2(nn.Module):
    output_stride: int = 16
    width_mult: float = 1.0
    dtype: jnp.dtype = jnp.float32
    # Rematerialize each InvertedResidual in the backward pass.  The step is
    # HBM-bandwidth-bound (XLA cost analysis: ~103 GB/step at 512x1024
    # batch 8, ~10 GB stored temporaries); dropping the 6x-expanded hidden
    # activations trades spare MXU FLOPs for the scarce resource.
    remat: bool = False
    pad_stats: bool = True  # reference fixed_padding BN-statistics quirk
    # Lower the 3x3/s2 stem via space-to-depth (ops/s2d.py): the C=3 input
    # pads 3 -> 128 lanes in the conv operand layout; the s2d input carries
    # 12.  Same parameter/checkpoints; exact math (f32-accum reassociation
    # only); silently falls back to the direct conv on odd H/W.
    stem_s2d: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: [N, H, W, 3] -> (high [N,H/os,W/os,320], low [N,H/4,W/4,24])."""
        stem_ch = int(32 * self.width_mult)
        y = Conv2d(stem_ch, 3, stride=2, padding=1, dtype=self.dtype,
                   s2d=self.stem_s2d, name="features_0_conv")(x)
        y = BatchNorm(dtype=self.dtype, name="features_0_bn")(y, not train)
        y = relu6(y)

        block_cls = (nn.remat(InvertedResidual, static_argnums=(2,))
                     if self.remat else InvertedResidual)
        low = None
        for i, (_, out_ch, stride, dilation, t) in enumerate(
                block_plan(self.output_stride, self.width_mult)):
            y = block_cls(out_ch=out_ch, stride=stride,
                          dilation=dilation, expand_ratio=t,
                          dtype=self.dtype, pad_stats=self.pad_stats,
                          name=f"features_{i + 1}")(y, train)
            if i == LOW_LEVEL_SPLIT - 1:
                low = y
        return y, low
