"""Aligned Xception backbone (DeepLab-V3+ variant).

The reference's backbone factory dispatches on 'xception'
(modeling/backbone/__init__.py:6-7) but ships no xception module — selecting
it crashes with a NameError.  This is a working TPU-native implementation of
the backbone that factory promises, following the standard DeepLab-V3+
Aligned Xception recipe (Chen et al., arXiv:1802.02611 §4; the modified
Xception-65 with atrous separable convs):

- Entry flow: 3x3/2 conv(32) + 3x3 conv(64), then three residual blocks of
  separable convs to 128 / 256 / 728 channels (strides 2 / 2 / s, where the
  third block's stride realizes the output stride); the 128-channel block-1
  output at H/4 is the decoder's low-level feature (the reference's Decoder
  allocates low_level_inplanes=128 for 'xception', decoder.py:12-13).
- Middle flow: 16 residual blocks of three 728-channel separable convs at
  the middle dilation.
- Exit flow: one residual block (728 -> 1024) + three separable convs
  1536 -> 1536 -> 2048 at the exit dilation; the 2048-channel output feeds
  ASPP ('else' inplanes=2048, assp.py:41-42).
- output_stride 16: entry-3 stride 2, dilations (1, 2); output_stride 8:
  entry-3 stride 1, middle dilation 2, exit dilations (2, 4).

Separable convs pad symmetrically by their dilation (the fixed_padding
rule, reference mobilenet.py:17-23 — exact for 3x3 kernels).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from s2r_tpu.models.layers import BatchNorm, Conv2d, relu


class SeparableConv(nn.Module):
    """3x3 depthwise (+BN) then 1x1 pointwise: the Aligned Xception
    separable conv, which batch-normalizes between the two convs."""

    features: int
    stride: int = 1
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        c = x.shape[-1]
        x = Conv2d(c, 3, stride=self.stride, padding=self.dilation,
                   dilation=self.dilation, groups=c, dtype=self.dtype,
                   name="dw")(x)
        x = BatchNorm(dtype=self.dtype, name="dw_bn")(x, not train)
        x = Conv2d(self.features, 1, dtype=self.dtype, name="pw")(x)
        return x


class XceptionBlock(nn.Module):
    """reps separable convs with a residual connection (1x1 conv + BN skip
    when channels or stride change)."""

    features: int
    reps: int
    stride: int = 1
    dilation: int = 1
    start_with_relu: bool = True
    grow_first: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        in_ch = x.shape[-1]
        y = x
        widths = [self.features] * self.reps
        if not self.grow_first:
            widths = [in_ch] * (self.reps - 1) + [self.features]
        for r, w in enumerate(widths):
            if r > 0 or self.start_with_relu:
                y = relu(y)
            stride = self.stride if r == self.reps - 1 else 1
            y = SeparableConv(w, stride=stride, dilation=self.dilation,
                              dtype=self.dtype, name=f"sep{r + 1}")(y, train)
            y = BatchNorm(dtype=self.dtype, name=f"bn{r + 1}")(y, not train)
        if self.stride != 1 or in_ch != self.features:
            sc = Conv2d(self.features, 1, stride=self.stride,
                        dtype=self.dtype, name="skip_conv")(x)
            sc = BatchNorm(dtype=self.dtype, name="skip_bn")(sc, not train)
        else:
            sc = x
        return y + sc


class AlignedXception(nn.Module):
    output_stride: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.output_stride == 16:
            entry3_stride, mid_dil, exit_dil = 2, 1, (1, 2)
        elif self.output_stride == 8:
            entry3_stride, mid_dil, exit_dil = 1, 2, (2, 4)
        else:
            raise NotImplementedError(self.output_stride)

        # entry flow
        x = Conv2d(32, 3, stride=2, padding=1, dtype=self.dtype,
                   name="conv1")(x)
        x = BatchNorm(dtype=self.dtype, name="bn1")(x, not train)
        x = relu(x)
        x = Conv2d(64, 3, padding=1, dtype=self.dtype, name="conv2")(x)
        x = BatchNorm(dtype=self.dtype, name="bn2")(x, not train)
        x = relu(x)

        x = XceptionBlock(128, 2, stride=2, start_with_relu=False,
                          dtype=self.dtype, name="block1")(x, train)
        low_level = relu(x)  # [N, H/4, W/4, 128]
        x = XceptionBlock(256, 2, stride=2, dtype=self.dtype,
                          name="block2")(x, train)
        x = XceptionBlock(728, 2, stride=entry3_stride, dtype=self.dtype,
                          name="block3")(x, train)

        # middle flow
        for i in range(16):
            x = XceptionBlock(728, 3, dilation=mid_dil, dtype=self.dtype,
                              name=f"block{i + 4}")(x, train)

        # exit flow
        x = XceptionBlock(1024, 2, dilation=exit_dil[0], grow_first=False,
                          dtype=self.dtype, name="block20")(x, train)
        x = relu(x)
        for w, name in ((1536, "conv3"), (1536, "conv4"), (2048, "conv5")):
            x = SeparableConv(w, dilation=exit_dil[1], dtype=self.dtype,
                              name=name)(x, train)
            x = BatchNorm(dtype=self.dtype, name=f"{name}_bn")(x, not train)
            x = relu(x)
        return x, low_level
