"""ResNet-101 backbone with atrous layer3/layer4 (DeepLab-V3+ variant).

The reference's backbone factory dispatches on 'resnet'
(backbone/__init__.py:4-5) but ships no resnet module — selecting it crashes
with a NameError.  This is a working TPU-native implementation of the
backbone that factory promises, following the standard DeepLab ResNet-101
recipe (Chen et al., arXiv:1802.02611):

- stem: 7x7/2 conv(64) + BN + ReLU + 3x3/2 max-pool
- layer1 3x Bottleneck(64->256), layer2 4x(128->512) /2,
  layer3 23x(256->1024), layer4 3x(512->2048) with multi-grid (1, 2, 4)
- output_stride 16: layer4 stride 1 with dilation 2;
  output_stride 8: layer3 dilation 2, layer4 dilation 4
- returns (high [N, H/os, W/os, 2048], low = layer1 output [N, H/4, W/4,
  256]) — matching the channel counts the reference's ASPP ('else'
  inplanes=2048, assp.py:42) and Decoder (low_level_inplanes=256,
  decoder.py:10-11) already allocate for 'resnet'.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from s2r_tpu.models.layers import BatchNorm, Conv2d, relu

LAYER_BLOCKS = {"resnet101": (3, 4, 23, 3), "resnet50": (3, 4, 6, 3)}
MULTI_GRID = (1, 2, 4)


def max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    """torch MaxPool2d(kernel_size=3, stride=2, padding=1).

    The -inf init value is what routes this to XLA's differentiable
    max-pool reduction (a finite init falls back to a generic, non-
    differentiable reduce_window)."""
    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        window_dimensions=(1, 3, 3, 1), window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)))


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        out_ch = self.planes * 4
        y = Conv2d(self.planes, 1, dtype=self.dtype, name="conv1")(x)
        y = BatchNorm(dtype=self.dtype, name="bn1")(y, not train)
        y = relu(y)
        y = Conv2d(self.planes, 3, stride=self.stride, padding=self.dilation,
                   dilation=self.dilation, dtype=self.dtype, name="conv2")(y)
        y = BatchNorm(dtype=self.dtype, name="bn2")(y, not train)
        y = relu(y)
        y = Conv2d(out_ch, 1, dtype=self.dtype, name="conv3")(y)
        y = BatchNorm(dtype=self.dtype, name="bn3")(y, not train)
        if self.downsample:
            sc = Conv2d(out_ch, 1, stride=self.stride, dtype=self.dtype,
                        name="downsample_conv")(x)
            sc = BatchNorm(dtype=self.dtype, name="downsample_bn")(sc,
                                                                   not train)
        else:
            sc = x
        return relu(y + sc)


class ResNet(nn.Module):
    depth: str = "resnet101"
    output_stride: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        blocks = LAYER_BLOCKS[self.depth]
        if self.output_stride == 16:
            strides, dilations = (1, 2, 2, 1), (1, 1, 1, 2)
        elif self.output_stride == 8:
            strides, dilations = (1, 2, 1, 1), (1, 1, 2, 4)
        else:
            raise NotImplementedError(self.output_stride)

        y = Conv2d(64, 7, stride=2, padding=3, dtype=self.dtype,
                   name="conv1")(x)
        y = BatchNorm(dtype=self.dtype, name="bn1")(y, not train)
        y = relu(y)
        y = max_pool_3x3_s2(y)

        low = None
        planes = (64, 128, 256, 512)
        for li in range(4):
            multi_grid = MULTI_GRID if li == 3 else None
            for bi in range(blocks[li]):
                stride = strides[li] if bi == 0 else 1
                dil = dilations[li]
                if multi_grid is not None:
                    dil = dilations[li] * multi_grid[min(bi,
                                                         len(multi_grid) - 1)]
                in_ch = y.shape[-1]
                down = bi == 0 and (strides[li] != 1
                                    or in_ch != planes[li] * 4)
                y = Bottleneck(planes=planes[li], stride=stride,
                               dilation=dil, downsample=down,
                               dtype=self.dtype,
                               name=f"layer{li + 1}_{bi}")(y, train)
            if li == 0:
                low = y
        return y, low
