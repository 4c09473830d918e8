"""Atrous Spatial Pyramid Pooling (DeepLab-V3+).

Capability parity with reference modeling/assp.py:7-95:
- four parallel branches: 1x1 + three 3x3 atrous convs with dilations
  [1, 6, 12, 18] at output_stride 16 / [1, 12, 24, 36] at os 8 (assp.py:43-48),
  each Conv -> BN -> ReLU
- a global-average-pool branch: GAP -> 1x1 conv -> BN -> ReLU, upsampled back
  to the feature size with align_corners bilinear (assp.py:55-58,70-71); from
  a 1x1 source that resize is an exact broadcast
- concat (5*256 ch) -> 1x1 conv to 256 -> BN -> ReLU -> Dropout(0.5)
  (assp.py:59-62,72-78)
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from s2r_tpu.models.layers import BatchNorm, Conv2d, Dropout, relu

ASPP_INPLANES = {"mobilenet": 320, "resnet": 2048, "xception": 2048, "drn": 512}


class ASPPBranch(nn.Module):
    kernel_size: int
    dilation: int
    features: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        pad = 0 if self.kernel_size == 1 else self.dilation
        y = Conv2d(self.features, self.kernel_size, padding=pad,
                   dilation=self.dilation, dtype=self.dtype,
                   name="atrous_conv")(x)
        y = BatchNorm(dtype=self.dtype, name="bn")(y, not train)
        return relu(y)


class ASPP(nn.Module):
    backbone: str = "mobilenet"
    output_stride: int = 16
    dtype: jnp.dtype = jnp.float32
    # Skip materializing the 5x256=1280-channel concat: feed the branches
    # to the projection conv as a split-kernel sum (models/layers.py Conv2d
    # tuple input), with the global-pool branch kept at [N,1,1,256] so its
    # spatially-constant contribution is computed once and broadcast into
    # the sum.  Same parameters/checkpoints; float-sum reassociation only.
    split_concat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        """x: [N, h, w, 320] -> [N, h, w, 256]."""
        if self.output_stride == 16:
            dilations = (1, 6, 12, 18)
        elif self.output_stride == 8:
            dilations = (1, 12, 24, 36)
        else:
            raise NotImplementedError(self.output_stride)

        x1 = ASPPBranch(1, dilations[0], dtype=self.dtype, name="aspp1")(x, train)
        x2 = ASPPBranch(3, dilations[1], dtype=self.dtype, name="aspp2")(x, train)
        x3 = ASPPBranch(3, dilations[2], dtype=self.dtype, name="aspp3")(x, train)
        x4 = ASPPBranch(3, dilations[3], dtype=self.dtype, name="aspp4")(x, train)

        # Global-average-pool branch; align-corners upsample of a 1x1 map is a
        # broadcast (assp.py:55-58,70-71).
        g = jnp.mean(x, axis=(1, 2), keepdims=True,
                     dtype=jnp.promote_types(x.dtype, jnp.float32))
        g = g.astype(self.dtype)
        g = Conv2d(256, 1, dtype=self.dtype, name="gap_conv")(g)
        g = BatchNorm(dtype=self.dtype, name="gap_bn")(g, not train)
        g = relu(g)
        if self.split_concat:
            y = Conv2d(256, 1, dtype=self.dtype,
                       name="conv1")((x1, x2, x3, x4, g))
        else:
            x5 = jnp.broadcast_to(g, x4.shape[:3] + (g.shape[-1],))
            y = jnp.concatenate([x1, x2, x3, x4, x5], axis=-1)
            y = Conv2d(256, 1, dtype=self.dtype, name="conv1")(y)
        y = BatchNorm(dtype=self.dtype, name="bn1")(y, not train)
        y = relu(y)
        y = Dropout(0.5, name="dropout")(y, deterministic=not train)
        return y
