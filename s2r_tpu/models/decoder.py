"""DeepLab-V3+ decoder.

Capability parity with reference modeling/decoder.py:7-57:
- low-level path: 1x1 conv 24->48 + BN + ReLU (decoder.py:19-21,35-37)
- upsample the ASPP output to the low-level spatial size (align-corners
  bilinear) and concat -> 304 channels (decoder.py:39-40)
- head: 3x3 (304->256) + BN + ReLU + Dropout(0.5), 3x3 (256->256) + BN + ReLU
  + Dropout(0.1), 1x1 -> num_classes with bias (decoder.py:22-30)
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from s2r_tpu.models.layers import BatchNorm, Conv2d, Dropout, relu
from s2r_tpu.ops.resize import resize_bilinear_align_corners

LOW_LEVEL_INPLANES = {"mobilenet": 24, "resnet": 256, "xception": 128, "drn": 256}


class Decoder(nn.Module):
    num_classes: int = 19
    backbone: str = "mobilenet"
    dtype: jnp.dtype = jnp.float32
    # Skip materializing the 304-channel concat: feed (upsampled ASPP,
    # low-level) to the first head conv as a split-kernel sum
    # (models/layers.py Conv2d tuple input).  Same parameters/checkpoints;
    # float-sum reassociation only.
    split_concat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, low_level_feat: jnp.ndarray,
                 train: bool) -> jnp.ndarray:
        """(x [N,h,w,256], low [N,4h,4w,24]) -> logits [N,4h,4w,num_classes]."""
        low = Conv2d(48, 1, dtype=self.dtype, name="conv1")(low_level_feat)
        low = BatchNorm(dtype=self.dtype, name="bn1")(low, not train)
        low = relu(low)

        x = resize_bilinear_align_corners(x, low.shape[1:3])
        y = (x, low) if self.split_concat \
            else jnp.concatenate([x, low], axis=-1)

        y = Conv2d(256, 3, padding=1, dtype=self.dtype, name="last_conv_0")(y)
        y = BatchNorm(dtype=self.dtype, name="last_bn_0")(y, not train)
        y = relu(y)
        y = Dropout(0.5, name="drop_0")(y, deterministic=not train)
        y = Conv2d(256, 3, padding=1, dtype=self.dtype, name="last_conv_1")(y)
        y = BatchNorm(dtype=self.dtype, name="last_bn_1")(y, not train)
        y = relu(y)
        y = Dropout(0.1, name="drop_1")(y, deterministic=not train)
        y = Conv2d(self.num_classes, 1, use_bias=True, dtype=self.dtype,
                   name="classifier")(y)
        return y
