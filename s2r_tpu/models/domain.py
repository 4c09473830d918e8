"""Feature-space pixel-wise domain classifier ("FCN in the wild" style).

Capability parity with reference modeling/domian.py:7-47 (typo'd filename
"domian" intentionally not reproduced): operates on the 256-channel ASPP
output; 1x1 -> 1024 + BN + ReLU + Dropout(0.5), 3x3 -> 1024 + BN + ReLU +
Dropout(0.5), 3x3 -> 2 logits (source/target per spatial position).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from s2r_tpu.models.layers import BatchNorm, Conv2d, Dropout, relu


class DomainClassifier(nn.Module):
    backbone: str = "mobilenet"
    level: str = "high"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """x: [N, h, w, 256] -> domain logits [N, h, w, 2].

        The reference guards (backbone == mobilenet, level == 'high')
        because it hardcodes in_channel=256 (domian.py:10-13); here the
        input is always the 256-channel ASPP output regardless of backbone,
        so every implemented backbone is accepted.  Non-'high' levels would
        need a different tap point and stay unimplemented, as upstream."""
        if self.level != "high":
            raise NotImplementedError((self.backbone, self.level))
        y = Conv2d(1024, 1, dtype=self.dtype, name="adnn1_conv")(x)
        y = BatchNorm(dtype=self.dtype, name="adnn1_bn")(y, not train)
        y = relu(y)
        y = Dropout(0.5, name="adnn1_drop")(y, deterministic=not train)
        y = Conv2d(1024, 3, padding=1, dtype=self.dtype, name="adnn2_conv")(y)
        y = BatchNorm(dtype=self.dtype, name="adnn2_bn")(y, not train)
        y = relu(y)
        y = Dropout(0.5, name="adnn2_drop")(y, deterministic=not train)
        y = Conv2d(2, 3, padding=1, use_bias=True, dtype=self.dtype,
                   name="adnn3_conv")(y)
        return y
