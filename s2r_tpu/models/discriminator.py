"""Fully-convolutional output-space discriminator (AdaptSegNet-style).

Capability parity with reference modeling/discriminator.py:6-35: five 4x4
stride-2 convs 19 -> 64 -> 128 -> 256 -> 512 -> 1 with LeakyReLU(0.2) between;
no BatchNorm, no sigmoid (paired with BCE-with-logits).  The reference never
re-initializes this module, so convs use torch's default init.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from s2r_tpu.models.layers import Conv2d, leaky_relu


class FCDiscriminator(nn.Module):
    num_classes: int = 19
    ndf: int = 64
    dtype: jnp.dtype = jnp.float32
    # First N convs use the space-to-depth formulation (ops/s2d.py; exact
    # numerics, identical param shapes).  Measured SLOWER in the 512x1024
    # train step (49.5 vs 55.1 img/s with s2d_convs=2) despite the
    # 19-channel input's 128-lane padding — the s2d relayout passes cost
    # more than the padded reads they replace.  Kept as a knob so the A/B
    # is reproducible (exp/perf_ablate.py 's2d' arm).
    s2d_convs: int = 0
    # conv1 as the Pallas W-minor kernel (ops/pallas/disc_conv.py): consumes
    # the softmax side's native layout, skipping the 19->128 lane-pad
    # relayout the device profile itemizes.  A/B knob
    # (exp/perf_ablate.py 'pallas_d1' arm); param shapes unchanged.
    pallas_wminor_conv1: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [N, H, W, num_classes] -> logits [N, H/32, W/32, 1]."""
        widths = (self.ndf, self.ndf * 2, self.ndf * 4, self.ndf * 8)
        for i, w in enumerate(widths):
            x = Conv2d(w, 4, stride=2, padding=1, use_bias=True,
                       weight_init="torch_default", dtype=self.dtype,
                       s2d=(i < self.s2d_convs),
                       pallas_wminor=(i == 0 and self.pallas_wminor_conv1),
                       name=f"conv{i + 1}")(x)
            x = leaky_relu(x, 0.2)
        x = Conv2d(1, 4, stride=2, padding=1, use_bias=True,
                   weight_init="torch_default", dtype=self.dtype,
                   name="classifier")(x)
        return x
