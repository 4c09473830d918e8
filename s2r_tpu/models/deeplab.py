"""DeepLab-V3+ composite: backbone -> ASPP -> decoder -> full-res upsample.

Capability parity with reference modeling/deeplab.py:9-72.  The composite
also exposes the ASPP feature map, which the feature-space adaption method
feeds to the domain classifier (reference: train.py:182-196) — under jit the
extra output is dead-code-eliminated when unused.

The reference's 1x/10x LR split (deeplab.py:42-72: backbone params at base LR,
ASPP+decoder at 10x) is reproduced structurally: params live under top-level
keys 'backbone' / 'aspp' / 'decoder', and s2r_tpu.train.optim builds the LR
multiplier tree from those keys.

`freeze_bn` (deeplab.py:35-40) makes every BatchNorm use running statistics
even in training.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from s2r_tpu.models.aspp import ASPP
from s2r_tpu.models.decoder import Decoder
from s2r_tpu.models.mobilenet import MobileNetV2
from s2r_tpu.ops.resize import resize_bilinear_align_corners


class DeepLab(nn.Module):
    backbone: str = "mobilenet"
    output_stride: int = 16
    num_classes: int = 19
    freeze_bn: bool = False
    dtype: jnp.dtype = jnp.float32
    remat: bool = False  # rematerialize blocks/ASPP/decoder in backward
    # reference fixed_padding BN-statistics quirk (see models/mobilenet.py);
    # exact torch train dynamics when True, ~10% faster steps when False
    pad_stats: bool = True
    # dtype of the full-resolution upsampled logits.  None = f32 (the
    # reference semantics: torch CE/softmax run the full-res maps in f32).
    # bfloat16 halves the HBM traffic of every full-res 19-channel tensor
    # downstream — the resize write, the three adversarial softmax maps,
    # the discriminator input (and its layout copies), the CE input and
    # all their gradients (Config.logits_dtype, opt-in).
    logits_dtype: Optional[jnp.dtype] = None
    # False skips the final full-res resize and returns DECODER-resolution
    # logits (stride 4).  Consumers: the fast serving mode (io/serving.py
    # argmax_res='decoder' takes the argmax at this resolution and
    # nearest-upsamples labels, skipping the full-res 19-channel tensors
    # entirely).  Training/eval always keep the default True.
    upsample_logits: bool = True
    # Compute the ASPP 1280-ch and decoder 304-ch concat convs as
    # split-kernel sums instead of materializing the concats (see
    # models/aspp.py / models/decoder.py).  Same parameter tree; float-sum
    # reassociation only.  Off by default (exact concat-order arithmetic).
    split_concat: bool = False
    # Lower the backbone's 3x3/s2 stem via space-to-depth (mobilenet only;
    # see models/mobilenet.py stem_s2d).  Off by default.
    stem_s2d: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: [N, H, W, 3] -> (logits [N, H, W, C] float32, aspp feature)."""
        bn_train = train and not self.freeze_bn
        aspp_cls, dec_cls = ASPP, Decoder
        if self.remat:
            aspp_cls = nn.remat(ASPP, static_argnums=(2,))
            dec_cls = nn.remat(Decoder, static_argnums=(3,))
        if self.backbone == "mobilenet":
            backbone = MobileNetV2(output_stride=self.output_stride,
                                   dtype=self.dtype, remat=self.remat,
                                   pad_stats=self.pad_stats,
                                   stem_s2d=self.stem_s2d, name="backbone")
        elif self.backbone in ("resnet", "resnet101", "resnet50"):
            from s2r_tpu.models.resnet import ResNet

            depth = "resnet101" if self.backbone in ("resnet", "resnet101") \
                else "resnet50"
            backbone = ResNet(depth=depth, output_stride=self.output_stride,
                              dtype=self.dtype, name="backbone")
        elif self.backbone == "xception":
            from s2r_tpu.models.xception import AlignedXception

            backbone = AlignedXception(output_stride=self.output_stride,
                                       dtype=self.dtype, name="backbone")
        elif self.backbone == "drn":
            from s2r_tpu.models.drn import DRN

            backbone = DRN(dtype=self.dtype, name="backbone")
        else:
            raise NotImplementedError(self.backbone)
        # DRN's output stride is 8 by construction (models/drn.py), so the
        # ASPP dilation set follows suit regardless of the config value.
        eff_os = 8 if self.backbone == "drn" else self.output_stride
        high, low = backbone(x, bn_train)
        feat = aspp_cls(backbone=self.backbone,
                        output_stride=eff_os,
                        split_concat=self.split_concat,
                        dtype=self.dtype, name="aspp")(high, bn_train)
        logits = dec_cls(num_classes=self.num_classes, backbone=self.backbone,
                         split_concat=self.split_concat,
                         dtype=self.dtype, name="decoder")(feat, low, bn_train)
        if self.upsample_logits:
            logits = resize_bilinear_align_corners(
                logits, x.shape[1:3],
                dtype=(self.logits_dtype if self.logits_dtype is not None
                       else jnp.promote_types(x.dtype, jnp.float32)))
        return logits, feat
