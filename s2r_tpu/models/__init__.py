"""Model zoo (parity map in SURVEY.md §2.1).

Factories mirror the reference's build_* entry points
(modeling/backbone/__init__.py:3, assp.py:94, decoder.py:56, domian.py:46).
"""

from s2r_tpu.models.aspp import ASPP
from s2r_tpu.models.decoder import Decoder
from s2r_tpu.models.deeplab import DeepLab
from s2r_tpu.models.discriminator import FCDiscriminator
from s2r_tpu.models.domain import DomainClassifier
from s2r_tpu.models.mobilenet import MobileNetV2


def build_backbone(backbone: str, output_stride: int, dtype):
    if backbone == "mobilenet":
        return MobileNetV2(output_stride=output_stride, dtype=dtype)
    if backbone in ("resnet", "resnet101", "resnet50"):
        from s2r_tpu.models.resnet import ResNet

        depth = "resnet50" if backbone == "resnet50" else "resnet101"
        return ResNet(depth=depth, output_stride=output_stride, dtype=dtype)
    if backbone == "xception":
        from s2r_tpu.models.xception import AlignedXception

        return AlignedXception(output_stride=output_stride, dtype=dtype)
    if backbone == "drn":
        from s2r_tpu.models.drn import DRN

        return DRN(dtype=dtype)  # output stride 8 by design
    raise NotImplementedError(backbone)


def build_aspp(backbone: str, output_stride: int, dtype):
    return ASPP(backbone=backbone, output_stride=output_stride, dtype=dtype)


def build_decoder(num_classes: int, backbone: str, dtype):
    return Decoder(num_classes=num_classes, backbone=backbone, dtype=dtype)


def build_domaincls(backbone: str, dtype):
    return DomainClassifier(backbone=backbone, dtype=dtype)
