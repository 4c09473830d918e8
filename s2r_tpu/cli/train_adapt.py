"""Output-space adversarial adaption (AdaptSegNet-style) training driver.

Capability parity with reference train_adapt.py: composite DeepLab segmenter
+ fully-convolutional discriminator on the softmax maps, alternating G/D
inside one jitted step.  Flag surface mirrors train_adapt.py:258-346.

Usage:
    python -m s2r_tpu.cli.train_adapt --src_img_root ... --tgt_img_root ...
    python -m s2r_tpu.cli.train_adapt --dataset synthetic --epochs 1
"""

from __future__ import annotations

import argparse

from s2r_tpu.config import (add_common_flags, apply_platform_override,
                            config_from_args)
from s2r_tpu.train.trainer import Trainer


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="s2r_tpu output-space adaption training")
    add_common_flags(parser)
    args = parser.parse_args(argv)
    apply_platform_override()
    cfg = config_from_args(args)
    trainer = Trainer(cfg, method="output_adapt")
    trainer.fit()
    return trainer


if __name__ == "__main__":
    main()
