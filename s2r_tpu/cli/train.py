"""Feature-space adversarial adaption / source-only training driver.

Capability parity with reference train.py: `--dataset gtav2cityscapes`
(default) trains the split segmenter + pixel-wise domain classifier with the
summed task+d+d_inv loss; `--dataset gtav` is supervised source-only
training.  Flag surface mirrors train.py:315-404.

Usage:
    python -m s2r_tpu.cli.train --dataset gtav --src_img_root ... \
        --src_label_root ... [--epochs N] [--lr LR] ...
    python -m s2r_tpu.cli.train --dataset synthetic --epochs 1  # smoke run
"""

from __future__ import annotations

import argparse

from s2r_tpu.config import (add_common_flags, apply_platform_override,
                            config_from_args)
from s2r_tpu.train.trainer import Trainer


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="s2r_tpu feature-space adaption training")
    add_common_flags(parser)
    args = parser.parse_args(argv)
    apply_platform_override()
    cfg = config_from_args(args)
    method = "source_only" if cfg.dataset == "gtav" else "feature_adapt"
    trainer = Trainer(cfg, method=method)
    trainer.fit()
    return trainer


if __name__ == "__main__":
    main()
