"""Validation sweep for the feature-adaption / source-only (split-model)
checkpoints — per-image predictions + aggregate per-class IoU report.

Capability parity with reference val.py (validationSep + validation +
val_info.txt).  Requires --resume.
"""

from __future__ import annotations

import argparse
import os

from s2r_tpu.cli._eval_common import build_eval, validation, validation_sep
from s2r_tpu.config import (add_common_flags, apply_platform_override,
                            config_from_args)


def main(argv=None, method: str = "feature_adapt"):
    parser = argparse.ArgumentParser(description="s2r_tpu validation sweep")
    add_common_flags(parser)
    parser.add_argument("--out-dir", type=str, default="run_val",
                        dest="out_dir")
    parser.add_argument("--skip-sep", action="store_true", dest="skip_sep",
                        help="skip per-image prediction export")
    args = parser.parse_args(argv)
    apply_platform_override()
    cfg = config_from_args(args)
    if cfg.dataset == "gtav":
        method = "source_only"
    m, params, bstats, eval_step, val_loader, _, nclass = build_eval(cfg,
                                                                     method)
    if not args.skip_sep:
        validation_sep(cfg, params, bstats, eval_step, val_loader, nclass,
                       os.path.join(args.out_dir, "predictions"))
    return validation(cfg, params, bstats, eval_step, val_loader, nclass,
                      os.path.join(args.out_dir, "val_info.txt"))


if __name__ == "__main__":
    main()
