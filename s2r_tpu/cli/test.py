"""Label-free inference sweep (split-model checkpoints): saves labelId +
color PNGs.  Capability parity with reference test.py."""

from __future__ import annotations

import argparse

from s2r_tpu.cli._eval_common import build_eval, test_sweep
from s2r_tpu.config import (add_common_flags, apply_platform_override,
                            config_from_args)


def main(argv=None, method: str = "feature_adapt"):
    parser = argparse.ArgumentParser(description="s2r_tpu test sweep")
    add_common_flags(parser)
    parser.add_argument("--out-dir", type=str, default="result",
                        dest="out_dir")
    args = parser.parse_args(argv)
    apply_platform_override()
    cfg = config_from_args(args)
    if cfg.dataset == "gtav":
        method = "source_only"
    m, params, bstats, eval_step, _, test_loader, _ = build_eval(cfg, method)
    test_sweep(cfg, params, bstats, eval_step, test_loader, args.out_dir)


if __name__ == "__main__":
    main()
