"""Label-free inference sweep (composite DeepLab checkpoints).
Capability parity with reference test_adapt.py."""

from __future__ import annotations

from s2r_tpu.cli.test import main as _main


def main(argv=None):
    return _main(argv, method="output_adapt")


if __name__ == "__main__":
    main()
