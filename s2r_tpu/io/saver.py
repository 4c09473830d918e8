"""Experiment directory management + best-checkpoint promotion.

Capability parity with reference utils/saver.py:7-60 (Saver):
- auto-incrementing run/{dataset}/{checkname}/experiment_{id} directories
- save_checkpoint writes the checkpoint; on is_best writes best_pred.txt and
  promotes to run/.../model_best.ckpt only if this run beats the best
  best_pred across ALL prior experiments (saver.py:23-42)
- save_experiment_config dumps key hyperparameters to parameters.txt
  (saver.py:44-60)
"""

from __future__ import annotations

import glob
import os
import shutil
from typing import Any, Dict, Optional

from s2r_tpu.config import Config
from s2r_tpu.io.checkpoint import AsyncWriter, _snapshot
from s2r_tpu.io.checkpoint import save_checkpoint as _save_ckpt

CKPT_NAME = "checkpoint.ckpt"
BEST_NAME = "model_best.ckpt"


class Saver:
    def __init__(self, cfg: Config, create: bool = True):
        """create=False (non-main hosts in a multi-process run): compute the
        paths for reads (--resume auto) but claim no experiment dir and
        never expect to write."""
        self.cfg = cfg
        # Async mode (default): snapshot the state on-device (HBM copy, the
        # step's donated buffers stay untouched), then device->host transfer
        # + serialize + atomic write on a background thread.  The written
        # file is byte-identical to a sync save; wait() joins + re-raises.
        self._writer = AsyncWriter() if getattr(cfg, "async_save", True) \
            else None
        self.directory = os.path.join(cfg.run_root, cfg.dataset,
                                      cfg.checkname or "experiment")
        runs = sorted(glob.glob(os.path.join(self.directory, "experiment_*")),
                      key=lambda p: int(p.split("_")[-1]))
        run_id = int(runs[-1].split("_")[-1]) + 1 if runs else 0
        self.runs = runs
        self.experiment_dir = os.path.join(self.directory,
                                           f"experiment_{run_id}")
        if create:
            os.makedirs(self.experiment_dir, exist_ok=True)

    def save_checkpoint(self, state, epoch: int, best_pred: float,
                        is_best: bool, filename: str = CKPT_NAME,
                        extra: Optional[Dict[str, Any]] = None) -> str:
        path = os.path.join(self.experiment_dir, filename)
        if self._writer is not None:
            state = _snapshot(state)
            self._writer.submit(lambda: self._write(
                path, state, epoch, best_pred, is_best, extra))
        else:
            self._write(path, state, epoch, best_pred, is_best, extra)
        return path

    def _write(self, path, state, epoch, best_pred, is_best, extra) -> None:
        _save_ckpt(path, state, epoch, best_pred, extra)
        if is_best:
            with open(os.path.join(self.experiment_dir, "best_pred.txt"),
                      "w") as f:
                f.write(str(best_pred))
            previous = [0.0]
            for run in self.runs:
                p = os.path.join(run, "best_pred.txt")
                if os.path.exists(p):
                    with open(p) as f:
                        previous.append(float(f.readline()))
            if not self.runs or best_pred > max(previous):
                shutil.copyfile(path, os.path.join(self.directory, BEST_NAME))

    def wait(self) -> None:
        """Block until every pending async write hit disk (no-op in sync
        mode); re-raises the first background write error."""
        if self._writer is not None:
            self._writer.wait()

    def save_experiment_config(self) -> None:
        cfg = self.cfg
        keys = [("datset", cfg.dataset),  # reference's typo'd key, kept for
                                          # parameters.txt parity (saver.py:48)
                ("backbone", cfg.backbone), ("out_stride", cfg.out_stride),
                ("lr", cfg.lr), ("lr_scheduler", cfg.lr_scheduler),
                ("loss_type", cfg.loss_type), ("epoch", cfg.epochs),
                ("base_size", cfg.base_size), ("crop_size", cfg.crop_size)]
        with open(os.path.join(self.experiment_dir, "parameters.txt"),
                  "w") as f:
            for k, v in keys:
                f.write(f"{k}:{v}\n")
        with open(os.path.join(self.experiment_dir, "config.json"), "w") as f:
            f.write(cfg.to_json())
