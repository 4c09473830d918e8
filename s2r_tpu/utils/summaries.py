"""Training summaries: scalars + image grids.

Capability parity with reference utils/summaries.py:7-23 (TensorboardSummary
on tensorboardX): create_summary() returns a writer rooted in the experiment
directory; visualize_image logs three grids — unnormalized input images,
colorized predictions, colorized ground truth — for the first 3 samples.

Backend: torch.utils.tensorboard when importable, plus an always-on JSONL
scalar log (scalars.jsonl) so runs are inspectable without TensorBoard.
"""

from __future__ import annotations

import json
import os
import time
import numpy as np

from s2r_tpu.data.palette import decode_seg_map_sequence
from s2r_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

try:  # optional backend
    from torch.utils.tensorboard import SummaryWriter as _TBWriter
except Exception:  # pragma: no cover
    _TBWriter = None


class SummaryWriter:
    def __init__(self, logdir: str, use_tensorboard: bool = True):
        os.makedirs(logdir, exist_ok=True)
        self.logdir = logdir
        self._jsonl = open(os.path.join(logdir, "scalars.jsonl"), "a")
        self._tb = _TBWriter(logdir) if (use_tensorboard and _TBWriter) \
            else None

    def add_scalar(self, tag: str, value, step: int):
        self._jsonl.write(json.dumps(
            {"tag": tag, "value": float(value), "step": int(step),
             "time": time.time()}) + "\n")
        self._jsonl.flush()
        if self._tb:
            self._tb.add_scalar(tag, float(value), step)

    def add_image(self, tag: str, img_hwc: np.ndarray, step: int):
        """img_hwc: float [H, W, 3] in [0, 1]."""
        if self._tb:
            self._tb.add_image(tag, img_hwc.transpose(2, 0, 1), step)
        else:
            try:
                from PIL import Image
                d = os.path.join(self.logdir, "images")
                os.makedirs(d, exist_ok=True)
                Image.fromarray((np.clip(img_hwc, 0, 1) * 255).astype(
                    np.uint8)).save(os.path.join(
                        d, f"{tag.replace('/', '_')}_{step:08d}.png"))
            except Exception:
                pass

    def close(self):
        self._jsonl.close()
        if self._tb:
            self._tb.close()


def unnormalize(images: np.ndarray) -> np.ndarray:
    """NHWC normalized -> [0,1] RGB (inverse of transforms.Normalize)."""
    img = images * np.asarray(IMAGENET_STD, np.float32) \
        + np.asarray(IMAGENET_MEAN, np.float32)
    return np.clip(img, 0.0, 1.0)


def _grid(images: np.ndarray, max_n: int = 3) -> np.ndarray:
    """First max_n [H,W,3] frames side by side."""
    n = min(images.shape[0], max_n)
    return np.concatenate(list(images[:n]), axis=1)


class TensorboardSummary:
    """Reference-shaped facade (utils/summaries.py)."""

    def __init__(self, directory: str):
        self.directory = directory

    def create_summary(self) -> SummaryWriter:
        return SummaryWriter(self.directory)

    def visualize_image(self, writer: SummaryWriter, dataset: str,
                        image: np.ndarray, target: np.ndarray,
                        output: np.ndarray, global_step: int):
        """image [N,H,W,3] normalized; target [N,H,W] ids; output
        [N,H,W,C] logits."""
        image = np.asarray(image)
        target = np.asarray(target)
        output = np.asarray(output)
        writer.add_image("Image", _grid(unnormalize(image)), global_step)
        pred = np.argmax(output, axis=-1)
        writer.add_image("Predicted label",
                         _grid(decode_seg_map_sequence(pred[:3], dataset)),
                         global_step)
        writer.add_image("Groundtruth label",
                         _grid(decode_seg_map_sequence(target[:3], dataset)),
                         global_step)
