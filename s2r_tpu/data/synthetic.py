"""Synthetic datasets for data-free smoke runs, tests and benchmarks.

The reference has no equivalent — it requires GTA5/Cityscapes on disk.
These generate structured random scenes with a FIXED class -> color mapping
(scaled Cityscapes palette), so the task is *learnable* and end-to-end
convergence is testable (PARITY.md §End-to-end convergence evidence
reports held-out val mIoU 0.81).

Scenes are emitted as uint8 frames and flow through the SAME transform
pipeline as real data (train/eval PIL transforms, the staged device-aug
path, or the native backend), so every data path sees a consistent input
distribution (`--dataset synthetic`).
"""

from __future__ import annotations

import random
from typing import Dict

import numpy as np
from PIL import Image

from s2r_tpu.data import transforms as T

NUM_CLASSES = 19


def _class_colors() -> np.ndarray:
    """Fixed class -> uint8 color mapping (Cityscapes palette)."""
    from s2r_tpu.data.palette import get_cityscapes_labels

    return get_cityscapes_labels().astype(np.uint8)


_COLORS = None


def _scene(rng: np.random.RandomState, h: int, w: int):
    """A blocky 'scene': piecewise-constant label regions whose colors are a
    fixed function of the class, plus noise.  Returns (u8 image, i32 label).
    """
    global _COLORS
    if _COLORS is None:
        _COLORS = _class_colors()
    label = np.zeros((h, w), np.int32)
    image = np.empty((h, w, 3), np.float32)
    image[:] = _COLORS[0]
    n_regions = rng.randint(4, 9)
    for _ in range(n_regions):
        cls = rng.randint(0, NUM_CLASSES)
        y0, x0 = rng.randint(0, h), rng.randint(0, w)
        hh, ww = rng.randint(h // 4, h), rng.randint(w // 4, w)
        label[y0:y0 + hh, x0:x0 + ww] = cls
        image[y0:y0 + hh, x0:x0 + ww] = _COLORS[cls]
    image += rng.randn(h, w, 3).astype(np.float32) * 12.0
    image = np.clip(image, 0, 255).astype(np.uint8)
    # sprinkle ignore pixels like real boundaries
    ignore = rng.rand(h, w) < 0.02
    label[ignore] = 255
    return image, label


class SyntheticTrainSet:
    NUM_CLASSES = NUM_CLASSES

    def __init__(self, crop_size: int, length: int = 64, paired: bool = True,
                 seed: int = 0, staged: bool = False):
        self.crop = crop_size
        self.length = length
        self.paired = paired
        self.seed = seed
        self.staged = staged
        self.transform = T.train_transforms(crop_size, crop_size)
        self.eval_transform = T.eval_transforms(crop_size)

    def __len__(self):
        return self.length

    def __getitem__(self, index: int, rng=None) -> Dict[str, np.ndarray]:
        r = np.random.RandomState(self.seed * 100003 + index)
        img, lbl = _scene(r, self.crop, self.crop)
        if not self.paired:
            out = self.eval_transform({
                "image": Image.fromarray(img),
                "label": Image.fromarray(lbl.astype(np.uint8))})
            out["name"] = f"synthetic_{index:05d}.png"
            return out
        tgt, _ = _scene(r, self.crop, self.crop)
        if self.staged:
            return {"src_image": img, "tgt_image": tgt,
                    "src_label": lbl.astype(np.uint8)}
        sample = {"src_image": Image.fromarray(img),
                  "tgt_image": Image.fromarray(tgt),
                  "src_label": Image.fromarray(lbl.astype(np.uint8))}
        return self.transform(sample, rng or random)


class SyntheticEvalSet:
    NUM_CLASSES = NUM_CLASSES

    def __init__(self, crop_size: int, length: int = 16, seed: int = 1):
        self.inner = SyntheticTrainSet(crop_size, length, paired=False,
                                       seed=seed)

    def __len__(self):
        return len(self.inner)

    def __getitem__(self, index: int, rng=None):
        return self.inner.__getitem__(index)
