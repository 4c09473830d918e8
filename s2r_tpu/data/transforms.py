"""Host-side augmentation pipeline (PIL-based), NHWC output.

Capability parity with reference dataloders/custom_transforms.py (paired
train transforms over {'src_image','tgt_image','src_label'}) and
custom_transforms_eval.py (single-image {'image','label'}).  The reference
duplicates every transform across those two near-identical modules; here one
generic implementation handles any sample dict — keys containing 'label' are
treated as masks (NEAREST resampling, ignore-fill padding), everything else
as RGB images (BILINEAR, zero-fill).

Train composition (gtav2cityscapes.py:66-74):
  RandomHorizontalFlip -> RandomScaleCrop(base, crop, fill=255) ->
  RandomGaussianBlur -> Normalize(ImageNet) -> ToArray
Eval composition (gtav2cityscapes.py:139-145):
  FixedResize(crop) -> Normalize -> ToArray
GTA5 val composition (gta5.py:81-88): FixScaleCrop(crop) -> ...

Randomness uses a per-call `random.Random` owned by the loader worker, so
epochs are reproducible from the config seed without global state.
"""

from __future__ import annotations

import random as _random
from typing import Dict, Optional, Sequence

import numpy as np
from PIL import Image, ImageFilter, ImageOps

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _is_mask(key: str) -> bool:
    return "label" in key


class Compose:
    def __init__(self, transforms: Sequence):
        self.transforms = list(transforms)

    def __call__(self, sample: Dict, rng: Optional[_random.Random] = None):
        rng = rng or _random
        for t in self.transforms:
            sample = t(sample, rng)
        return sample


class RandomHorizontalFlip:
    """Flip all entries together with p=0.5 (custom_transforms.py:59-71)."""

    def __call__(self, sample, rng):
        if rng.random() < 0.5:
            sample = {k: v.transpose(Image.FLIP_LEFT_RIGHT)
                      for k, v in sample.items()}
        return sample


class RandomRotate:
    """Joint rotation by U(-degree, degree) (custom_transforms.py:74-89;
    present in the reference but unused in its pipelines)."""

    def __init__(self, degree: float):
        self.degree = degree

    def __call__(self, sample, rng):
        deg = rng.uniform(-self.degree, self.degree)
        return {k: v.rotate(deg, Image.NEAREST if _is_mask(k)
                            else Image.BILINEAR)
                for k, v in sample.items()}


class RandomGaussianBlur:
    """Blur images (not masks) with p=0.5, radius U(0,1)
    (custom_transforms.py:92-105).  Note the reference draws an independent
    radius per image in the pair — reproduced."""

    def __call__(self, sample, rng):
        if rng.random() < 0.5:
            sample = {k: (v if _is_mask(k) else
                          v.filter(ImageFilter.GaussianBlur(rng.random())))
                      for k, v in sample.items()}
        return sample


class RandomScaleCrop:
    """Random short-edge scale in [0.5, 2.0]*base_size, pad right/bottom
    (images 0, masks `fill`), joint random crop (custom_transforms.py:108-147).
    """

    def __init__(self, base_size: int, crop_size: int, fill: int = 0):
        self.base_size = base_size
        self.crop_size = crop_size
        self.fill = fill

    def __call__(self, sample, rng):
        short_size = rng.randint(int(self.base_size * 0.5),
                                 int(self.base_size * 2.0))
        any_img = next(iter(sample.values()))
        w, h = any_img.size
        if h > w:
            ow = short_size
            oh = int(1.0 * h * ow / w)
        else:
            oh = short_size
            ow = int(1.0 * w * oh / h)
        out = {k: v.resize((ow, oh), Image.NEAREST if _is_mask(k)
                           else Image.BILINEAR)
               for k, v in sample.items()}
        if short_size < self.crop_size:
            padh = max(self.crop_size - oh, 0)
            padw = max(self.crop_size - ow, 0)
            out = {k: ImageOps.expand(
                v, border=(0, 0, padw, padh),
                fill=self.fill if _is_mask(k) else 0)
                for k, v in out.items()}
        w, h = next(iter(out.values())).size
        x1 = rng.randint(0, w - self.crop_size)
        y1 = rng.randint(0, h - self.crop_size)
        box = (x1, y1, x1 + self.crop_size, y1 + self.crop_size)
        return {k: v.crop(box) for k, v in out.items()}


class FixScaleCrop:
    """Scale short edge to crop_size, center crop
    (custom_transforms.py:150-178)."""

    def __init__(self, crop_size: int):
        self.crop_size = crop_size

    def __call__(self, sample, rng=None):
        any_img = next(iter(sample.values()))
        w, h = any_img.size
        if w > h:
            oh = self.crop_size
            ow = int(1.0 * w * oh / h)
        else:
            ow = self.crop_size
            oh = int(1.0 * h * ow / w)
        out = {k: v.resize((ow, oh), Image.NEAREST if _is_mask(k)
                           else Image.BILINEAR)
               for k, v in sample.items()}
        w, h = next(iter(out.values())).size
        x1 = int(round((w - self.crop_size) / 2.0))
        y1 = int(round((h - self.crop_size) / 2.0))
        box = (x1, y1, x1 + self.crop_size, y1 + self.crop_size)
        return {k: v.crop(box) for k, v in out.items()}


class FixedResize:
    """Resize everything to (size, size) (custom_transforms.py:180-196)."""

    def __init__(self, size: int):
        self.size = (size, size)

    def __call__(self, sample, rng=None):
        return {k: v.resize(self.size, Image.NEAREST if _is_mask(k)
                            else Image.BILINEAR)
                for k, v in sample.items()}


class Normalize:
    """PIL -> float arrays; images /255, -mean, /std; masks to int32
    (custom_transforms.py:7-33)."""

    def __init__(self, mean=IMAGENET_MEAN, std=IMAGENET_STD):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, sample, rng=None):
        out = {}
        for k, v in sample.items():
            if _is_mask(k):
                out[k] = np.asarray(v, np.int32)
            else:
                arr = np.asarray(v, np.float32) / 255.0
                out[k] = (arr - self.mean) / self.std
        return out


class ToArray:
    """Finalize to contiguous NHWC float32 images / int32 masks.  (The
    reference's ToTensor additionally transposes to CHW — torch layout; the
    TPU framework keeps NHWC.)"""

    def __call__(self, sample, rng=None):
        out = {}
        for k, v in sample.items():
            a = np.asarray(v)
            if _is_mask(k):
                out[k] = np.ascontiguousarray(a.astype(np.int32))
            else:
                out[k] = np.ascontiguousarray(a.astype(np.float32))
        return out


def train_transforms(base_size: int, crop_size: int) -> Compose:
    return Compose([RandomHorizontalFlip(),
                    RandomScaleCrop(base_size, crop_size, fill=255),
                    RandomGaussianBlur(),
                    Normalize(), ToArray()])


def eval_transforms(crop_size: int) -> Compose:
    return Compose([FixedResize(crop_size), Normalize(), ToArray()])


def val_scalecrop_transforms(crop_size: int) -> Compose:
    return Compose([FixScaleCrop(crop_size), Normalize(), ToArray()])
