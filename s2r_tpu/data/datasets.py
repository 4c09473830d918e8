"""Datasets: GTA5 -> Cityscapes adaption sets and the GTA5 source-only set.

Capability parity with reference dataloders/datasets/gtav2cityscapes.py and
gta5.py:
- 34 -> 19 Cityscapes trainId remap with void classes -> 255
  (gtav2cityscapes.py:27-35) — implemented as a 256-entry LUT instead of the
  reference's sequential in-place replacements (identical result, one
  vectorized gather).
- TrainSet pairs each labeled source frame with a uniformly random unlabeled
  target frame per access (gtav2cityscapes.py:54).
- ValSet globs '*gtFine_labelIds.png' and derives the image filename by
  suffix swap (gtav2cityscapes.py:103,125-128).
- TestSet globs images; a constant-255 label is synthesized when no label
  root is given (gtav2cityscapes.py:201-207).
- GTA5 splits its file list 70/20/10 after a seeded shuffle (gta5.py:24-30).
- Samples carry a 'name' key (the reference's val/test drivers index
  sample['name'] but its datasets never emit it — SURVEY.md §2.6; fixed).
"""

from __future__ import annotations

import os
import random
import threading
from typing import Dict, List, Optional

import numpy as np
from PIL import Image

from s2r_tpu.data import transforms as T

NUM_CLASSES = 19
IGNORE_INDEX = 255
VOID_CLASSES = (0, 1, 2, 3, 4, 5, 6, 9, 10, 14, 15, 16, 18, 29, 30, 34)
VALID_CLASSES = (7, 8, 11, 12, 13, 17, 19, 20, 21, 22, 23, 24, 25, 26, 27,
                 28, 31, 32, 33)
CLASS_NAMES = ("unlabelled", "road", "sidewalk", "building", "wall", "fence",
               "pole", "traffic_light", "traffic_sign", "vegetation",
               "terrain", "sky", "person", "rider", "car", "truck", "bus",
               "train", "motorcycle", "bicycle")

_LUT = np.full(256, IGNORE_INDEX, dtype=np.uint8)
for _i, _v in enumerate(VALID_CLASSES):
    _LUT[_v] = _i


def encode_segmap(mask: np.ndarray) -> np.ndarray:
    """Raw Cityscapes labelIds -> 19 trainIds (void -> 255)."""
    return _LUT[mask.astype(np.uint8)]


def recursive_glob(rootdir: str, suffix: str = "") -> List[str]:
    """Sorted listing of files under rootdir ending with suffix
    (gtav2cityscapes.py:85-91: a flat, sorted listdir despite the name)."""
    return [os.path.join(rootdir, f)
            for f in sorted(os.listdir(rootdir)) if f.endswith(suffix)]


def _load_rgb(path: str) -> Image.Image:
    return Image.open(path).convert("RGB")


class _FrameCache:
    """Decoded-frame memoization for the train paths — the tf.data
    `.cache()` idea.  PNG inflate dominates the host pipeline (~6 MB/frame
    at GTA5 sizes); with the scale-crop running on device (--device-aug) or
    via box-resampling (data/hostcrop.py), epoch >= 2 needs no host decode
    at all for datasets that fit the byte budget (Cityscapes ~19 GB;
    GTA5's 24966 frames at ~145 GB do NOT).  Over-budget frames are simply
    not stored and decode per access — graceful degradation, never OOM.
    Thread-safe for the thread-pool DataLoader; arrays are stored u8
    exactly as decoded."""

    def __init__(self, max_bytes: Optional[int] = None):
        self._d: Dict[str, np.ndarray] = {}
        self._lock = threading.Lock()
        self._total = 0
        self.max_bytes = max_bytes

    def get(self, path: str, load) -> np.ndarray:
        with self._lock:
            hit = self._d.get(path)
        if hit is not None:
            return hit
        arr = np.asarray(load(path), np.uint8)
        with self._lock:
            if path not in self._d and (
                    self.max_bytes is None
                    or self._total + arr.nbytes <= self.max_bytes):
                self._d[path] = arr
                self._total += arr.nbytes
        return arr

    def nbytes(self) -> int:
        with self._lock:
            return self._total


def _load_label(path: str) -> Image.Image:
    arr = np.asarray(Image.open(path), dtype=np.uint8)
    return Image.fromarray(encode_segmap(arr))


class TrainSet:
    """Paired (source image+label, random target image) training set.

    staged=True skips host-side augmentation and returns raw uint8 frames
    (label already 19-class encoded) for the fused on-device augmentation
    path (s2r_tpu/data/device_aug.py).
    """

    NUM_CLASSES = NUM_CLASSES

    def __init__(self, src_img_root: str, src_label_root: str,
                 tgt_img_root: str, base_size: int, crop_size: int,
                 staged: bool = False, cache: bool = False,
                 cache_bytes: Optional[int] = None):
        self.src_label_root = src_label_root
        self.sources = recursive_glob(src_img_root, ".png")
        self.targets = recursive_glob(tgt_img_root, ".png")
        if not self.sources:
            raise FileNotFoundError(f"no source images in {src_img_root}")
        if not self.targets:
            raise FileNotFoundError(f"no target images in {tgt_img_root}")
        self.staged = staged
        self.cache = _FrameCache(cache_bytes) if cache else None
        self.base_size = base_size
        self.crop_size = crop_size
        self.transform = T.train_transforms(base_size, crop_size)

    def __len__(self):
        return len(self.sources)

    def __getitem__(self, index: int, rng: Optional[random.Random] = None
                    ) -> Dict[str, np.ndarray]:
        rng = rng or random
        src_path = self.sources[index]
        label_path = os.path.join(self.src_label_root,
                                  os.path.basename(src_path))
        tgt_path = self.targets[rng.randint(0, len(self.targets) - 1)]
        if self.staged:
            if self.cache is not None:
                return {
                    "src_image": self.cache.get(src_path, _load_rgb),
                    "tgt_image": self.cache.get(tgt_path, _load_rgb),
                    "src_label": self.cache.get(label_path, _load_label),
                }
            return {
                "src_image": np.asarray(_load_rgb(src_path), np.uint8),
                "tgt_image": np.asarray(_load_rgb(tgt_path), np.uint8),
                "src_label": np.asarray(_load_label(label_path), np.uint8),
            }
        if self.cache is not None:
            # --data-cache without --device-aug: augment directly from the
            # cached decoded frames at crop resolution (data/hostcrop.py);
            # emits uint8, normalization finishes on device.
            from s2r_tpu.data import hostcrop
            return hostcrop.augment_sample(
                {"src_image": self.cache.get(src_path, _load_rgb),
                 "tgt_image": self.cache.get(tgt_path, _load_rgb),
                 "src_label": self.cache.get(label_path, _load_label)},
                rng, self.base_size, self.crop_size)
        sample = {"src_image": _load_rgb(src_path),
                  "tgt_image": _load_rgb(tgt_path),
                  "src_label": _load_label(label_path)}
        return self.transform(sample, rng)


class ValSet:
    """Cityscapes validation set keyed by label files."""

    NUM_CLASSES = NUM_CLASSES

    def __init__(self, img_root: str, label_root: str, crop_size: int):
        self.img_root = img_root
        self.labels = recursive_glob(label_root, "gtFine_labelIds.png")
        if not self.labels:
            raise FileNotFoundError(f"no labels in {label_root}")
        self.transform = T.eval_transforms(crop_size)

    def __len__(self):
        return len(self.labels)

    def __getitem__(self, index: int, rng=None) -> Dict[str, np.ndarray]:
        label_path = self.labels[index]
        name = os.path.basename(label_path)[:-len("gtFine_labelIds.png")] \
            + "leftImg8bit.png"
        image_path = os.path.join(self.img_root, name)
        sample = {"image": _load_rgb(image_path),
                  "label": _load_label(label_path)}
        out = self.transform(sample, rng)
        out["name"] = name
        return out


class TestSet:
    """Label-free (or color-labeled) test sweep set."""

    NUM_CLASSES = NUM_CLASSES
    __test__ = False  # not a pytest class (name parity with the reference)

    def __init__(self, img_root: str, label_root: str, crop_size: int):
        self.label_root = label_root
        self.images = recursive_glob(img_root, ".png")
        if not self.images:
            raise FileNotFoundError(f"no images in {img_root}")
        self.transform = T.eval_transforms(crop_size)

    def __len__(self):
        return len(self.images)

    def __getitem__(self, index: int, rng=None) -> Dict[str, np.ndarray]:
        image_path = self.images[index]
        name = os.path.basename(image_path)
        img = _load_rgb(image_path)
        if self.label_root:
            label_path = os.path.join(
                self.label_root,
                name[:-len("leftImg8bit.png")] + "gtFine_color.png")
            label = _load_label(label_path)
        else:
            label = Image.fromarray(
                np.full((img.size[1], img.size[0]), IGNORE_INDEX, np.uint8))
        out = self.transform({"image": img, "label": label}, rng)
        out["name"] = name
        return out


class GTA5:
    """Single-domain GTA5 set with an in-memory 70/20/10 split (gta5.py)."""

    NUM_CLASSES = NUM_CLASSES

    def __init__(self, src_img_root: str, src_label_root: str,
                 base_size: int, crop_size: int, split: str = "train",
                 shuffle_seed: int = 720, staged: bool = False,
                 cache: bool = False, cache_bytes: Optional[int] = None):
        self.src_label_root = src_label_root
        self.split = split
        self.staged = staged and split == "train"
        self.cache = _FrameCache(cache_bytes) \
            if (cache and split == "train") else None
        self.base_size = base_size
        self.crop_size = crop_size
        files = recursive_glob(src_img_root, ".png")
        if not files:
            raise FileNotFoundError(f"no source images in {src_img_root}")
        random.Random(shuffle_seed).shuffle(files)
        n = len(files)
        if split == "train":
            self.files = files[:int(n * 0.7)]
            self.transform = T.train_transforms(base_size, crop_size)
        elif split == "val":
            self.files = files[int(n * 0.7):int(n * 0.9)]
            self.transform = T.val_scalecrop_transforms(crop_size)
        else:
            self.files = files[int(n * 0.9):]
            self.transform = T.eval_transforms(crop_size)

    def __len__(self):
        return len(self.files)

    def __getitem__(self, index: int, rng: Optional[random.Random] = None
                    ) -> Dict[str, np.ndarray]:
        rng = rng or random
        src_path = self.files[index]
        label_path = os.path.join(self.src_label_root,
                                  os.path.basename(src_path))
        if self.staged:
            if self.cache is not None:
                return {"image": self.cache.get(src_path, _load_rgb),
                        "label": self.cache.get(label_path, _load_label),
                        "name": os.path.basename(src_path)}
            return {"image": np.asarray(_load_rgb(src_path), np.uint8),
                    "label": np.asarray(_load_label(label_path), np.uint8),
                    "name": os.path.basename(src_path)}
        if self.cache is not None and self.split == "train":
            from s2r_tpu.data import hostcrop
            out = hostcrop.augment_sample(
                {"image": self.cache.get(src_path, _load_rgb),
                 "label": self.cache.get(label_path, _load_label)},
                rng, self.base_size, self.crop_size)
            out["name"] = os.path.basename(src_path)
            return out
        sample = {"image": _load_rgb(src_path), "label": _load_label(label_path)}
        out = self.transform(sample, rng)
        out["name"] = os.path.basename(src_path)
        return out
