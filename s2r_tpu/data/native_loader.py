"""Batch-level loaders backed by the native C++ pipeline.

One C call per batch decodes, resizes, remaps and normalizes on a
std::thread pool, with one batch of lookahead prefetch — replacing the
per-sample PIL path (`--data-backend native`):
- NativeEvalLoader: FixedResize eval semantics for val/test sweeps
- NativeTrainLoader: the full paired train path (flip + RandomScaleCrop +
  blur + normalize/remap, reference custom_transforms.py:7-147) with
  per-sample seeded augmentation RNG and per-access random target pairing
  (gtav2cityscapes.py:54)
"""

from __future__ import annotations

import os
import random
import threading
from typing import Dict, Iterator, List, Optional

import numpy as np

from s2r_tpu import native
from s2r_tpu.data.datasets import _LUT
from s2r_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD


def _shard_batches(batches: List[List[int]], process_index: int,
                   process_count: int) -> List[List[int]]:
    """Per-host strided slice of each global index batch — identical
    semantics to data/loader.py::DataLoader._index_batches: every host
    builds the same global batches (host-independent RNG) and takes a
    disjoint stride; ragged batches that can't split evenly are dropped
    by all hosts alike."""
    if process_count <= 1:
        return batches
    return [b[process_index::process_count] for b in batches
            if len(b) % process_count == 0]


def _lookahead(ranges, load):
    """One-batch lookahead in a worker thread; exceptions re-raise on the
    consuming thread."""
    if not ranges:
        return
    result = {}

    def fill(i):
        try:
            result[i] = load(ranges[i])
        except Exception as e:
            result[i] = e

    t = threading.Thread(target=fill, args=(0,))
    t.start()
    for i in range(len(ranges)):
        t.join()
        batch = result.pop(i)
        if i + 1 < len(ranges):
            t = threading.Thread(target=fill, args=(i + 1,))
            t.start()
        if isinstance(batch, Exception):
            raise batch
        yield batch


class NativeTrainLoader:
    """Paired train loader: shuffled source epochs, random target pairing,
    whole-batch native augmentation.

    Epoch permutation and per-sample RNG derive from (seed, epoch, index) —
    the same determinism contract as data/loader.py::DataLoader, so resume
    reproduces batches.  crop_size may be an int (square, reference
    semantics) or (h, w)."""

    def __init__(self, src_imgs: List[str], label_root: str,
                 tgt_imgs: Optional[List[str]], base_size: int, crop_size,
                 batch_size: int, seed: int = 0, threads: int = 8,
                 blur: bool = True, emit_u8: bool = False,
                 process_index: int = 0, process_count: int = 1):
        assert native.available(), native.build_error()
        if process_count > 1 and batch_size % process_count:
            raise ValueError(
                f"global batch_size {batch_size} must be divisible by "
                f"process_count {process_count}")
        self.process_index = process_index
        self.process_count = process_count
        self.src_imgs = src_imgs
        self.label_root = label_root
        self.tgt_imgs = tgt_imgs
        self.base_size = base_size
        self.crop_size = crop_size
        self.batch_size = batch_size
        self.seed = seed
        self.threads = threads
        self.blur = blur
        self.emit_u8 = emit_u8
        self.epoch = 0

    def __len__(self):
        return len(self.src_imgs) // self.batch_size  # drop_last=True

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _load(self, idx: List[int]) -> Dict:
        srcs = [self.src_imgs[i] for i in idx]
        lbls = [os.path.join(self.label_root, os.path.basename(p))
                for p in srcs]
        tgts = None
        if self.tgt_imgs is not None:
            tgts = []
            for i in idx:
                r = random.Random((self.seed, self.epoch, i).__hash__())
                tgts.append(self.tgt_imgs[r.randint(0,
                                                    len(self.tgt_imgs) - 1)])
        seeds = np.asarray(
            [(self.seed, self.epoch, i).__hash__() & 0xFFFFFFFFFFFFFFFF
             for i in idx], np.uint64)
        src, lbl, tgt = native.train_batch(
            srcs, lbls, tgts, self.base_size, self.crop_size, _LUT,
            IMAGENET_MEAN, IMAGENET_STD, seeds=seeds, blur=self.blur,
            emit_u8=self.emit_u8, threads=self.threads)
        out = {"src_image": src, "src_label": lbl}
        if tgt is not None:
            out["tgt_image"] = tgt
        return out

    def _index_batches(self) -> List[List[int]]:
        order = list(range(len(self.src_imgs)))
        random.Random((self.seed, self.epoch).__hash__()).shuffle(order)
        ranges = [order[i:i + self.batch_size]
                  for i in range(0, len(order), self.batch_size)]
        ranges = [b for b in ranges if len(b) == self.batch_size]
        return _shard_batches(ranges, self.process_index,
                              self.process_count)

    def __iter__(self) -> Iterator[Dict]:
        yield from _lookahead(self._index_batches(), self._load)


class NativeEvalLoader:
    def __init__(self, img_paths: List[str], lbl_paths: Optional[List[str]],
                 crop_size: int, batch_size: int, drop_last: bool = True,
                 threads: int = 8, process_index: int = 0,
                 process_count: int = 1):
        assert native.available(), native.build_error()
        if process_count > 1 and batch_size % process_count:
            raise ValueError(
                f"global batch_size {batch_size} must be divisible by "
                f"process_count {process_count}")
        self.process_index = process_index
        self.process_count = process_count
        self.img_paths = img_paths
        self.lbl_paths = lbl_paths
        self.crop = crop_size
        self.batch_size = batch_size
        self.drop_last = drop_last
        self.threads = threads

    def __len__(self):
        n = len(self.img_paths)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        pass

    def _load(self, idx: List[int]) -> Dict:
        imgs = [self.img_paths[i] for i in idx]
        lbls = (None if self.lbl_paths is None
                else [self.lbl_paths[i] for i in idx])
        images, labels = native.eval_batch(imgs, lbls, self.crop, _LUT,
                                           IMAGENET_MEAN, IMAGENET_STD,
                                           self.threads)
        return {"image": images, "label": labels,
                "name": [os.path.basename(p) for p in imgs]}

    def __iter__(self) -> Iterator[Dict]:
        n = len(self.img_paths)
        ranges = [list(range(lo, min(lo + self.batch_size, n)))
                  for lo in range(0, n, self.batch_size)]
        if self.drop_last:
            ranges = [b for b in ranges if len(b) == self.batch_size]
        ranges = _shard_batches(ranges, self.process_index,
                                self.process_count)
        yield from _lookahead(ranges, self._load)
