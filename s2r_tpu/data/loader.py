"""Batched data loading with background prefetch.

Replaces the reference's torch DataLoader usage (dataloders/__init__.py:4-28):
- make_data_loader(cfg) -> (train_loader, val_loader, test_loader, nclass)
  with the same split/shuffle/drop_last semantics (shuffle train only;
  drop_last=True on ALL splits — a reference quirk preserved behind
  cfg.val_drop_last, SURVEY.md §2.6).
- Decode + augmentation run in a thread pool (PIL releases the GIL for its
  hot paths) with a bounded prefetch queue, producing ready-stacked NHWC
  numpy batches; device transfer and sharding happen in
  s2r_tpu.parallel.feed.
- Per-sample RNG is derived from (seed, epoch, index): epochs are
  reproducible and workers race-free, unlike the reference's shared global
  `random` state across fork workers.
"""

from __future__ import annotations

import os
import queue
import random
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional

import numpy as np

from s2r_tpu.config import Config
from s2r_tpu.data import datasets as D
from s2r_tpu.data import synthetic as S


def _collate(samples: List[Dict]) -> Dict[str, np.ndarray]:
    out = {}
    for k in samples[0]:
        vals = [s[k] for s in samples]
        if isinstance(vals[0], str):
            out[k] = vals
        else:
            out[k] = np.stack(vals)
    return out


class DataLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = True, num_workers: int = 4, seed: int = 0,
                 prefetch: int = 4, process_index: int = 0,
                 process_count: int = 1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(num_workers, 1)
        self.seed = seed
        self.prefetch = prefetch
        self.epoch = 0
        # Multi-host input sharding: batch_size is the GLOBAL batch; every
        # host builds the identical epoch permutation (RNG seeded by
        # (seed, epoch) only) and takes a disjoint strided slice of each
        # global batch, so the assembled global array (mesh.put_global)
        # covers each batch exactly once.
        if process_count > 1 and batch_size % process_count:
            raise ValueError(
                f"global batch_size {batch_size} must be divisible by "
                f"process_count {process_count}")
        self.process_index = process_index
        self.process_count = process_count

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _index_batches(self) -> List[List[int]]:
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            random.Random((self.seed, self.epoch).__hash__()).shuffle(idx)
        batches = [idx[i:i + self.batch_size]
                   for i in range(0, len(idx), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]
        else:
            batches = [b for b in batches if b]
        if self.process_count > 1:
            # Ragged tails can't form a uniform global array; drop them
            # (all hosts agree — the permutation is host-independent).
            batches = [b[self.process_index::self.process_count]
                       for b in batches if len(b) % self.process_count == 0]
        return batches

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        batches = self._index_batches()
        epoch = self.epoch

        def fetch(i: int) -> Dict:
            rng = random.Random((self.seed, epoch, i).__hash__())
            return self.dataset.__getitem__(i, rng=rng)

        with ThreadPoolExecutor(self.num_workers) as pool:
            pending = queue.Queue()
            depth = min(self.prefetch, len(batches))

            def submit(batch_idx: int):
                futs = [pool.submit(fetch, i) for i in batches[batch_idx]]
                pending.put(futs)

            for b in range(depth):
                submit(b)
            next_to_submit = depth
            for _ in range(len(batches)):
                futs = pending.get()
                if next_to_submit < len(batches):
                    submit(next_to_submit)
                    next_to_submit += 1
                yield _collate([f.result() for f in futs])


def make_data_loader(cfg: Config, seed: Optional[int] = None):
    """(train, val, test, nclass) — parity with dataloders/__init__.py:4-28,
    plus the 'synthetic' dataset for data-free runs."""
    seed = cfg.seed if seed is None else seed
    from s2r_tpu.core.distributed import process_info

    pi, pc = process_info()
    kw = dict(num_workers=cfg.workers, seed=seed, process_index=pi,
              process_count=pc)
    if cfg.dataset == "gtav2cityscapes":
        train_set = D.TrainSet(cfg.src_img_root, cfg.src_label_root,
                               cfg.tgt_img_root, cfg.base_size,
                               cfg.crop_size, staged=cfg.device_aug,
                               cache=cfg.data_cache,
                               cache_bytes=int(cfg.data_cache_gb * 1e9))
        val_set = D.ValSet(cfg.val_img_root, cfg.val_label_root,
                           cfg.crop_size)
        test_set = D.TestSet(cfg.test_img_root, cfg.test_label_root,
                             cfg.crop_size)
        if cfg.data_backend == "native":
            from s2r_tpu import native
            from s2r_tpu.data.native_loader import (NativeEvalLoader,
                                                    NativeTrainLoader)
            if not native.available():
                raise RuntimeError(
                    f"--data-backend native unavailable: "
                    f"{native.build_error()}")
            train = NativeTrainLoader(train_set.sources, cfg.src_label_root,
                                      train_set.targets, cfg.base_size,
                                      cfg.crop_size, cfg.batch_size,
                                      seed=seed, threads=cfg.workers,
                                      process_index=pi, process_count=pc)
            val_imgs = [os.path.join(
                cfg.val_img_root,
                os.path.basename(p)[:-len("gtFine_labelIds.png")]
                + "leftImg8bit.png") for p in val_set.labels]
            val = NativeEvalLoader(val_imgs, val_set.labels, cfg.crop_size,
                                   cfg.batch_size,
                                   drop_last=cfg.val_drop_last,
                                   threads=cfg.workers,
                                   process_index=pi, process_count=pc)
            test = NativeEvalLoader(test_set.images, None, cfg.crop_size,
                                    cfg.batch_size,
                                    drop_last=cfg.val_drop_last,
                                    threads=cfg.workers,
                                    process_index=pi, process_count=pc)
            return train, val, test, train_set.NUM_CLASSES
    elif cfg.dataset == "gtav":
        train_set = D.GTA5(cfg.src_img_root, cfg.src_label_root,
                           cfg.base_size, cfg.crop_size, "train",
                           staged=cfg.device_aug, cache=cfg.data_cache,
                           cache_bytes=int(cfg.data_cache_gb * 1e9))
        val_set = D.GTA5(cfg.src_img_root, cfg.src_label_root, cfg.base_size,
                         cfg.crop_size, "val")
        test_set = D.GTA5(cfg.src_img_root, cfg.src_label_root, cfg.base_size,
                          cfg.crop_size, "test")
    elif cfg.dataset == "synthetic":
        train_set = S.SyntheticTrainSet(cfg.crop_size,
                                        length=8 * cfg.batch_size,
                                        staged=cfg.device_aug)
        eval_n = 4 * max(cfg.batch_size, cfg.test_batch_size, 1)
        val_set = S.SyntheticEvalSet(cfg.crop_size, length=eval_n)
        test_set = S.SyntheticEvalSet(cfg.crop_size, length=eval_n // 2,
                                      seed=2)
    else:
        raise NotImplementedError(cfg.dataset)

    # All three loaders use batch_size (the reference's --test-batch-size is
    # parsed but unused by make_data_loader — dataloders/__init__.py:11-13).
    train = DataLoader(train_set, cfg.batch_size, shuffle=True,
                       drop_last=True, **kw)
    val = DataLoader(val_set, cfg.batch_size, shuffle=False,
                     drop_last=cfg.val_drop_last, **kw)
    test = DataLoader(test_set, cfg.batch_size, shuffle=False,
                      drop_last=cfg.val_drop_last, **kw)
    return train, val, test, train_set.NUM_CLASSES
