"""Batch-level eval loader backed by the native C++ pipeline.

One C call per batch decodes, resizes (FixedResize semantics), remaps and
normalizes on a std::thread pool, with one batch of lookahead prefetch —
replacing the per-sample PIL path for validation/test sweeps
(`--data-backend native`).
"""

from __future__ import annotations

import os
import threading
from typing import Dict, Iterator, List, Optional

from s2r_tpu import native
from s2r_tpu.data.datasets import _LUT
from s2r_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD


class NativeEvalLoader:
    def __init__(self, img_paths: List[str], lbl_paths: Optional[List[str]],
                 crop_size: int, batch_size: int, drop_last: bool = True,
                 threads: int = 8):
        assert native.available(), native.build_error()
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

    def _load(self, lo: int, hi: int) -> Dict:
        imgs = self.img_paths[lo:hi]
        lbls = None if self.lbl_paths is None else self.lbl_paths[lo:hi]
        images, labels = native.eval_batch(imgs, lbls, self.crop, _LUT,
                                           IMAGENET_MEAN, IMAGENET_STD,
                                           self.threads)
        return {"image": images, "label": labels,
                "name": [os.path.basename(p) for p in imgs]}

    def __iter__(self) -> Iterator[Dict]:
        ranges = []
        for lo in range(0, len(self.img_paths), self.batch_size):
            hi = min(lo + self.batch_size, len(self.img_paths))
            if self.drop_last and hi - lo < self.batch_size:
                break
            ranges.append((lo, hi))
        if not ranges:
            return
        # one-batch lookahead in a worker thread; exceptions propagate to
        # the consumer instead of surfacing as a missing result
        result = {}

        def fill(i):
            try:
                result[i] = self._load(*ranges[i])
            except Exception as e:  # re-raised on the consuming thread
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
