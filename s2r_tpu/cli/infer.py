"""Run a serving artifact over a directory of frames: .shlo in, PNGs out.

The deployment half of `cli.export --format servable`.  Unlike the
reference's test*.py sweep (reference: test_adapt.py:43-117, which
re-instantiates the full framework and loads the torch checkpoint per
run), this driver needs NO model code and NO checkpoint — the StableHLO
artifact carries the weights and the compiled eval forward; the host side
is just decode -> resize -> (normalize) -> batch -> save.

    python -m s2r_tpu.cli.infer --servable model.shlo \
        --images data/frames/ --out-dir result/

Outputs match cli.test_adapt: <stem>_labelId.png (Cityscapes labelIds)
+ <stem>_color.png per frame.  Frames are resized to the artifact's
baked H x W; the final partial batch is padded and the padding discarded.

The host loop is pipelined: per-frame decode+resize runs on a thread pool
(native C decoder when `s2r_tpu.native` is built, PIL otherwise), the next
`--prefetch` batches are assembled while the device runs the current one,
and PNG writes go to a writer pool — decode of batch i+1, device compute
of batch i, and saves of batch i-1 all overlap (the training loaders'
prefetch pattern, data/loader.py / data/native_loader.py).
"""

from __future__ import annotations

import argparse
import os
import time
from collections import deque
from concurrent.futures import ThreadPoolExecutor

import numpy as np
from PIL import Image

import jax.numpy as jnp


def _pick_backend(choice: str):
    """Resolve --host-backend: the native module or None (PIL)."""
    if choice == "pil":
        return None
    try:
        from s2r_tpu import native
        if native.available():
            return native
    except Exception:
        pass
    if choice == "native":
        raise RuntimeError("--host-backend native requested but the native "
                           "library is unavailable")
    return None


def _make_decode_one(native_mod, h, w, input_kind, mean, std):
    def decode_one(path: str) -> np.ndarray:
        if native_mod is not None and path.lower().endswith(".png"):
            img = native_mod.decode_png(path, 3)
            if img.shape[:2] != (h, w):
                img = native_mod.resize_bilinear(img, (h, w))
            if input_kind == "rgb8":
                return img
            return native_mod.normalize(img, mean, std)
        img = Image.open(path).convert("RGB").resize((w, h), Image.BILINEAR)
        arr = np.asarray(img, np.uint8)
        if input_kind == "rgb8":
            return arr
        return ((arr.astype(np.float32) / 255.0 - mean) / std).astype(
            np.float32)
    return decode_one


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="sweep a directory with a .shlo serving artifact")
    parser.add_argument("--servable", type=str, required=True)
    parser.add_argument("--images", type=str, required=True,
                        help="directory (recursive) of .png/.jpg frames")
    parser.add_argument("--out-dir", type=str, default="result",
                        dest="out_dir")
    parser.add_argument("--dataset", type=str, default="cityscapes",
                        help="palette for the color PNGs")
    parser.add_argument("--workers", type=int, default=None,
                        help="decode threads (default: cpu count)")
    parser.add_argument("--prefetch", type=int, default=2,
                        help="batches decoded ahead of the device")
    parser.add_argument("--host-backend", type=str, default="auto",
                        choices=["auto", "native", "pil"],
                        help="frame decoder: native C library when built "
                             "(auto), or force one")
    args = parser.parse_args(argv)

    from s2r_tpu.config import apply_platform_override
    apply_platform_override()

    from s2r_tpu.cli._eval_common import _save_prediction
    from s2r_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
    from s2r_tpu.io.serving import load_servable

    serve = load_servable(args.servable)
    meta = serve.meta
    n, h, w, _ = meta["input_shape"]
    input_kind = meta.get("input", "normalized")
    output_kind = meta.get("output", "labels")
    native_mod = _pick_backend(args.host_backend)
    print(f"servable: {meta.get('backbone')} {h}x{w} batch {n}, "
          f"input={input_kind}, output={output_kind}, "
          f"decoder={'native' if native_mod else 'pil'}")

    paths = []
    for root, _, files in os.walk(args.images):
        paths += [os.path.join(root, f) for f in sorted(files)
                  if f.lower().endswith((".png", ".jpg", ".jpeg"))]
    if not paths:
        raise FileNotFoundError(f"no frames under {args.images}")
    batches = [paths[i:i + n] for i in range(0, len(paths), n)]

    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    decode_one = _make_decode_one(native_mod, h, w, input_kind, mean, std)
    workers = args.workers or os.cpu_count() or 1

    frame_pool = ThreadPoolExecutor(workers)
    batch_pool = ThreadPoolExecutor(max(1, args.prefetch))
    save_pool = ThreadPoolExecutor(2)

    def assemble(chunk):
        batch = np.stack(list(frame_pool.map(decode_one, chunk)))
        if len(chunk) < n:  # pad the tail batch; outputs sliced below
            pad = np.repeat(batch[-1:], n - len(chunk), axis=0)
            batch = np.concatenate([batch, pad])
        return batch

    done = 0
    t0 = time.time()
    t_first = None  # set after batch 0: first call pays the servable compile
    depth = min(max(args.prefetch, 1), len(batches))
    pending = deque(batch_pool.submit(assemble, batches[b])
                    for b in range(depth))
    next_sub = depth
    save_futs = deque()
    for chunk in batches:
        batch = pending.popleft().result()
        if next_sub < len(batches):  # keep the decode pipeline full
            pending.append(batch_pool.submit(assemble, batches[next_sub]))
            next_sub += 1
        out = np.asarray(serve(jnp.asarray(batch)))
        pred = (out if output_kind == "labels"
                else np.argmax(out, axis=-1)).astype(np.int32)
        for j, p in enumerate(chunk):
            save_futs.append(save_pool.submit(
                _save_prediction, pred[j], os.path.basename(p), args.out_dir,
                args.dataset))
        done += len(chunk)
        if t_first is None:
            t_first = time.time()
        # bound the save backlog: each queued future pins a full-res
        # prediction view; on a long sweep with slow disk that's unbounded
        # host memory.  Keep at most ~4 batches of saves in flight.
        while len(save_futs) > 4 * n:
            save_futs.popleft().result()
    for f in save_futs:
        f.result()
    frame_pool.shutdown()
    batch_pool.shutdown()
    save_pool.shutdown()
    dt = time.time() - t0
    msg = (f"saved {done} predictions to {args.out_dir} "
           f"({1000.0 * dt / done:.1f} ms/image incl. host IO")
    if t_first is not None and done > n:
        # steady state: exclude batch 0, which pays the one-time servable
        # deserialize+compile (minutes over a slow link) — the number that
        # scales with sweep length
        steady = 1000.0 * (time.time() - t_first) / (done - n)
        msg += f"; steady-state after the first-batch compile: {steady:.1f}"
    print(msg + ")")
    return done


if __name__ == "__main__":
    main()
