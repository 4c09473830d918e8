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
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np
from PIL import Image

import jax.numpy as jnp


def _load_batch(paths, h, w, input_kind, mean, std):
    frames = []
    for p in paths:
        img = Image.open(p).convert("RGB").resize((w, h), Image.BILINEAR)
        frames.append(np.asarray(img, np.uint8))
    batch = np.stack(frames)
    if input_kind == "rgb8":
        return batch
    return ((batch.astype(np.float32) / 255.0 - mean) / std).astype(
        np.float32)


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
    args = parser.parse_args(argv)

    from s2r_tpu.cli._eval_common import _save_prediction
    from s2r_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
    from s2r_tpu.io.serving import load_servable

    serve = load_servable(args.servable)
    meta = serve.meta
    n, h, w, _ = meta["input_shape"]
    input_kind = meta.get("input", "normalized")
    output_kind = meta.get("output", "labels")
    print(f"servable: {meta.get('backbone')} {h}x{w} batch {n}, "
          f"input={input_kind}, output={output_kind}")

    paths = []
    for root, _, files in os.walk(args.images):
        paths += [os.path.join(root, f) for f in sorted(files)
                  if f.lower().endswith((".png", ".jpg", ".jpeg"))]
    if not paths:
        raise FileNotFoundError(f"no frames under {args.images}")

    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    done = 0
    t0 = time.time()
    for i in range(0, len(paths), n):
        chunk = paths[i:i + n]
        batch = _load_batch(chunk, h, w, input_kind, mean, std)
        if len(chunk) < n:  # pad the tail batch; outputs sliced below
            pad = np.repeat(batch[-1:], n - len(chunk), axis=0)
            batch = np.concatenate([batch, pad])
        out = np.asarray(serve(jnp.asarray(batch)))
        pred = (out if output_kind == "labels"
                else np.argmax(out, axis=-1)).astype(np.int32)
        for j, p in enumerate(chunk):
            _save_prediction(pred[j], os.path.basename(p), args.out_dir,
                             args.dataset)
        done += len(chunk)
    dt = time.time() - t0
    print(f"saved {done} predictions to {args.out_dir} "
          f"({1000.0 * dt / done:.1f} ms/image incl. host IO)")
    return done


if __name__ == "__main__":
    main()
