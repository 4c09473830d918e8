"""Fused on-device training augmentation.

The reference runs RandomHorizontalFlip -> RandomScaleCrop -> Blur ->
Normalize in PIL on DataLoader workers (custom_transforms.py, SURVEY §2.3).
This module moves the geometry + blur + normalization onto the TPU as ONE
jitted, vmapped program over raw uint8 frames:

  host: decode PNG -> fixed "staging" shape (the dataset's native size)
  device, per sample: random flip, random short-edge scale in
  [0.5, 2.0]*base_size, pad (image 0 / label 255) and random crop_size crop
  — all expressed as a single bilinear (image) / nearest (label) warp of the
  staged frame — then p=0.5 Gaussian blur (radius U(0,1), independent per
  image of the pair, custom_transforms.py:92-105) and ImageNet
  normalization.  No intermediate resized image is ever materialized; uint8
  crosses PCIe instead of f32 (4x less host->device traffic than the PIL
  path ships).

Parity note: PIL's downscale filter is an area-weighted triangle, not pure
bilinear sampling, so this path matches the reference's *distribution* of
augmented views, not its pixels (SURVEY §7 prescribes asserting parity on
mIoU, not pixels, for augmentation).  Enable with --device-aug.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from s2r_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD


def _crop_hw(crop_size) -> tuple:
    """crop_size int (square, reference semantics) or (h, w)."""
    if isinstance(crop_size, (tuple, list)):
        return int(crop_size[0]), int(crop_size[1])
    return int(crop_size), int(crop_size)


_BLUR_TAPS = 4  # support ±4 px covers 3.5σ at the max radius (σ < 1 + kernel
#                 ringing margin); PIL's blur support at radius r is ~3.5r


def _gaussian_blur(x: jnp.ndarray, sigma) -> jnp.ndarray:
    """Separable Gaussian with traced sigma (PIL GaussianBlur radius ≈ σ),
    edge-extended boundaries like PIL's %-extension.  x: [H, W, C] f32."""
    offs = jnp.arange(-_BLUR_TAPS, _BLUR_TAPS + 1, dtype=jnp.float32)
    w = jnp.exp(-0.5 * (offs / jnp.maximum(sigma, 1e-4)) ** 2)
    w = w / w.sum()
    h, wd = x.shape[0], x.shape[1]
    xp = jnp.pad(x, ((_BLUR_TAPS, _BLUR_TAPS), (0, 0), (0, 0)), mode="edge")
    x = sum(w[k] * xp[k:k + h] for k in range(2 * _BLUR_TAPS + 1))
    xp = jnp.pad(x, ((0, 0), (_BLUR_TAPS, _BLUR_TAPS), (0, 0)), mode="edge")
    return sum(w[k] * xp[:, k:k + wd] for k in range(2 * _BLUR_TAPS + 1))


def _sample_params(rng, base_size: int, crop_size, sh: int, sw: int):
    """Random flip/scale/crop parameters for one sample (traced scalars).

    Mirrors RandomScaleCrop's math (custom_transforms.py:114-143): short
    edge scaled to U{0.5b .. 2b}, pad right/bottom up to crop_size, uniform
    crop corner over the padded extent.
    """
    ch, cw = _crop_hw(crop_size)
    k_flip, k_scale, k_x, k_y = jax.random.split(rng, 4)
    flip = jax.random.bernoulli(k_flip, 0.5)
    short = jax.random.randint(k_scale, (), base_size // 2,
                               2 * base_size + 1).astype(jnp.float32)
    shf, swf = jnp.float32(sh), jnp.float32(sw)
    # scaled dims (oh, ow), keeping aspect (short edge -> `short`)
    oh = jnp.where(shf > swf, jnp.floor(shf * short / swf), short)
    ow = jnp.where(shf > swf, short, jnp.floor(swf * short / shf))
    # padded extent is at least the crop; crop corner uniform over slack
    pad_h = jnp.maximum(ch, oh)
    pad_w = jnp.maximum(cw, ow)
    u1 = jax.random.uniform(k_y, ())
    u2 = jax.random.uniform(k_x, ())
    y1 = jnp.floor(u1 * (pad_h - ch + 1.0))
    x1 = jnp.floor(u2 * (pad_w - cw + 1.0))
    return flip, oh, ow, y1, x1


def _warp_one(img: jnp.ndarray, lbl, rng, base_size: int, crop_size,
              tgt: jnp.ndarray = None, blur: bool = True):
    """Augment one (image [, target image], label) triple."""
    ch, cw = _crop_hw(crop_size)
    sh, sw = img.shape[0], img.shape[1]
    k_geom, k_gate, k_r1, k_r2 = jax.random.split(rng, 4)
    flip, oh, ow, y1, x1 = _sample_params(k_geom, base_size, crop_size,
                                          sh, sw)
    # one p=0.5 gate for the sample, independent radii per image (reference
    # custom_transforms.py:97-101)
    blur_gate = jax.random.bernoulli(k_gate, 0.5)

    # output pixel centers in scaled space
    ys = y1 + jnp.arange(ch, dtype=jnp.float32)   # scaled-space rows
    xs = x1 + jnp.arange(cw, dtype=jnp.float32)   # scaled-space cols
    inside = (ys[:, None] < oh) & (xs[None, :] < ow)  # pad region mask

    # map to source coords (center-aligned affine, like PIL's filters)
    src_y = (ys + 0.5) * (sh / oh) - 0.5              # [crop]
    src_x = (xs + 0.5) * (sw / ow) - 0.5              # [crop]
    src_x_flipped = jnp.where(flip, (sw - 1.0) - src_x, src_x)

    def bilinear(frame):
        y0 = jnp.clip(jnp.floor(src_y), 0, sh - 1)
        x0 = jnp.clip(jnp.floor(src_x_flipped), 0, sw - 1)
        y1i = jnp.clip(y0 + 1, 0, sh - 1).astype(jnp.int32)
        x1i = jnp.clip(x0 + 1, 0, sw - 1).astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        x0i = x0.astype(jnp.int32)
        wy = jnp.clip(src_y - y0, 0.0, 1.0)[:, None, None]
        wx = jnp.clip(src_x_flipped - x0, 0.0, 1.0)[None, :, None]
        f = frame.astype(jnp.float32)
        # two-stage gather: rows then columns (keeps gathers 1-D per axis)
        top = f[y0i]        # [crop, SW, C]
        bot = f[y1i]
        row = top * (1 - wy) + bot * wy            # [crop, SW, C]
        left = row[:, x0i]                         # [crop, crop, C]
        right = row[:, x1i]
        return left * (1 - wx) + right * wx

    def nearest_label(frame):
        yn = jnp.clip(jnp.round(src_y), 0, sh - 1).astype(jnp.int32)
        xn = jnp.clip(jnp.round(src_x_flipped), 0, sw - 1).astype(jnp.int32)
        return frame[yn][:, xn]

    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)

    def finish_image(frame, k_radius):
        # reference order: pad-fill 0 happens BEFORE blur + normalization
        # (RandomScaleCrop fill=0 -> RandomGaussianBlur -> Normalize), so
        # padded pixels end up at (0 - mean)/std, and blur smears the pad
        # boundary — reproduced exactly.
        raw = jnp.where(inside[:, :, None], bilinear(frame), 0.0)  # 0..255
        if blur:
            radius = jax.random.uniform(k_radius, ())
            raw = jnp.where(blur_gate, _gaussian_blur(raw, radius), raw)
        return (raw / 255.0 - mean) / std

    out_img = finish_image(img, k_r1)
    out_lbl = jnp.where(inside, nearest_label(lbl).astype(jnp.int32), 255)
    if tgt is None:
        return out_img, out_lbl
    return out_img, finish_image(tgt, k_r2), out_lbl


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def augment_paired_batch(batch: Dict[str, jnp.ndarray], rng,
                         base_size: int, crop_size: int,
                         blur: bool = True) -> Dict[str, jnp.ndarray]:
    """Device-side TrainSet augmentation.

    batch: {'src_image' u8 [N,SH,SW,3], 'tgt_image' u8 [N,SH',SW',3],
            'src_label' u8/i32 [N,SH,SW]} -> reference train-transform output
    shapes ({'src_image','tgt_image' f32 [N,c,c,3], 'src_label' i32}).
    The pair shares flip/scale/crop parameters AND the blur gate (blur radii
    are independent), like the joint PIL transforms; the target frame is
    warped with its own source dims.
    """
    n = batch["src_image"].shape[0]
    keys = jax.random.split(rng, n)

    def one(img, tgt, lbl, key):
        # The reference applies identical geometry to src and tgt (they are
        # the same size in its pipeline); we warp each from its own staging
        # shape with the same randomness.
        out_img, out_tgt, out_lbl = _warp_one(img, lbl, key, base_size,
                                              crop_size, tgt=tgt, blur=blur)
        return out_img, out_tgt, out_lbl

    src, tgt, lbl = jax.vmap(one)(batch["src_image"], batch["tgt_image"],
                                  batch["src_label"], keys)
    return {"src_image": src, "tgt_image": tgt, "src_label": lbl}


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def augment_batch(batch: Dict[str, jnp.ndarray], rng, base_size: int,
                  crop_size: int, blur: bool = True) -> Dict[str, jnp.ndarray]:
    """Device-side single-domain (GTA5) train augmentation (the gta5.py:71-78
    composition, blur included)."""
    n = batch["image"].shape[0]
    keys = jax.random.split(rng, n)
    img, lbl = jax.vmap(
        lambda i, l, k: _warp_one(i, l, k, base_size, crop_size, blur=blur)
    )(batch["image"], batch["label"], keys)
    return {"image": img, "label": lbl}


def normalize_u8_batch(batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Finish a u8-staged, host-augmented batch on device: images /255,
    ImageNet-normalize to f32; u8 labels widen to i32.  The transfer-optimal
    feed: the native pipeline ships uint8 (4x less H2D traffic,
    native/src/pipeline.cpp::s2r_train_batch emit_u8) and this jitted
    elementwise pass restores the exact f32 semantics of host
    normalization (custom_transforms.py:7-33)."""
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    out = {}
    for k, v in batch.items():
        if not hasattr(v, "dtype"):
            out[k] = v
        elif "label" in k:
            out[k] = v.astype(jnp.int32)
        elif v.dtype == jnp.uint8:
            out[k] = (v.astype(jnp.float32) / 255.0 - mean) / std
        else:
            out[k] = v
    return out
