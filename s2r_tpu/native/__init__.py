"""Native (C++) host pipeline bindings.

Builds libs2rpipe.so on first use (g++ -O3, links libpng) and exposes it via
ctypes.  Falls back gracefully: `available()` returns False when the
toolchain or libpng is missing, and callers keep using the PIL path.

Exports:
- decode_png(path_or_bytes, channels) -> np.uint8 [H, W, C]
- resize_bilinear(img_u8, (h, w))     — PIL-BILINEAR-compatible
- resize_nearest(img_u8, (h, w))      — PIL-NEAREST-compatible
- remap(labels_u8, lut)               — 256-entry LUT gather
- normalize(img_u8, mean, std) -> f32
- eval_batch(img_paths, lbl_paths, crop, lut, mean, std, threads)
  -> (images f32 [N,crop,crop,3], labels i32 [N,crop,crop]) — the whole
  FixedResize -> Normalize eval pipeline, one C call on a thread pool.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "src", "pipeline.cpp")
_LIB_PATH = os.path.join(_DIR, "libs2rpipe.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _LIB_PATH, "-lpng", "-lz", "-lpthread"]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=120)
    except Exception as e:  # g++ missing etc.
        return f"{type(e).__name__}: {e}"
    if proc.returncode != 0:
        return proc.stderr[-2000:]
    return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            err = _build()
            if err:
                _build_error = err
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            _build_error = str(e)
            return None
        c_u8p = ctypes.POINTER(ctypes.c_uint8)
        c_f32p = ctypes.POINTER(ctypes.c_float)
        c_i32p = ctypes.POINTER(ctypes.c_int32)
        lib.s2r_png_info.argtypes = [c_u8p, ctypes.c_size_t,
                                     ctypes.POINTER(ctypes.c_int),
                                     ctypes.POINTER(ctypes.c_int)]
        lib.s2r_png_decode.argtypes = [c_u8p, ctypes.c_size_t, ctypes.c_int,
                                       c_u8p, ctypes.POINTER(ctypes.c_int),
                                       ctypes.POINTER(ctypes.c_int)]
        lib.s2r_resize_bilinear_u8.argtypes = [c_u8p] + [ctypes.c_int] * 3 + \
            [c_u8p] + [ctypes.c_int] * 2
        lib.s2r_resize_nearest_u8.argtypes = lib.s2r_resize_bilinear_u8.argtypes
        lib.s2r_remap_u8.argtypes = [c_u8p, c_u8p, ctypes.c_size_t, c_u8p]
        lib.s2r_remap_u8.restype = None
        lib.s2r_normalize_f32.argtypes = [c_u8p, ctypes.c_size_t, c_f32p,
                                          c_f32p, c_f32p]
        lib.s2r_normalize_f32.restype = None
        lib.s2r_eval_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int, ctypes.c_int, c_u8p, c_f32p, c_f32p, c_f32p,
            c_i32p, ctypes.c_int]
        lib.s2r_train_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, c_u8p, c_f32p, c_f32p,
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_int, c_i32p,
            ctypes.c_int, c_f32p, c_i32p, c_f32p, ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def decode_png(data, channels: int = 3) -> np.ndarray:
    lib = _load()
    assert lib is not None
    if isinstance(data, (str, os.PathLike)):
        with open(data, "rb") as f:
            data = f.read()
    buf = np.frombuffer(data, np.uint8)
    w, h = ctypes.c_int(), ctypes.c_int()
    rc = lib.s2r_png_info(_u8p(buf), buf.size, ctypes.byref(w),
                          ctypes.byref(h))
    if rc:
        raise ValueError(f"png info failed rc={rc}")
    out = np.empty((h.value, w.value, channels), np.uint8)
    rc = lib.s2r_png_decode(_u8p(buf), buf.size, channels, _u8p(out),
                            ctypes.byref(w), ctypes.byref(h))
    if rc:
        raise ValueError(f"png decode failed rc={rc}")
    return out[..., 0] if channels == 1 else out


def resize_bilinear(img: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(img, np.uint8)
    ch = 1 if img.ndim == 2 else img.shape[2]
    src = img.reshape(img.shape[0], img.shape[1], ch)
    out = np.empty((size[0], size[1], ch), np.uint8)
    lib.s2r_resize_bilinear_u8(_u8p(src), src.shape[1], src.shape[0], ch,
                               _u8p(out), size[1], size[0])
    return out[..., 0] if img.ndim == 2 else out


def resize_nearest(img: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(img, np.uint8)
    ch = 1 if img.ndim == 2 else img.shape[2]
    src = img.reshape(img.shape[0], img.shape[1], ch)
    out = np.empty((size[0], size[1], ch), np.uint8)
    lib.s2r_resize_nearest_u8(_u8p(src), src.shape[1], src.shape[0], ch,
                              _u8p(out), size[1], size[0])
    return out[..., 0] if img.ndim == 2 else out


def remap(labels: np.ndarray, lut: np.ndarray) -> np.ndarray:
    lib = _load()
    assert lib is not None
    labels = np.ascontiguousarray(labels, np.uint8)
    lut = np.ascontiguousarray(lut, np.uint8)
    out = np.empty_like(labels)
    lib.s2r_remap_u8(_u8p(labels), _u8p(out), labels.size, _u8p(lut))
    return out


def normalize(img: np.ndarray, mean, std) -> np.ndarray:
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(img, np.uint8)
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    out = np.empty(img.shape, np.float32)
    lib.s2r_normalize_f32(
        _u8p(img), img.size // 3,
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def eval_batch(img_paths: Sequence[str], lbl_paths: Optional[Sequence[str]],
               crop: int, lut: np.ndarray, mean, std,
               threads: int = 8):
    lib = _load()
    assert lib is not None
    n = len(img_paths)
    images = np.empty((n, crop, crop, 3), np.float32)
    labels = np.full((n, crop, crop), 255, np.int32)
    c_imgs = (ctypes.c_char_p * n)(*[p.encode() for p in img_paths])
    if lbl_paths is None:
        c_lbls = (ctypes.c_char_p * n)(*([b""] * n))
    else:
        c_lbls = (ctypes.c_char_p * n)(
            *[(p or "").encode() for p in lbl_paths])
    lut = np.ascontiguousarray(lut, np.uint8)
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    rc = lib.s2r_eval_batch(
        c_imgs, c_lbls, n, crop, _u8p(lut),
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), threads)
    if rc:
        bad = img_paths[rc - 1]
        raise RuntimeError(f"native eval_batch failed on item {rc - 1}: {bad}")
    return images, labels


def train_batch(src_paths: Sequence[str], lbl_paths: Sequence[str],
                tgt_paths: Optional[Sequence[str]], base_size: int,
                crop_size, lut: np.ndarray, mean, std,
                seeds: Optional[Sequence[int]] = None, blur: bool = True,
                forced: Optional[np.ndarray] = None, emit_u8: bool = False,
                threads: int = 8):
    """Full paired train-path batch (decode + flip + RandomScaleCrop + blur
    + normalize/remap) in one C call on a thread pool.

    crop_size: int (square, reference semantics) or (h, w).
    seeds: per-sample uint64 augmentation seeds (deterministic resume).
    forced: optional [n, 4] int32 (flip, short_size, x1, y1) pinning the
    geometric draws (blur off) for cross-implementation tests.
    emit_u8: skip host normalization; images/labels come back uint8 (4x
    less host->device traffic; normalize on device —
    data/device_aug.py::normalize_u8_batch).
    Returns (src [n,h,w,3], lbl [n,h,w], tgt [n,h,w,3] or None) — f32/i32,
    or u8 with emit_u8.
    """
    lib = _load()
    assert lib is not None
    n = len(src_paths)
    ch_, cw_ = (crop_size, crop_size) if isinstance(crop_size, int) \
        else (crop_size[0], crop_size[1])
    img_dt = np.uint8 if emit_u8 else np.float32
    lbl_dt = np.uint8 if emit_u8 else np.int32
    src = np.empty((n, ch_, cw_, 3), img_dt)
    lbl = np.empty((n, ch_, cw_), lbl_dt)
    tgt = None if tgt_paths is None else np.empty((n, ch_, cw_, 3), img_dt)
    c_src = (ctypes.c_char_p * n)(*[p.encode() for p in src_paths])
    c_lbl = (ctypes.c_char_p * n)(*[p.encode() for p in lbl_paths])
    c_tgt = None if tgt_paths is None else (
        ctypes.c_char_p * n)(*[p.encode() for p in tgt_paths])
    lut = np.ascontiguousarray(lut, np.uint8)
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    if seeds is None:
        seeds = np.arange(n, dtype=np.uint64)
    seeds = np.ascontiguousarray(seeds, np.uint64)
    c_forced = None
    if forced is not None:
        forced = np.ascontiguousarray(forced, np.int32)
        c_forced = forced.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    f32p = ctypes.POINTER(ctypes.c_float)
    rc = lib.s2r_train_batch(
        c_src, c_lbl, c_tgt, n, base_size, ch_, cw_, _u8p(lut),
        mean.ctypes.data_as(f32p), std.ctypes.data_as(f32p),
        seeds.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        int(blur), c_forced, int(emit_u8), src.ctypes.data_as(f32p),
        lbl.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        None if tgt is None else tgt.ctypes.data_as(f32p), threads)
    if rc:
        raise RuntimeError(
            f"native train_batch failed on item {rc - 1}: "
            f"{src_paths[rc - 1]}")
    return src, lbl, tgt
