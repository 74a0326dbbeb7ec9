"""ctypes bindings for the native fastloader (native/libfastloader.so).

GIL-free multithreaded host-side data kernels:
* bilinear resize / normalize / fused crop-resize-norm for image pipelines
* threaded .npy batch loading for pre-extracted latents (the production DiT
  training input path)

Falls back to numpy implementations when the library isn't built
(``native/build.sh`` builds it in a few seconds with the stock g++).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Sequence

import numpy as np

__all__ = ["available", "resize_bilinear_u8", "crop_resize_norm",
           "batch_load_npy", "u8_to_f32_norm"]

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "libfastloader.so")

_lib = None
if os.path.exists(_LIB_PATH):
    try:
        _lib = ctypes.CDLL(_LIB_PATH)
        _lib.pf_resize_bilinear_u8.argtypes = [
            ctypes.c_void_p] + [ctypes.c_int64] * 3 + [ctypes.c_void_p] + [ctypes.c_int64] * 2
        _lib.pf_u8_to_f32_norm.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
        _lib.pf_crop_resize_norm.argtypes = [
            ctypes.c_void_p] + [ctypes.c_int64] * 3 + [ctypes.c_void_p] + [ctypes.c_int64] * 4
        _lib.pf_crop_resize_norm.restype = ctypes.c_int
        _lib.pf_batch_load_npy.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int]
        _lib.pf_batch_load_npy.restype = ctypes.c_int
    except OSError:
        _lib = None


def available() -> bool:
    return _lib is not None


def resize_bilinear_u8(img: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """uint8 [H, W, C] -> [oh, ow, C], align_corners=False."""
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    out = np.empty((oh, ow, c), np.uint8)
    if _lib is not None:
        _lib.pf_resize_bilinear_u8(
            img.ctypes.data, h, w, c, out.ctypes.data, oh, ow)
        return out
    # numpy fallback
    fy = np.clip((np.arange(oh) + 0.5) * h / oh - 0.5, 0, h - 1)
    fx = np.clip((np.arange(ow) + 0.5) * w / ow - 0.5, 0, w - 1)
    y0 = fy.astype(np.int64); y1 = np.minimum(y0 + 1, h - 1)
    x0 = fx.astype(np.int64); x1 = np.minimum(x0 + 1, w - 1)
    wy = (fy - y0)[:, None, None]
    wx = (fx - x0)[None, :, None]
    imgf = img.astype(np.float32)
    top = imgf[y0][:, x0] * (1 - wx) + imgf[y0][:, x1] * wx
    bot = imgf[y1][:, x0] * (1 - wx) + imgf[y1][:, x1] * wx
    return (top * (1 - wy) + bot * wy + 0.5).astype(np.uint8)


def u8_to_f32_norm(img: np.ndarray) -> np.ndarray:
    img = np.ascontiguousarray(img, np.uint8)
    out = np.empty(img.shape, np.float32)
    if _lib is not None:
        _lib.pf_u8_to_f32_norm(img.ctypes.data, out.ctypes.data, img.size)
        return out
    return img.astype(np.float32) / 127.5 - 1.0


def crop_resize_norm(img: np.ndarray, th: int, tw: int,
                     top: int, left: int) -> np.ndarray:
    """Cover-resize + crop + normalize: uint8 [H, W, C] -> f32 [th, tw, C]."""
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    out = np.empty((th, tw, c), np.float32)
    if _lib is not None:
        rc = _lib.pf_crop_resize_norm(
            img.ctypes.data, h, w, c, out.ctypes.data, th, tw, top, left)
        if rc == 0:
            return out
    scale = max(th / h, tw / w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    resized = resize_bilinear_u8(img, nh, nw)
    return u8_to_f32_norm(resized[top: top + th, left: left + tw])


def batch_load_npy(paths: Sequence[str], item_shape, num_threads: int = 8
                   ) -> np.ndarray:
    """Load float32/float16 .npy files into one [N, *item_shape] batch."""
    n = len(paths)
    elems = int(np.prod(item_shape))
    out = np.empty((n, *item_shape), np.float32)
    if _lib is not None:
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        failures = _lib.pf_batch_load_npy(
            arr, n, out.ctypes.data, elems, num_threads)
        if failures == 0:
            return out
    for i, p in enumerate(paths):
        out[i] = np.load(p).astype(np.float32).reshape(item_shape)
    return out
