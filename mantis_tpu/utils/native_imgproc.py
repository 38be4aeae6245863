"""ctypes bindings for the native image-preprocessing library.

native/imgproc.cpp does OpenMP-parallel batched bilinear resize +
normalize + HWC->CHW, replacing the PIL+numpy host path that otherwise
bottlenecks the ~185 img/s device encode throughput (the reference's
host-side native components are decord/PyAV + HF processors; reference:
mantis/train/data.py:507-560).

The library is built on demand (``make -C native``); callers fall back
to the PIL path when g++ or the .so is unavailable.  NOTE: bilinear
with half-pixel centers, no antialiasing — matches our numpy spec
exactly (tested), approximates PIL bicubic; use for training/serving
throughput, keep the PIL path for bit-level HF-parity checks.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _native_dir() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "native")


def load_library() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_native_dir(), "libmantis_imgproc.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", _native_dir()], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.batch_resize_normalize.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float)]
    lib.patchify_hwc.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
    _LIB = lib
    return _LIB


def available() -> bool:
    return load_library() is not None


def batch_resize_normalize(
    images: np.ndarray, out_h: int, out_w: int,
    mean: Sequence[float], std: Sequence[float],
) -> np.ndarray:
    """uint8 [N, H, W, C] (same-size batch) -> f32 [N, C, out_h, out_w]."""
    lib = load_library()
    assert lib is not None, "native imgproc unavailable"
    images = np.ascontiguousarray(images, np.uint8)
    n, h, w, c = images.shape
    out = np.empty((n, c, out_h, out_w), np.float32)
    mean_a = np.asarray(mean, np.float32)
    std_a = np.asarray(std, np.float32)
    lib.batch_resize_normalize(
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w, c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_h, out_w,
        mean_a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std_a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def patchify_hwc(canvas: np.ndarray, patch: int) -> np.ndarray:
    """f32 [H, W, C] -> [rows*cols, patch*patch*C] (HF Fuyu layout)."""
    lib = load_library()
    assert lib is not None, "native imgproc unavailable"
    canvas = np.ascontiguousarray(canvas, np.float32)
    h, w, c = canvas.shape
    rows, cols = h // patch, w // patch
    out = np.empty((rows * cols, patch * patch * c), np.float32)
    lib.patchify_hwc(
        canvas.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h, w, c, patch,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def reference_resize_normalize(images, out_h, out_w, mean, std):
    """Pure-numpy spec of the native kernel (for tests)."""
    n, h, w, c = images.shape
    fy = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    fx = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    y0 = np.clip(np.floor(np.maximum(fy, 0)).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(np.maximum(fx, 0)).astype(int), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(fy - y0, 0, 1)[None, :, None, None]
    wx = np.clip(fx - x0, 0, 1)[None, None, :, None]
    im = images.astype(np.float32)
    top = im[:, y0][:, :, x0] * (1 - wx) + im[:, y0][:, :, x1] * wx
    bot = im[:, y1][:, :, x0] * (1 - wx) + im[:, y1][:, :, x1] * wx
    out = (top * (1 - wy) + bot * wy) / 255.0
    mean = np.asarray(mean, np.float32)[None, None, None, :]
    std = np.asarray(std, np.float32)[None, None, None, :]
    return ((out - mean) / std).transpose(0, 3, 1, 2)
