"""Qwen2-VL image preprocessing: smart resize + merge-ordered patchify.

Mirrors HF Qwen2VLImageProcessor semantics (factor = patch*merge smart
resize with min/max pixel budget — the knobs Mantis sets via
``min_pixels/max_pixels * 28^2``, reference: train_qwen2_vl.py:126-128),
producing pre-flattened patches in spatial-merge-group order plus
grid_thw, ready for the TPU vision tower.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import numpy as np
from PIL import Image

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def smart_resize(h: int, w: int, factor: int = 28,
                 min_pixels: int = 56 * 56,
                 max_pixels: int = 14 * 14 * 4 * 1280
                 ) -> Tuple[int, int]:
    if max(h, w) / min(h, w) > 200:
        raise ValueError("aspect ratio too extreme")
    hb = max(factor, round(h / factor) * factor)
    wb = max(factor, round(w / factor) * factor)
    if hb * wb > max_pixels:
        beta = math.sqrt((h * w) / max_pixels)
        hb = math.floor(h / beta / factor) * factor
        wb = math.floor(w / beta / factor) * factor
    elif hb * wb < min_pixels:
        beta = math.sqrt(min_pixels / (h * w))
        hb = math.ceil(h * beta / factor) * factor
        wb = math.ceil(w * beta / factor) * factor
    return hb, wb


def patchify_image(image: Image.Image, patch_size: int = 14,
                   merge_size: int = 2, temporal: int = 2,
                   min_pixels: int = 56 * 56,
                   max_pixels: int = 14 * 14 * 4 * 1280):
    """-> (flatten_patches [Np, C*T*P*P] in merge-group order,
    grid_thw (1, H/P, W/P))."""
    image = image.convert("RGB")
    nh, nw = smart_resize(image.height, image.width,
                          patch_size * merge_size, min_pixels, max_pixels)
    image = image.resize((nw, nh), Image.Resampling.BICUBIC)
    arr = np.asarray(image, np.float32).transpose(2, 0, 1) / 255.0
    mean = np.asarray(CLIP_MEAN, np.float32)[:, None, None]
    std = np.asarray(CLIP_STD, np.float32)[:, None, None]
    arr = (arr - mean) / std
    # temporal duplication (images are 1-frame videos with T=2)
    arr = np.tile(arr[None], (temporal, 1, 1, 1))    # [T, C, H, W]
    gt = 1
    gh, gw = nh // patch_size, nw // patch_size
    p, m = patch_size, merge_size
    a = arr.reshape(gt, temporal, 3, gh // m, m, p, gw // m, m, p)
    # merge-group order: (gt, gh/m, gw/m, m, m) with channel-major vecs
    a = a.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    flat = a.reshape(gt * gh * gw, 3 * temporal * p * p)
    return flat.astype(np.float32), (gt, gh, gw)
