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


VISION_START = "<|vision_start|>"
VISION_END = "<|vision_end|>"
IMAGE_PAD = "<|image_pad|>"
VIDEO_PAD = "<|video_pad|>"


class Qwen2VLProcessor:
    """Tokenizer + smart-resize patchify for training/eval pipelines.

    Mirrors HF Qwen2VLProcessor behavior (reference:
    mantis/train/train_qwen2_vl.py:120-128 loads it with
    min_pixels/max_pixels budgets): each ``<image>`` (or the
    conversation-template form ``<|vision_start|><|image_pad|>
    <|vision_end|>``) expands to one ``<|image_pad|>`` per MERGED patch
    group, and pixel patches are emitted pre-flattened in merge order
    for the TPU vision tower.

    Emits per call: input_ids, attention_mask, pixel_values
    [sum Np, C*T*P*P], image_grid_thw [N, 3].
    """

    def __init__(self, tokenizer, patch_size: int = 14,
                 merge_size: int = 2, temporal: int = 2,
                 min_pixels: int = 56 * 56,
                 max_pixels: int = 14 * 14 * 4 * 1280):
        self.tokenizer = tokenizer
        self.patch_size = patch_size
        self.merge_size = merge_size
        self.temporal = temporal
        self.min_pixels = min_pixels
        self.max_pixels = max_pixels
        for tok in (VISION_START, VISION_END, IMAGE_PAD, VIDEO_PAD):
            if tok not in tokenizer.get_vocab():
                tokenizer.add_special_tokens(
                    {"additional_special_tokens": [tok]})
        self.image_token_index = tokenizer.convert_tokens_to_ids(IMAGE_PAD)
        # variable per image; nominal value for collator bookkeeping
        self.num_image_tokens = 1

    def __call__(self, text, images=None, truncation: bool = True,
                 max_length: Optional[int] = None, **_):
        texts = [text] if isinstance(text, str) else list(text)
        assert len(texts) == 1, "Qwen2VLProcessor processes one text"
        t = texts[0]
        flats, grids = [], []
        if images:
            for im in images:
                flat, grid = patchify_image(
                    im, self.patch_size, self.merge_size, self.temporal,
                    self.min_pixels, self.max_pixels)
                flats.append(flat)
                grids.append(grid)
        # normalize bare <image> to the template form first
        t = t.replace("<image>", VISION_START + IMAGE_PAD + VISION_END)
        parts = t.split(IMAGE_PAD)
        if len(parts) != len(flats) + 1:
            # also catches placeholders with NO images: silently
            # deleting the pads would answer as if the image never
            # existed
            raise ValueError(
                f"{len(parts) - 1} image placeholders != "
                f"{len(flats)} images")
        merged = [g[0] * g[1] * g[2] // self.merge_size ** 2
                  for g in grids]
        t = "".join(
            p + (IMAGE_PAD * merged[i] if i < len(merged) else "")
            for i, p in enumerate(parts))
        enc = self.tokenizer([t], truncation=truncation,
                             max_length=max_length,
                             add_special_tokens=True)
        ids = np.asarray(enc["input_ids"], np.int64)
        out = {"input_ids": ids, "attention_mask": np.ones_like(ids)}
        if flats:
            out["pixel_values"] = np.concatenate(flats)
            out["image_grid_thw"] = np.asarray(grids, np.int64)
        return out

    def expand_ids_and_labels(self, ids, labels):
        # expansion already happened in text space; mask pad positions
        lab = labels.copy()
        lab[ids == self.image_token_index] = -100
        return ids, lab

    def decode(self, ids, **kw):
        return self.tokenizer.decode(ids, **kw)
