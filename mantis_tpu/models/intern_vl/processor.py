"""InternVL processor: dynamic aspect-ratio tiling + IMG_CONTEXT
expansion (reference: processing_internvl_chat.py:61-113 dynamic
preprocess, :355-365 inline expansion, :326-337 shared-cross-attn
prefix hoisting)."""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
from PIL import Image

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
IMG_START, IMG_END, IMG_CONTEXT = "<img>", "</img>", "<IMG_CONTEXT>"


def find_closest_aspect_ratio(ar: float, ratios, w: int, h: int,
                              tile: int):
    """Reference tie-break (processing_internvl_chat.py
    find_closest_aspect_ratio): on an equal aspect difference, a
    LARGER grid wins when the image has enough area to fill it — a
    2000x2000 image must tile as (3,3)+thumbnail, not squash into one
    448px tile."""
    best, diff = (1, 1), float("inf")
    area = w * h
    for r in ratios:
        target = r[0] / r[1]
        d = abs(ar - target)
        if d < diff:
            best, diff = r, d
        elif d == diff and area > 0.5 * tile * tile * r[0] * r[1]:
            best = r
    return best


def dynamic_preprocess(image: Image.Image, tile: int = 448,
                       min_num: int = 1, max_num: int = 12,
                       use_thumbnail: bool = True
                       ) -> List[Image.Image]:
    """Tile the image at its best-fitting aspect ratio (+ thumbnail)."""
    w, h = image.size
    ar = w / h
    ratios = sorted(
        {(i, j) for n in range(min_num, max_num + 1)
         for i in range(1, n + 1) for j in range(1, n + 1)
         if min_num <= i * j <= max_num},
        key=lambda x: x[0] * x[1])
    best = find_closest_aspect_ratio(ar, ratios, w, h, tile)
    tw, th = tile * best[0], tile * best[1]
    blocks = best[0] * best[1]
    resized = image.resize((tw, th), Image.Resampling.BICUBIC)
    tiles = []
    cols = tw // tile
    for idx in range(blocks):
        x0 = (idx % cols) * tile
        y0 = (idx // cols) * tile
        tiles.append(resized.crop((x0, y0, x0 + tile, y0 + tile)))
    if use_thumbnail and len(tiles) != 1:
        tiles.append(image.resize((tile, tile),
                                  Image.Resampling.BICUBIC))
    return tiles


def normalize_tiles(tiles: List[Image.Image]) -> np.ndarray:
    mean = np.asarray(IMAGENET_MEAN, np.float32)[:, None, None]
    std = np.asarray(IMAGENET_STD, np.float32)[:, None, None]
    out = []
    for t in tiles:
        arr = np.asarray(t.convert("RGB"), np.float32).transpose(
            2, 0, 1) / 255.0
        out.append((arr - mean) / std)
    return np.stack(out)


class InternVLChatProcessor:
    """Expands each <image> into <img> + IMG_CONTEXT*(256*n_tiles) +
    </img> (inline mode) or hoists media to the prefix (cross-attn
    mode)."""

    def __init__(self, tokenizer, num_image_tokens: int = 256,
                 tile: int = 448, max_num: int = 12,
                 enable_cross_attention: bool = False):
        self.tokenizer = tokenizer
        self.num_image_tokens = num_image_tokens
        self.tile = tile
        self.max_num = max_num
        self.enable_cross_attention = enable_cross_attention
        for tok in (IMG_START, IMG_END, IMG_CONTEXT):
            if tok not in tokenizer.get_vocab():
                tokenizer.add_special_tokens(
                    {"additional_special_tokens": [tok]})
        self.image_token_index = tokenizer.convert_tokens_to_ids(
            IMG_CONTEXT)

    def __call__(self, text: str, images=None, truncation=True,
                 max_length: Optional[int] = None, **_):
        tiles_per_image: List[int] = []
        all_tiles = []
        if images:
            for im in images:
                t = dynamic_preprocess(im, self.tile,
                                       max_num=self.max_num)
                tiles_per_image.append(len(t))
                all_tiles.extend(t)
        if self.enable_cross_attention:
            # media placeholders hoisted to the text prefix; one
            # IMG_CONTEXT per tile (reference :326-337, :362-365)
            prefix = "".join(
                IMG_START + IMG_CONTEXT * n + IMG_END
                for n in tiles_per_image)
            text = prefix + text.replace("<image>", "")
        else:
            for n in tiles_per_image:
                text = text.replace(
                    "<image>",
                    IMG_START + IMG_CONTEXT * (self.num_image_tokens * n)
                    + IMG_END, 1)
        enc = self.tokenizer([text], truncation=truncation,
                             max_length=max_length,
                             add_special_tokens=True)
        ids = np.asarray(enc["input_ids"], np.int64)
        out = {"input_ids": ids,
               "attention_mask": np.ones_like(ids)}
        if all_tiles:
            out["pixel_values"] = normalize_tiles(all_tiles)
            out["tiles_per_image"] = np.asarray(tiles_per_image)
        return out

    def expand_ids_and_labels(self, ids, labels):
        # IMG_CONTEXT runs were expanded inline during __call__; only
        # mask them (and the img delimiters) out of the loss
        lab = labels.copy()
        for tok in (IMG_START, IMG_END, IMG_CONTEXT):
            lab[ids == self.tokenizer.convert_tokens_to_ids(tok)] = -100
        return ids, lab

    def decode(self, ids, **kw):
        return self.tokenizer.decode(ids, **kw)
