"""MLlavaNext processor: anyres tiling + interleave handling.

Port of the reference's ``MLlavaNextProcessor``
(reference: mantis/models/mllava_next/processing_llava_next.py:32-) and
of HF LlavaNextImageProcessor's get_image_patches pipeline: best-fit
resolution, aspect-preserving resize + symmetric pad, tile division,
plus a square-resized base image as tile 0.

Token contract (matching the reference's shipped behavior, see
model.py): each ``<image>`` expands to P+1 image-token copies (base-tile
patches + newline slot).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple, Union

import numpy as np
from PIL import Image

from mantis_tpu.models.mllava.processor import (
    DEFAULT_IMAGE_TOKEN,
    MantisImageProcessor,
    normalize_interleaved,
)
from mantis_tpu.models.mllava_next.model import (
    DEFAULT_PINPOINTS,
    select_best_resolution,
)


def resize_and_pad(image: Image.Image, target: Tuple[int, int]
                   ) -> Image.Image:
    """Aspect-preserving resize into target (h, w), centered pad."""
    th, tw = target
    w, h = image.size
    scale = min(tw / w, th / h)
    nw, nh = int(round(w * scale)), int(round(h * scale))
    resized = image.resize((nw, nh), Image.Resampling.BICUBIC)
    out = Image.new("RGB", (tw, th), (0, 0, 0))
    out.paste(resized, ((tw - nw) // 2, (th - nh) // 2))
    return out


def divide_to_tiles(image: Image.Image, tile: int) -> List[Image.Image]:
    w, h = image.size
    tiles = []
    for top in range(0, h, tile):
        for left in range(0, w, tile):
            tiles.append(image.crop((left, top, left + tile, top + tile)))
    return tiles


class MLlavaNextProcessor:
    def __init__(self, tokenizer, image_processor: MantisImageProcessor,
                 num_base_tokens: int,
                 grid_pinpoints=DEFAULT_PINPOINTS):
        self.tokenizer = tokenizer
        self.image_processor = image_processor
        self.num_base_tokens = num_base_tokens      # P (base-tile patches)
        self.num_image_tokens = num_base_tokens + 1  # + newline slot
        self.grid_pinpoints = grid_pinpoints
        self.image_token_index = tokenizer.convert_tokens_to_ids(
            DEFAULT_IMAGE_TOKEN)

    def get_image_patches(self, image: Image.Image) -> List[Image.Image]:
        size = self.image_processor.config.image_size
        best = select_best_resolution((image.height, image.width),
                                      self.grid_pinpoints)
        padded = resize_and_pad(image, best)
        tiles = divide_to_tiles(padded, size)
        base = image.resize((size, size), Image.Resampling.BICUBIC)
        return [base] + tiles

    def _normalize_tiles(self, tiles: List[Image.Image]) -> np.ndarray:
        cfg = self.image_processor.config
        mean = np.asarray(cfg.image_mean, np.float32)[:, None, None]
        std = np.asarray(cfg.image_std, np.float32)[:, None, None]
        out = []
        for t in tiles:
            arr = np.asarray(t.convert("RGB"), np.float32).transpose(
                2, 0, 1) / 255.0
            out.append((arr - mean) / std)
        return np.stack(out)

    def __call__(self, text: Union[str, List[str]], images=None,
                 truncation: bool = True,
                 max_length: Optional[int] = None,
                 add_image_ids: bool = True,
                 expand_image_tokens: bool = True
                 ) -> Dict[str, np.ndarray]:
        texts = [text] if isinstance(text, str) else list(text)
        image_sizes: List[Tuple[int, int]] = []
        first_tile_idx: List[int] = []
        all_tiles: List[Image.Image] = []
        if images is not None:
            if isinstance(images, Image.Image):
                images = [images]
            if isinstance(images, list) and (
                    not images or isinstance(images[0], Image.Image)):
                images = [list(images)] if isinstance(text, str) else [
                    [im] for im in images]
            texts = normalize_interleaved(texts, images, add_image_ids)
            for imgs in images:
                for im in imgs:
                    image_sizes.append((im.height, im.width))
                    patches = self.get_image_patches(im)
                    first_tile_idx.append(len(all_tiles))
                    all_tiles.extend(patches)

        enc = self.tokenizer(texts, truncation=truncation,
                             max_length=max_length,
                             add_special_tokens=True)
        all_ids = enc["input_ids"]
        if expand_image_tokens:
            expanded = []
            for ids in all_ids:
                row = []
                for t in ids:
                    if t == self.image_token_index:
                        row.extend([t] * self.num_image_tokens)
                    else:
                        row.append(t)
                expanded.append(row)
        else:
            # the training dataset expands dataset-side via
            # num_image_tokens (ChatDataset.expand_ids_and_labels)
            expanded = [list(ids) for ids in all_ids]
        max_len = max(len(r) for r in expanded)
        pad_id = self.tokenizer.pad_token_id or 0
        input_ids = np.full((len(expanded), max_len), pad_id, np.int64)
        attention_mask = np.zeros((len(expanded), max_len), np.int64)
        for i, r in enumerate(expanded):
            input_ids[i, :len(r)] = r
            attention_mask[i, :len(r)] = 1
        out = {"input_ids": input_ids, "attention_mask": attention_mask}
        if all_tiles:
            out["pixel_values"] = self._normalize_tiles(all_tiles)
            out["first_tile_idx"] = np.asarray(first_tile_idx, np.int64)
            out["image_sizes"] = np.asarray(image_sizes, np.int64)
            # per-image tile counts, batch-concatenable (the dataset
            # forwards IMAGE_BATCH_KEYS; the collator rebuilds
            # batch-flat first_tile_idx by cumsum)
            bounds = first_tile_idx + [len(all_tiles)]
            out["tiles_per_image"] = np.diff(
                np.asarray(bounds, np.int64))
        return out

    def decode(self, ids, **kw):
        return self.tokenizer.decode(ids, **kw)
