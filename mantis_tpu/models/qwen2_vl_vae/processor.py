"""Qwen2-VL-VAE processor: fixed-size frames for the VAE encoder.

Mirrors the reference's ``Qwen2VLVAEProcessor``
(reference: mantis/models/qwen2_vl_vae/, loaded at
train_qwen2_vl_vae.py:164-169 with the VAE compression rates + post-VAE
patch size): each ``<image>`` placeholder becomes
``<|vision_start|>`` + N x ``<|image_pad|>`` + ``<|vision_end|>`` where
N = (image_size / vae_downsample / latent_patch / spatial_merge)^2,
and frames are resized to one static square size and scaled to the
VAE's [-1, 1] input range (diffusers convention) — static shapes keep
the latent token grid constant under jit.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
from PIL import Image

from mantis_tpu.models.qwen2_vl.processor import (IMAGE_PAD, VISION_END,
                                                  VISION_START)


class Qwen2VLVAEProcessor:
    """Tokenizer + fixed-size VAE frame preprocessing."""

    def __init__(self, tokenizer, image_size: int,
                 tokens_per_image: int):
        self.tokenizer = tokenizer
        self.image_size = image_size
        self.tokens_per_image = tokens_per_image
        self.image_token_index = tokenizer.convert_tokens_to_ids(
            IMAGE_PAD)

    def _frames(self, images: List[Image.Image]) -> np.ndarray:
        s = self.image_size
        out = []
        for im in images:
            if not isinstance(im, Image.Image):
                im = Image.fromarray(np.asarray(im))
            im = im.convert("RGB").resize(
                (s, s), Image.Resampling.BICUBIC)
            arr = np.asarray(im, np.float32).transpose(2, 0, 1)
            out.append(arr / 127.5 - 1.0)  # [-1, 1] VAE input range
        return (np.stack(out) if out
                else np.zeros((0, 3, s, s), np.float32))

    def __call__(self, text, images=None, truncation: bool = True,
                 max_length: Optional[int] = None, **_
                 ) -> Dict[str, np.ndarray]:
        texts = [text] if isinstance(text, str) else list(text)
        assert len(texts) == 1, "Qwen2VLVAEProcessor processes one text"
        t = texts[0]
        t = t.replace("<image>", VISION_START + IMAGE_PAD + VISION_END)
        n_ph = t.count(IMAGE_PAD)
        if images and n_ph != len(images):
            raise ValueError(
                f"{n_ph} image placeholders != {len(images)} images")
        t = t.replace(IMAGE_PAD, IMAGE_PAD * self.tokens_per_image)
        enc = self.tokenizer([t], truncation=truncation,
                             max_length=max_length,
                             add_special_tokens=True)
        ids = np.asarray(enc["input_ids"], np.int64)
        out = {"input_ids": ids, "attention_mask": np.ones_like(ids)}
        if images:
            out["pixel_values"] = self._frames(list(images))
        return out

    def expand_ids_and_labels(self, ids, labels):
        lab = labels.copy()
        lab[ids == self.image_token_index] = -100
        return ids, lab

    def decode(self, ids, **kw):
        return self.tokenizer.decode(ids, **kw)

    def batch_decode(self, ids, **kw):
        return self.tokenizer.batch_decode(ids, **kw)
