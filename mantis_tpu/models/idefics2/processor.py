"""Idefics2 processor: NaViT image prep + image-token expansion.

Mirrors HF Idefics2Processor/Idefics2ImageProcessor behavior with
Mantis's settings (``do_image_splitting=False``, reference:
mantis/train/train_idefics2.py:108): aspect-preserving resize into
[shortest>=378, longest<=980] (bilinear), 0.5/0.5 normalization, square
canvas padding with a per-patch mask, and the
``<fake_token_around_image><image>*64<fake_token_around_image>`` text
pattern with double-fake collapsing.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple, Union

import numpy as np
from PIL import Image

from mantis_tpu.models.idefics2.model import build_patch_grid
from mantis_tpu.models.mllava.processor import normalize_interleaved

FAKE_IMAGE_TOKEN = "<fake_token_around_image>"
IMAGE_TOKEN = "<image>"
END_OF_UTTERANCE = "<end_of_utterance>"


def resize_for_navit(w: int, h: int, shortest: int = 378,
                     longest: int = 980) -> Tuple[int, int]:
    """HF Idefics2 resize semantics (verified against transformers
    4.57 Idefics2ImageProcessor): aspect-preserving cap of the longest
    edge to ``longest``, then each edge clamped UP to >= ``shortest``
    INDEPENDENTLY — aspect-DISTORTING for thin images (640x200 ->
    640x378), which is what the pretrained checkpoint saw."""
    scale = min(longest / max(w, h), 1.0)
    w = max(int(round(w * scale)), 1)
    h = max(int(round(h * scale)), 1)
    return max(w, shortest), max(h, shortest)


class Idefics2Processor:
    def __init__(self, tokenizer, image_size: int = 980,
                 patch_size: int = 14, image_seq_len: int = 64,
                 shortest_edge: int = 378):
        self.tokenizer = tokenizer
        self.image_size = image_size
        self.patch_size = patch_size
        self.image_seq_len = image_seq_len
        self.shortest_edge = shortest_edge
        for tok in (FAKE_IMAGE_TOKEN, IMAGE_TOKEN, END_OF_UTTERANCE):
            if tok not in tokenizer.get_vocab():
                tokenizer.add_special_tokens(
                    {"additional_special_tokens": [tok]})
        self.image_token_index = tokenizer.convert_tokens_to_ids(
            IMAGE_TOKEN)
        self.num_image_tokens = image_seq_len

    # ------------------------------------------------------------------
    def preprocess_image(self, image: Image.Image
                         ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        image = image.convert("RGB")
        nw, nh = resize_for_navit(image.width, image.height,
                                  self.shortest_edge, self.image_size)
        # patch-align so mask geometry is exact
        nw = max((nw // self.patch_size) * self.patch_size,
                 self.patch_size)
        nh = max((nh // self.patch_size) * self.patch_size,
                 self.patch_size)
        resized = image.resize((nw, nh), Image.Resampling.BILINEAR)
        canvas = np.zeros((3, self.image_size, self.image_size),
                          np.float32)
        arr = np.asarray(resized, np.float32).transpose(2, 0, 1) / 255.0
        arr = (arr - 0.5) / 0.5
        canvas[:, :nh, :nw] = arr

        class _Cfg:
            image_size = self.image_size
            patch_size = self.patch_size

        mask, pos = build_patch_grid(nh, nw, _Cfg)
        return canvas, mask, pos

    def __call__(self, text: Union[str, List[str]], images=None,
                 truncation: bool = True,
                 max_length: Optional[int] = None,
                 add_image_ids: bool = False,
                 expand_image_tokens: bool = True
                 ) -> Dict[str, np.ndarray]:
        texts = [text] if isinstance(text, str) else list(text)
        pix, masks, poss = [], [], []
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
                    c, m, p = self.preprocess_image(im)
                    pix.append(c)
                    masks.append(m)
                    poss.append(p)
        if expand_image_tokens:
            # the HF image_str pattern with double-fake collapsing
            image_str = (FAKE_IMAGE_TOKEN
                         + IMAGE_TOKEN * self.image_seq_len
                         + FAKE_IMAGE_TOKEN)
            texts = [t.replace(IMAGE_TOKEN, image_str).replace(
                FAKE_IMAGE_TOKEN + FAKE_IMAGE_TOKEN, FAKE_IMAGE_TOKEN)
                for t in texts]
        # else: single <image> tokens survive tokenization; the training
        # pipeline masks labels on the compact ids and then calls
        # expand_ids_and_labels below for the identical final sequence.
        enc = self.tokenizer(texts, truncation=truncation,
                             max_length=max_length,
                             add_special_tokens=True)
        all_ids = enc["input_ids"]
        max_len = max(len(r) for r in all_ids)
        pad_id = self.tokenizer.pad_token_id or 0
        input_ids = np.full((len(all_ids), max_len), pad_id, np.int64)
        attention_mask = np.zeros((len(all_ids), max_len), np.int64)
        for i, r in enumerate(all_ids):
            input_ids[i, :len(r)] = r
            attention_mask[i, :len(r)] = 1
        out = {"input_ids": input_ids, "attention_mask": attention_mask}
        if pix:
            out["pixel_values"] = np.stack(pix)
            out["patch_mask"] = np.stack(masks)
            out["patch_position_ids"] = np.stack(poss)
        return out

    def expand_ids_and_labels(self, ids, labels):
        """Id-level equivalent of the text-space image_str expansion:
        <image> -> <fake> <image>*seq <fake>, collapsing the fake token
        between adjacent images.  Inserted positions get -100 labels."""
        import numpy as np

        fake_id = self.tokenizer.convert_tokens_to_ids(FAKE_IMAGE_TOKEN)
        out_ids, out_lab = [], []
        for t, l in zip(ids.tolist(), labels.tolist()):
            if t == self.image_token_index:
                if not out_ids or out_ids[-1] != fake_id:
                    out_ids.append(fake_id)
                    out_lab.append(-100)
                out_ids.extend([t] * self.image_seq_len)
                out_lab.extend([-100] * self.image_seq_len)
                out_ids.append(fake_id)
                out_lab.append(-100)
            else:
                out_ids.append(t)
                out_lab.append(l)
        return (np.asarray(out_ids, np.int64),
                np.asarray(out_lab, np.int64))

    def decode(self, ids, **kw):
        return self.tokenizer.decode(ids, **kw)
