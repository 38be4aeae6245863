"""Idefics3 processor: NaViT prep at 364-px tiling + <global-img> marker.

Reuses the Idefics2 NaViT machinery with Idefics3's numbers (reference:
mantis/train/train_idefics3.py:111 sets size longest_edge = N*364;
no image splitting in Mantis training, so the text pattern is
``<fake_token_around_image><global-img><image>*seq<fake...>`` — the HF
Idefics3Processor no-split form).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from mantis_tpu.models.idefics2.processor import (
    FAKE_IMAGE_TOKEN,
    IMAGE_TOKEN,
    Idefics2Processor,
)

GLOBAL_IMG_TOKEN = "<global-img>"


class Idefics3Processor(Idefics2Processor):
    def __init__(self, tokenizer, image_size: int = 364,
                 patch_size: int = 14, image_seq_len: int = 169,
                 shortest_edge: int = 364):
        super().__init__(tokenizer, image_size=image_size,
                         patch_size=patch_size,
                         image_seq_len=image_seq_len,
                         shortest_edge=shortest_edge)
        if GLOBAL_IMG_TOKEN not in tokenizer.get_vocab():
            tokenizer.add_special_tokens(
                {"additional_special_tokens": [GLOBAL_IMG_TOKEN]})
        self.global_img_id = tokenizer.convert_tokens_to_ids(
            GLOBAL_IMG_TOKEN)

    def __call__(self, text, images=None, truncation: bool = True,
                 max_length: Optional[int] = None,
                 add_image_ids: bool = False,
                 expand_image_tokens: bool = True
                 ) -> Dict[str, np.ndarray]:
        if expand_image_tokens:
            texts = [text] if isinstance(text, str) else list(text)
            image_str = (FAKE_IMAGE_TOKEN + GLOBAL_IMG_TOKEN
                         + IMAGE_TOKEN * self.image_seq_len
                         + FAKE_IMAGE_TOKEN)
            texts = [t.replace(IMAGE_TOKEN, image_str) for t in texts]
            text = texts if len(texts) > 1 else texts[0]
            return super().__call__(
                text, images, truncation=truncation,
                max_length=max_length, add_image_ids=add_image_ids,
                expand_image_tokens=False)
        return super().__call__(
            text, images, truncation=truncation, max_length=max_length,
            add_image_ids=add_image_ids, expand_image_tokens=False)

    def expand_ids_and_labels(self, ids, labels):
        fake_id = self.tokenizer.convert_tokens_to_ids(FAKE_IMAGE_TOKEN)
        out_ids, out_lab = [], []
        for t, l in zip(ids.tolist(), labels.tolist()):
            if t == self.image_token_index:
                out_ids.extend([fake_id, self.global_img_id])
                out_lab.extend([-100, -100])
                out_ids.extend([t] * self.image_seq_len)
                out_lab.extend([-100] * self.image_seq_len)
                out_ids.append(fake_id)
                out_lab.append(-100)
            else:
                out_ids.append(t)
                out_lab.append(l)
        return (np.asarray(out_ids, np.int64),
                np.asarray(out_lab, np.int64))
