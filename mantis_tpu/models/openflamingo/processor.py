"""OpenFlamingo processor: media markers stay single tokens.

Reference: mantis/models/openflamingo/factory.py builds the open_clip
preprocess + tokenizer pair; media positions are single ``<image>``
tokens that condition the gated cross-attn blocks
(flamingo.py:108-111), so no token expansion happens — the perceiver
latents are attended, not spliced.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from mantis_tpu.models.mllava.processor import (
    ImageProcessorConfig,
    MantisImageProcessor,
)

MEDIA_TOKEN = "<image>"


class FlamingoProcessor:
    def __init__(self, tokenizer, image_size: int = 224,
                 tower_type: str = "clip"):
        self.tokenizer = tokenizer
        if MEDIA_TOKEN not in tokenizer.get_vocab():
            tokenizer.add_special_tokens(
                {"additional_special_tokens": [MEDIA_TOKEN]})
        self.image_token_index = tokenizer.convert_tokens_to_ids(
            MEDIA_TOKEN)
        self.num_image_tokens = 1
        self.image_processor = MantisImageProcessor(
            ImageProcessorConfig.for_tower(tower_type, image_size))

    def __call__(self, text, images=None, truncation: bool = True,
                 max_length: Optional[int] = None, **_
                 ) -> Dict[str, np.ndarray]:
        texts = [text] if isinstance(text, str) else list(text)
        enc = self.tokenizer(texts, truncation=truncation,
                             max_length=max_length,
                             add_special_tokens=True)
        ids = np.asarray(enc["input_ids"], np.int64)
        out = {"input_ids": ids, "attention_mask": np.ones_like(ids)}
        if images:
            out["pixel_values"] = self.image_processor(list(images))
        return out

    def expand_ids_and_labels(self, ids, labels):
        lab = labels.copy()
        lab[ids == self.image_token_index] = -100
        return ids, lab

    def decode(self, ids, **kw):
        return self.tokenizer.decode(ids, **kw)
