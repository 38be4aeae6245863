"""MFuyu processor: patchify + id-level image-block splicing.

Behavioral port of the reference ``MFuyuProcessor``
(reference: mantis/models/mfuyu/processor.py:343-376): each image is
patchified into 30x30 raw patches; its token block (one placeholder per
patch + a newline per row, mirroring ``preprocess_with_tokenizer_info``)
replaces the ``<image>`` marker in the tokenized prompt.  BOI/EOI
separator tokens wrap each block like the reference's added special
tokens (processor.py:352).

TPU note: patches stay host-side numpy and are concatenated across the
batch ([sum Np, 2700]); the model splices their linear embeddings by
placeholder order (mfuyu/model.py).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from mantis_tpu.models.mfuyu.model import (
    MFuyuConfig,
    image_token_ids,
    patchify,
)

BOI = "<boi>"
EOI = "<eoi>"
IMAGE_MARKER = "<image>"


class MFuyuProcessor:
    def __init__(self, tokenizer, cfg: MFuyuConfig,
                 max_height: int = 1080, max_width: int = 1920):
        self.tokenizer = tokenizer
        self.cfg = cfg
        self.max_height = max_height
        self.max_width = max_width
        for tok in (IMAGE_MARKER, BOI, EOI):
            if tok not in tokenizer.get_vocab():
                tokenizer.add_special_tokens(
                    {"additional_special_tokens": [tok]})
        self.image_token_index = cfg.image_placeholder_id
        self.marker_id = tokenizer.convert_tokens_to_ids(IMAGE_MARKER)
        self.boi_id = tokenizer.convert_tokens_to_ids(BOI)
        self.eoi_id = tokenizer.convert_tokens_to_ids(EOI)
        self.num_image_tokens = 1  # variable per image (rows*(cols+1))

    def __call__(self, text, images=None, truncation: bool = True,
                 max_length: Optional[int] = None, **_
                 ) -> Dict[str, np.ndarray]:
        texts = [text] if isinstance(text, str) else list(text)
        assert len(texts) == 1, "MFuyuProcessor processes one text"
        patches: List[np.ndarray] = []
        blocks: List[List[int]] = []
        if images:
            for im in images:
                p, rows, cols = patchify(
                    im, self.cfg.patch_size, self.max_height,
                    self.max_width)
                patches.append(p)
                blocks.append(
                    [self.boi_id]
                    + image_token_ids(rows, cols, self.cfg)
                    + [self.eoi_id])
        enc = self.tokenizer(texts, truncation=False,
                             add_special_tokens=True)
        raw = enc["input_ids"][0]
        out_ids: List[int] = []
        bi = 0
        for tok in raw:
            if tok == self.marker_id and bi < len(blocks):
                out_ids.extend(blocks[bi])
                bi += 1
            else:
                out_ids.append(tok)
        n_markers = sum(1 for tok in raw if tok == self.marker_id)
        if n_markers != len(blocks):
            # extra markers would stay embedded as raw special-token
            # ids; missing ones would drop images
            raise ValueError(
                f"{n_markers} <image> markers in text != "
                f"{len(blocks)} images")
        if truncation and max_length is not None:
            out_ids = out_ids[:max_length]
        ids = np.asarray([out_ids], np.int64)
        out = {"input_ids": ids, "attention_mask": np.ones_like(ids)}
        if patches:
            out["image_patches"] = np.concatenate(patches)
        return out

    def expand_ids_and_labels(self, ids, labels):
        # blocks were spliced at the id level already; patch/newline and
        # separator positions must never be predicted
        lab = labels.copy()
        for t in (self.cfg.image_placeholder_id, self.cfg.image_newline_id,
                  self.boi_id, self.eoi_id):
            lab[ids == t] = -100
        return ids, lab

    def decode(self, ids, **kw):
        return self.tokenizer.decode(ids, **kw)
