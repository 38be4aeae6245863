"""Video-LLaVA processor: text + images + videos preparation.

Behavioral port of HF ``VideoLlavaProcessor`` (the reference trains the
HF model directly, mantis/train/train_videollava.py): ``<image>``
placeholders expand to ``num_image_tokens`` copies and ``<video>``
placeholders to ``num_frames * (num_patches + 1)`` copies (the video
tower keeps the CLS token per frame).  Unlike the MLlava processor, no
"(image j:)" numbering markers are inserted — HF VideoLlavaProcessor
has none.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Union

import numpy as np
from PIL import Image

from mantis_tpu.models.mllava.processor import (ImageProcessorConfig,
                                                MantisImageProcessor,
                                                MLlavaProcessor)

DEFAULT_VIDEO_TOKEN = "<video>"


class VideoLlavaProcessor(MLlavaProcessor):
    """Tokenizer + CLIP image processor + static-shape expansion of both
    ``<image>`` and ``<video>`` placeholder tokens."""

    def __init__(self, tokenizer, image_processor: MantisImageProcessor,
                 num_image_tokens: int, num_video_tokens: int):
        super().__init__(tokenizer, image_processor, num_image_tokens)
        self.num_video_tokens = num_video_tokens
        self.video_token_index = tokenizer.convert_tokens_to_ids(
            DEFAULT_VIDEO_TOKEN)

    def _expand_image_tokens(self, ids: List[int]) -> List[int]:
        out = []
        for tok in ids:
            if tok == self.image_token_index:
                out.extend([tok] * self.num_image_tokens)
            elif tok == self.video_token_index:
                out.extend([tok] * self.num_video_tokens)
            else:
                out.append(tok)
        return out

    def __call__(
        self,
        text: Union[str, List[str]],
        images=None,
        videos: Optional[Sequence[Sequence[Image.Image]]] = None,
        truncation: bool = True,
        max_length: Optional[int] = None,
        add_image_ids: bool = False,  # HF VideoLlava: no numbering
        expand_image_tokens: bool = True,
    ) -> Dict[str, np.ndarray]:
        result = super().__call__(
            text, images, truncation=truncation, max_length=max_length,
            add_image_ids=add_image_ids,
            expand_image_tokens=expand_image_tokens)
        if videos is not None:
            clips = [self.image_processor(list(frames))
                     for frames in videos]
            if clips:
                result["pixel_values_videos"] = np.stack(clips)
        return result

    @classmethod
    def from_pretrained(cls, path: str, num_image_tokens: int = 256,
                        num_video_tokens: int = 8 * 257,
                        image_size: int = 224):
        import transformers

        tok = transformers.AutoTokenizer.from_pretrained(path)
        missing = [t for t in ("<image>", DEFAULT_VIDEO_TOKEN)
                   if t not in tok.get_vocab()]
        if missing:
            tok.add_special_tokens(
                {"additional_special_tokens": missing})
        ip = MantisImageProcessor(
            ImageProcessorConfig.for_tower("clip", image_size))
        return cls(tok, ip, num_image_tokens, num_video_tokens)
