"""MLlava processor: interleaved multi-image text+image preparation.

Behavioral port of the reference's ``MLlavaProcessor``
(reference: mantis/models/mllava/processing_llava.py:44-285):

- interleave normalization: balance ``<image>`` token count against the
  number of images, prepending to USER:/Human:/HUMAN: turns
  (processing_llava.py:97-148);
- image numbering markers ``(image {j}: <Image><image></Image>)``
  (processing_llava.py:150-155);
- tokenize with truncation, then drop images whose tokens were truncated
  away (processing_llava.py:240-249).

TPU-specific difference: each surviving ``<image>`` token is expanded
in-place to ``num_image_tokens`` copies of the image token id, so the
model sees static shapes and splices patch embeddings with a gather (see
mantis_tpu/models/mllava/model.py).  The reference reaches the same final
sequence by scatter-expanding inside the model forward
(modeling_llava.py:293-360).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Union

import numpy as np
from PIL import Image

DEFAULT_IMAGE_TOKEN = "<image>"

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
SIGLIP_MEAN = (0.5, 0.5, 0.5)
SIGLIP_STD = (0.5, 0.5, 0.5)


@dataclasses.dataclass
class ImageProcessorConfig:
    tower_type: str = "clip"  # 'clip': shortest-edge resize + center crop
    image_size: int = 336
    image_mean: Sequence[float] = CLIP_MEAN
    image_std: Sequence[float] = CLIP_STD

    @classmethod
    def for_tower(cls, tower_type: str, image_size: int
                  ) -> "ImageProcessorConfig":
        if tower_type == "siglip":
            return cls(tower_type="siglip", image_size=image_size,
                       image_mean=SIGLIP_MEAN, image_std=SIGLIP_STD)
        return cls(tower_type="clip", image_size=image_size,
                   image_mean=CLIP_MEAN, image_std=CLIP_STD)


class MantisImageProcessor:
    """CLIP/SigLIP-compatible image preprocessing (host-side, PIL+numpy).

    Matches HF ``CLIPImageProcessor`` (shortest-edge bicubic resize +
    center crop + rescale + normalize) and ``SiglipImageProcessor``
    (square bicubic resize + rescale + normalize).
    """

    def __init__(self, config: ImageProcessorConfig,
                 use_native: Optional[bool] = None):
        self.config = config
        # native C++ path (native/imgproc.cpp): batched OpenMP resize +
        # normalize; opt-in via MANTIS_NATIVE_IMGPROC=1 (bilinear, no
        # antialias — keeps the PIL path for bit-level HF parity)
        if use_native is None:
            import os

            use_native = os.environ.get(
                "MANTIS_NATIVE_IMGPROC", "0") == "1"
        self.use_native = use_native

    def _resize_clip(self, image: Image.Image) -> Image.Image:
        size = self.config.image_size
        w, h = image.size
        short, long = (w, h) if w <= h else (h, w)
        new_short = size
        new_long = int(round(size * long / short))
        nw, nh = (new_short, new_long) if w <= h else (new_long, new_short)
        image = image.resize((nw, nh), resample=Image.Resampling.BICUBIC)
        # center crop
        left = (nw - size) // 2
        top = (nh - size) // 2
        return image.crop((left, top, left + size, top + size))

    def _resize_siglip(self, image: Image.Image) -> Image.Image:
        size = self.config.image_size
        return image.resize((size, size), resample=Image.Resampling.BICUBIC)

    def __call__(self, images: Sequence[Image.Image]) -> np.ndarray:
        """-> float32 [N, 3, H, W], normalized."""
        if self.use_native and self.config.tower_type == "siglip" \
                and images:
            from mantis_tpu.utils import native_imgproc

            if native_imgproc.available():
                size = self.config.image_size
                arrs, shapes = [], set()
                for image in images:
                    if not isinstance(image, Image.Image):
                        image = Image.fromarray(np.asarray(image))
                    if image.mode != "RGB":
                        image = image.convert("RGB")
                    a = np.asarray(image, np.uint8)
                    arrs.append(a)
                    shapes.add(a.shape)
                if len(shapes) == 1:  # batched same-size fast path
                    return native_imgproc.batch_resize_normalize(
                        np.stack(arrs), size, size,
                        self.config.image_mean, self.config.image_std)
                return np.concatenate([
                    native_imgproc.batch_resize_normalize(
                        a[None], size, size, self.config.image_mean,
                        self.config.image_std) for a in arrs])
        out = []
        mean = np.asarray(self.config.image_mean, np.float32)[:, None, None]
        std = np.asarray(self.config.image_std, np.float32)[:, None, None]
        for image in images:
            if not isinstance(image, Image.Image):
                image = Image.fromarray(np.asarray(image))
            if image.mode != "RGB":
                image = image.convert("RGB")
            if self.config.tower_type == "siglip":
                image = self._resize_siglip(image)
            else:
                image = self._resize_clip(image)
            arr = np.asarray(image, np.float32).transpose(2, 0, 1) / 255.0
            out.append((arr - mean) / std)
        return np.stack(out) if out else np.zeros(
            (0, 3, self.config.image_size, self.config.image_size),
            np.float32)


def normalize_interleaved(
    texts: List[str], images: Optional[List[List[Image.Image]]],
    add_image_ids: bool = True,
) -> List[str]:
    """Balance <image> counts and add numbering markers.

    Port of preprocess_interleaved_images_and_text
    (reference: processing_llava.py:97-155).
    """
    if images is None:
        return texts
    out = []
    for t, imgs in zip(texts, images):
        num_image_tokens = t.count(DEFAULT_IMAGE_TOKEN)
        num_images = len(imgs)
        if num_image_tokens < num_images:
            missing = DEFAULT_IMAGE_TOKEN * (num_images - num_image_tokens)
            for marker in ("USER:", "Human:", "HUMAN:"):
                if marker in t:
                    t = t.replace(marker, marker + missing, 1)
                    break
            else:
                t = missing + t
        elif num_image_tokens > num_images:
            parts = t.split(DEFAULT_IMAGE_TOKEN)
            for i in range(len(parts)):
                if i < num_images:
                    parts[i] = parts[i] + DEFAULT_IMAGE_TOKEN
            t = "".join(parts)
        if add_image_ids:
            # NUL-framed placeholder: a literal "<IMAGE>" in user text
            # must not be rewritten into an image slot
            place = "\x00IMG\x00"
            for j in range(len(imgs)):
                t = t.replace(
                    DEFAULT_IMAGE_TOKEN,
                    f"(image {j + 1}: <Image>{place}</Image>)", 1)
            t = t.replace(place, DEFAULT_IMAGE_TOKEN)
        out.append(t)
    return out


class MLlavaProcessor:
    """Tokenizer + image processor + static-shape image-token expansion."""

    def __init__(self, tokenizer, image_processor: MantisImageProcessor,
                 num_image_tokens: int):
        self.tokenizer = tokenizer
        self.image_processor = image_processor
        self.num_image_tokens = num_image_tokens
        self.image_token_index = tokenizer.convert_tokens_to_ids(
            DEFAULT_IMAGE_TOKEN)

    # ------------------------------------------------------------------
    def _expand_image_tokens(self, ids: List[int]) -> List[int]:
        out = []
        for tok in ids:
            if tok == self.image_token_index:
                out.extend([tok] * self.num_image_tokens)
            else:
                out.append(tok)
        return out

    def __call__(
        self,
        text: Union[str, List[str]],
        images: Union[None, Image.Image, List[Image.Image],
                      List[List[Image.Image]]] = None,
        truncation: bool = True,
        max_length: Optional[int] = None,
        add_image_ids: bool = True,
        expand_image_tokens: bool = True,
    ) -> Dict[str, np.ndarray]:
        """Returns input_ids, attention_mask [B, S] (right-padded) and
        pixel_values [N, 3, H, W] numpy arrays."""
        texts = [text] if isinstance(text, str) else list(text)
        if images is not None:
            if isinstance(images, Image.Image):
                images = [images]
            if isinstance(images, list) and (
                    len(images) == 0 or isinstance(images[0], Image.Image)):
                if isinstance(text, str):
                    images = [list(images)]
                else:
                    if len(texts) != len(images):
                        raise ValueError(
                            "Number of texts does not match number of "
                            "image lists.")
                    images = [[im] for im in images]
            images = [list(imgs) for imgs in images]
            if len(images) != len(texts):
                # list-of-lists form: zip would silently drop the
                # unmatched texts' validation and mis-splice features
                raise ValueError(
                    "Number of texts does not match number of image "
                    "lists.")
            texts = normalize_interleaved(texts, images, add_image_ids)
            for t, imgs in zip(texts, images):
                if t.count(DEFAULT_IMAGE_TOKEN) != len(imgs):
                    raise ValueError(
                        "Number of <image> tokens in text does not match "
                        "number of images.")

        enc = self.tokenizer(
            texts, truncation=truncation, max_length=max_length,
            add_special_tokens=True)
        all_ids = enc["input_ids"]

        kept_images: List[Image.Image] = []
        if images is not None:
            for i, ids in enumerate(all_ids):
                n_tok = sum(1 for t in ids if t == self.image_token_index)
                if n_tok < len(images[i]):
                    # tokens truncated away -> drop the extra images
                    # (reference: processing_llava.py:240-249)
                    images[i] = images[i][:n_tok]
                kept_images.extend(images[i])

        if expand_image_tokens:
            all_ids = [self._expand_image_tokens(ids) for ids in all_ids]

        max_len = max(len(x) for x in all_ids)
        pad_id = self.tokenizer.pad_token_id or 0
        input_ids = np.full((len(all_ids), max_len), pad_id, np.int64)
        attention_mask = np.zeros((len(all_ids), max_len), np.int64)
        for i, ids in enumerate(all_ids):
            input_ids[i, :len(ids)] = ids
            attention_mask[i, :len(ids)] = 1

        result: Dict[str, np.ndarray] = {
            "input_ids": input_ids,
            "attention_mask": attention_mask,
        }
        if images is not None:
            result["pixel_values"] = self.image_processor(kept_images)
        return result

    def decode(self, ids, **kw):
        return self.tokenizer.decode(ids, **kw)

    def batch_decode(self, ids, **kw):
        return self.tokenizer.batch_decode(ids, **kw)

    # ------------------------------------------------------------------
    @classmethod
    def from_pretrained(cls, path: str, num_image_tokens: int,
                        tower_type: str = "clip", image_size: int = 336):
        """Build from a local HF checkpoint dir (tokenizer files)."""
        import transformers

        tok = transformers.AutoTokenizer.from_pretrained(path)
        if DEFAULT_IMAGE_TOKEN not in tok.get_vocab():
            tok.add_special_tokens(
                {"additional_special_tokens": [DEFAULT_IMAGE_TOKEN]})
        ip = MantisImageProcessor(
            ImageProcessorConfig.for_tower(tower_type, image_size))
        return cls(tok, ip, num_image_tokens)
