"""Training data pipeline: datasets, label masking, packing, collation.

Re-implements the reference's ``mantis/train/data.py`` (1,979 LoC) with
TPU-static-shape outputs:

- ``ChatDataset`` — conversation JSON/HF datasets, per-separator-style
  label masking (ported rule-for-rule from reference data.py:418-461 —
  these rules define training behavior), sqrt upsampling.
- ``ChatVideoDataset`` — cv2-decoded frames (reference used decord/PyAV,
  data.py:507-560), uniform/fps sampling, frames-as-images mode.
- ``ClassificationDataset`` — multi-label float targets
  (reference data.py:1138-1349).
- ``PackingDataset`` — greedy packing to ``max_self_attn_len``; instead of
  the reference's 4-D block-diagonal masks (data.py:1626-1647) it emits
  **segment ids** + per-segment restarting positions, which the Pallas
  flash kernel consumes directly.
- ``Collator`` — right-pad into *length buckets* (XLA needs static
  shapes; buckets replace dynamic longest-in-batch padding), images
  padded to an image-count bucket with all-zero frames and matching
  pad image tokens stripped of labels.
- ``DatasetCollection`` — concat with sqrt balancing
  (reference data.py:1356-1362).
- ``load_data_from_config`` — YAML mixtures (reference data.py:1901-1979).
"""

from __future__ import annotations

import bisect
import io
import json
import math
import os
import random
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from mantis_tpu.models.conversation import Conversation, SeparatorStyle

IGNORE_INDEX = -100
# per-image model inputs forwarded from processors through datasets and
# concatenated along the image axis by the Collator
IMAGE_BATCH_KEYS = ("pixel_values", "patch_mask", "patch_position_ids",
                    "image_patches", "image_grid_thw", "tiles_per_image",
                    "video_frames")
DEFAULT_IMAGE_TOKEN = "<image>"
DEFAULT_IMAGE_TOKEN_ID: Optional[int] = None
DEFAULT_VIDEO_TOKEN = "<video>"
DEFAULT_VIDEO_TOKEN_ID: Optional[int] = None


def set_ignore_index(new_ignore_index: int = -100) -> None:
    global IGNORE_INDEX
    IGNORE_INDEX = new_ignore_index


def set_default_image_token(tok: str = "<image>") -> None:
    global DEFAULT_IMAGE_TOKEN
    DEFAULT_IMAGE_TOKEN = tok


def set_default_image_token_id(tok_id: Optional[int] = None) -> None:
    global DEFAULT_IMAGE_TOKEN_ID
    DEFAULT_IMAGE_TOKEN_ID = tok_id


def set_default_video_token(tok: str = "<video>") -> None:
    global DEFAULT_VIDEO_TOKEN
    DEFAULT_VIDEO_TOKEN = tok


def set_default_video_token_id(tok_id: Optional[int] = None) -> None:
    global DEFAULT_VIDEO_TOKEN_ID
    DEFAULT_VIDEO_TOKEN_ID = tok_id


# ---------------------------------------------------------------------------
# Image loading helpers (reference: train_utils.load_images)
# ---------------------------------------------------------------------------

def load_image(item, image_dir: Optional[str] = None,
               max_image_size: Optional[int] = None) -> Image.Image:
    if isinstance(item, Image.Image):
        img = item
    elif isinstance(item, dict):
        if item.get("bytes"):
            img = Image.open(io.BytesIO(item["bytes"]))
        else:
            path = item["path"]
            if image_dir and not os.path.isabs(path):
                path = os.path.join(image_dir, path)
            img = Image.open(path)
    elif isinstance(item, (str, os.PathLike)):
        path = str(item)
        if image_dir and not os.path.isabs(path):
            path = os.path.join(image_dir, path)
        img = Image.open(path)
    else:
        raise TypeError(f"Unsupported image item: {type(item)}")
    img = img.convert("RGB")
    if max_image_size and max(img.size) > max_image_size:
        scale = max_image_size / max(img.size)
        img = img.resize((max(int(img.size[0] * scale), 1),
                          max(int(img.size[1] * scale), 1)))
    # min-16px upscale (reference data.py:368-377: tiny images break the
    # CLIP image processor)
    if img.size[0] < 16 or img.size[1] < 16:
        scale = max(16 / img.size[0], 16 / img.size[1])
        img = img.resize((int(img.size[0] * scale),
                          int(img.size[1] * scale)))
    return img


def load_images(items, image_dir=None, max_image_size=None
                ) -> List[Image.Image]:
    if items is None:
        return []
    if not isinstance(items, (list, tuple)):
        items = [items]
    return [load_image(x, image_dir, max_image_size) for x in items]


# ---------------------------------------------------------------------------
# Label masking (ported rule-for-rule from reference data.py:418-461)
# ---------------------------------------------------------------------------

def mask_labels(input_ids: Sequence[int], conv: Conversation,
                tokenizer) -> np.ndarray:
    """Produce labels for one tokenized conversation (UNexpanded ids).

    Only separator-token positions drive the masking, exactly as in the
    reference; anything not explicitly unmasked stays IGNORE_INDEX.
    """
    ids = np.asarray(input_ids, dtype=np.int64)
    target = np.full_like(ids, IGNORE_INDEX)
    style = conv.sep_style

    if style == SeparatorStyle.MFUYU:
        sep_id = tokenizer.convert_tokens_to_ids(conv.sep)
        sep2_id = tokenizer.convert_tokens_to_ids(conv.sep2)
        sep_idxs = np.nonzero(ids == sep_id)[0].tolist()
        sep2_idxs = np.nonzero(ids == sep2_id)[0].tolist()
        if not (len(sep_idxs) == len(sep2_idxs)
                or len(sep_idxs) == len(sep2_idxs) + 1):
            raise ValueError(f"len({sep_idxs}) != len({sep2_idxs})")
        if len(sep_idxs) == len(sep2_idxs) + 1:
            sep2_idxs.append(len(ids) - 1)
        for j in range(len(sep_idxs)):
            target[sep_idxs[j] + 1:sep2_idxs[j] + 1] = \
                ids[sep_idxs[j] + 1:sep2_idxs[j] + 1]
    elif style in (SeparatorStyle.SINGLE, SeparatorStyle.LLAMA_3):
        sep_id = tokenizer.convert_tokens_to_ids(conv.sep)
        sep_idxs = np.nonzero(ids == sep_id)[0].tolist()
        for i in range(len(sep_idxs)):
            if i % 2 == 0:
                continue
            if i == len(sep_idxs) - 1:
                target[sep_idxs[i] + 1:] = ids[sep_idxs[i] + 1:]
            else:
                target[sep_idxs[i] + 1:sep_idxs[i + 1] + 1] = \
                    ids[sep_idxs[i] + 1:sep_idxs[i + 1] + 1]
    elif style in (SeparatorStyle.IDEFICS_2, SeparatorStyle.IDEFICS_3,
                   SeparatorStyle.QWEN2VL, SeparatorStyle.MPT):
        skip_offset = 0 if conv.system else 1
        sep_id = tokenizer.convert_tokens_to_ids(conv.sep.strip(" \n"))
        sep_idxs = np.nonzero(ids == sep_id)[0].tolist()
        sep_offset = 1 + conv.sep_offset
        for i in range(len(sep_idxs)):
            if i % 2 == skip_offset:
                continue
            if i == len(sep_idxs) - 1:
                target[sep_idxs[i] + sep_offset:] = \
                    ids[sep_idxs[i] + sep_offset:]
            else:
                target[sep_idxs[i] + sep_offset:sep_idxs[i + 1] + 1] = \
                    ids[sep_idxs[i] + sep_offset:sep_idxs[i + 1] + 1]
    elif style == SeparatorStyle.PLAIN:
        assert DEFAULT_IMAGE_TOKEN_ID is not None, (
            "set_default_image_token_id required for PLAIN masking")
        not_img = ids != DEFAULT_IMAGE_TOKEN_ID
        target[not_img] = ids[not_img]
    else:
        raise ValueError(f"Unknown separator style {style}")
    return target


def expand_ids_and_labels(
    ids: np.ndarray, labels: np.ndarray, image_token_id: int,
    num_image_tokens: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Expand each image token to N copies; expanded positions get
    IGNORE_INDEX labels (the reference's merge fills image positions with
    ignore_index, modeling_llava.py:322-341)."""
    out_ids: List[int] = []
    out_lab: List[int] = []
    for t, l in zip(ids.tolist(), labels.tolist()):
        if t == image_token_id:
            out_ids.extend([t] * num_image_tokens)
            out_lab.extend([IGNORE_INDEX] * num_image_tokens)
        else:
            out_ids.append(t)
            out_lab.append(l)
    return np.asarray(out_ids, np.int64), np.asarray(out_lab, np.int64)


# ---------------------------------------------------------------------------
# Datasets
# ---------------------------------------------------------------------------

def _load_json_data(path: str) -> List[Dict]:
    if path.endswith(".jsonl"):
        with open(path) as f:
            return [json.loads(line) for line in f if line.strip()]
    with open(path) as f:
        return json.load(f)


def _double_image_tokens_after_first(texts: List[str]) -> List[str]:
    """Every <image> occurrence except the first (reading order across
    the message list) becomes two tokens — matches a media_transform
    that inserts one derived image BEFORE each subsequent original."""
    seen = 0
    out = []
    for t in texts:
        parts = t.split(DEFAULT_IMAGE_TOKEN)
        new = parts[0]
        for p in parts[1:]:
            seen += 1
            new += DEFAULT_IMAGE_TOKEN * (1 if seen == 1 else 2) + p
        out.append(new)
    return out


class ChatDataset:
    """Interleaved multi-image conversation dataset
    (reference: data.py:94-505)."""

    def __init__(
        self,
        data_path: str,
        processor,
        conv: Conversation,
        name: Optional[str] = None,
        split: str = "train",
        max_seq_len: int = 8192,
        max_num_images: Optional[int] = None,
        max_size: Optional[int] = None,
        sample_ratio: Optional[float] = None,
        image_dir: Optional[str] = None,
        max_image_size: Optional[int] = None,
        ensure_seq_len_multiple_of: Optional[int] = None,
        shuffle: bool = False,
        seed: int = 42,
        revision: Optional[str] = None,
        media_transform=None,
    ):
        self.data_path = data_path
        self.name = name
        self.split = split
        self.processor = processor
        self.conv = conv.copy()
        self.max_seq_len = max_seq_len
        # media_transform (idefics2_delta): [m0, m1, ...] ->
        # [m0, d01, m1, d12, m2, ...] with a derived image inserted
        # BEFORE each subsequent original; every <image> token after the
        # first is expanded to two so text stays aligned with media
        # (reference: models/idefics2_delta/modeling_idefics2.py:1213-
        # 1234 DeltaFlowModel — flow images between consecutive frames).
        self.media_transform = media_transform
        self.image_dir = image_dir or (
            os.path.dirname(data_path) if os.path.exists(data_path) else None)
        self.max_image_size = max_image_size
        self.ensure_seq_len_multiple_of = ensure_seq_len_multiple_of

        if os.path.exists(data_path):
            data = _load_json_data(data_path)
        else:
            import datasets as hf_datasets

            for attempt in range(5):  # retry loop (reference data.py:146-156)
                try:
                    data = hf_datasets.load_dataset(
                        data_path, name, split=split, revision=revision)
                    break
                except json.JSONDecodeError:
                    if attempt == 4:
                        raise
        # filter by image count (reference data.py:166-186)
        if max_num_images is not None:
            data = [x for x in data
                    if len(x.get("images") or []) <= max_num_images]
        else:
            data = list(data)
        if shuffle:
            random.Random(seed).shuffle(data)
        if max_size:
            data = data[:max_size]
        self.data = data
        # sqrt upsampling factor consumed by DatasetCollection
        self.sample_ratio = sample_ratio
        # default to the plural key; fall back only when the dataset
        # actually uses the singular form
        self.image_key = "image" if (
            data and "image" in data[0] and "images" not in data[0]
        ) else "images"

    def __len__(self) -> int:
        return len(self.data)

    def _conv_messages(self, item) -> List[List[str]]:
        conv = self.conv
        roles = {"human": conv.roles[0], "gpt": conv.roles[1],
                 "user": conv.roles[0], "assistant": conv.roles[1]}
        key = "conversation" if "conversation" in item else "conversations"
        source = item[key]
        first_role = source[0].get("from", source[0].get("role"))
        if roles[first_role] != conv.roles[0]:
            source = source[1:]  # skip a leading assistant turn
        messages = []
        for j, sentence in enumerate(source):
            role = roles[sentence.get("from", sentence.get("role"))]
            assert role == conv.roles[j % 2], "role alternation violated"
            messages.append([role, sentence.get(
                "content", sentence.get("text", sentence.get("value", "")))])
        return messages

    def media_key(self, idx: int):
        """Hashable identity of the item's media, used by
        packing_same_mm_media (reference: data.py:607-614) to pack
        conversations sharing a video/image set together."""
        item = self.data[idx]
        if "video" in item:
            return ("video", item["video"])
        imgs = item.get(self.image_key) or []
        return tuple(im if isinstance(im, str) else ("obj", i)
                     for i, im in enumerate(imgs))

    def getitem(self, idx: int) -> Dict[str, np.ndarray]:
        return self.getitem_from_item(self.data[idx])

    def getitem_from_item(self, item: Dict) -> Dict[str, np.ndarray]:
        # Takes the item directly (not an index) so subclasses can
        # transform items without mutating self.data — __getitem__ runs
        # concurrently under PrefetchDataLoader's thread pool.
        conv_messages = self._conv_messages(item)
        sub_images = load_images(item.get(self.image_key),
                                 self.image_dir, self.max_image_size)

        if self.conv.sep_style == SeparatorStyle.PLAIN:
            # pretraining: text of the 2nd message + sep
            # (reference data.py:382-396)
            assert len(conv_messages) >= 2
            text = conv_messages[1][1]
            n_tok = text.count(DEFAULT_IMAGE_TOKEN)
            if n_tok < len(sub_images):
                text = f"{DEFAULT_IMAGE_TOKEN} " * (
                    len(sub_images) - n_tok) + text
            if self.media_transform is not None and len(sub_images) >= 2:
                sub_images = self.media_transform(sub_images)
                text = _double_image_tokens_after_first([text])[0]
            conv_str = text + self.conv.sep
            enc = self.processor(
                conv_str, sub_images or None, truncation=True,
                max_length=self.max_seq_len, add_image_ids=False,
                expand_image_tokens=False)
        else:
            n_tok = sum(m[1].count(DEFAULT_IMAGE_TOKEN)
                        for m in conv_messages)
            if sub_images and n_tok < len(sub_images):
                conv_messages[0][1] = DEFAULT_IMAGE_TOKEN * (
                    len(sub_images) - n_tok) + conv_messages[0][1]
            if self.media_transform is not None and len(sub_images) >= 2:
                sub_images = self.media_transform(sub_images)
                texts = _double_image_tokens_after_first(
                    [m[1] for m in conv_messages])
                conv_messages = [[m[0], t]
                                 for m, t in zip(conv_messages, texts)]
            conv = self.conv.copy()  # render on a local copy: thread-safe
            conv.messages = conv_messages
            conv_str = conv.get_prompt()
            enc = self.processor(
                conv_str, sub_images or None, truncation=True,
                max_length=self.max_seq_len, expand_image_tokens=False)

        ids = enc["input_ids"][0]
        labels = mask_labels(ids, self.conv, self.processor.tokenizer)
        expand = getattr(self.processor, "expand_ids_and_labels", None)
        if expand is not None:
            # arch-specific expansion (idefics fake-token wrapping,
            # already-inline internvl/qwen2 runs, fuyu patch blocks)
            ids, labels = expand(np.asarray(ids, np.int64), labels)
        else:
            ids, labels = expand_ids_and_labels(
                ids, labels, self.processor.image_token_index,
                self.processor.num_image_tokens)

        if (self.ensure_seq_len_multiple_of
                and len(ids) % self.ensure_seq_len_multiple_of != 0):
            pad_id = self.processor.tokenizer.pad_token_id or 0
            pad = self.ensure_seq_len_multiple_of - (
                len(ids) % self.ensure_seq_len_multiple_of)
            ids = np.concatenate([ids, np.full(pad, pad_id, np.int64)])
            labels = np.concatenate(
                [labels, np.full(pad, IGNORE_INDEX, np.int64)])

        out = {"input_ids": ids, "labels": labels}
        for k in IMAGE_BATCH_KEYS:
            if k in enc:
                out[k] = enc[k]
        return out

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        # data-level self-healing (reference data.py:495-505)
        try:
            return self.getitem(idx)
        except Exception:
            print(f"Error at {idx}, {self.data_path}, {self.name}, "
                  f"{self.split}, trying next item")
            return self.__getitem__((idx + 1) % len(self))

    # -- length estimation for packing plans ---------------------------
    # The reference probes ~20 tokenized items to calibrate a cheap
    # per-item length estimate for its packing planner (reference
    # data.py:1563-1587).  Same idea here: fully tokenize <=20 evenly-
    # spaced probe items once, derive a chars-per-token ratio for the
    # text part (media token cost is known from the processor), then
    # estimate every item from its raw char/media counts — no
    # tokenization on the planning path.

    def _item_text_chars(self, item) -> int:
        key = ("conversation" if "conversation" in item
               else "conversations")
        return sum(
            len(s.get("content", s.get("text", s.get("value", ""))))
            for s in item.get(key, []))

    def _item_media_tokens(self, item) -> int:
        """Known token cost of the item's media after expansion."""
        per = getattr(self.processor, "num_image_tokens", 0) or 0
        n = len(item.get(self.image_key) or [])
        if self.media_transform is not None and n >= 2:
            n = 2 * n - 1      # derived delta images interleave
        return per * n

    def media_count(self, idx: int) -> int:
        """Images the item contributes to a pack (PackingDataset's
        max_images_per_pack accounting)."""
        n = len(self.data[idx].get(self.image_key) or [])
        if self.media_transform is not None and n >= 2:
            n = 2 * n - 1
        return n

    def _fit_length_model(self, n_probe: int = 20) -> None:
        """Fit text_tokens ~ slope*chars + intercept on probe items.
        The intercept matters: the rendered template (system prompt,
        role markers, separators, BOS) adds a near-constant token
        overhead that a pure chars-per-token ratio mis-attributes,
        systematically under-estimating short items."""
        idxs = np.unique(np.linspace(
            0, len(self.data) - 1,
            min(n_probe, len(self.data))).astype(int))
        pts = []
        for i in idxs:
            try:
                out = self.getitem(int(i))
            except Exception:
                continue   # self-healing path covers bad items
            item = self.data[int(i)]
            L = len(out["input_ids"])
            chars = self._item_text_chars(item)
            mt = self._item_media_tokens(item)
            pts.append((chars, max(L - mt, 1)))
        if len(pts) >= 2 and len({c for c, _ in pts}) >= 2:
            A = np.asarray([[c, 1.0] for c, _ in pts], np.float64)
            y = np.asarray([t for _, t in pts], np.float64)
            slope, intercept = np.linalg.lstsq(A, y, rcond=None)[0]
            slope = max(float(slope), 0.0)
        elif pts:
            c, t = pts[0]
            slope, intercept = (t / c if c else 0.0), (0.0 if c else t)
        else:
            slope, intercept = 0.25, 0.0   # ~4 chars/token default
        self._len_model = (slope, float(intercept))

    def estimate_length(self, idx: int) -> int:
        """Cheap token-length estimate for PackingDataset's plan
        (calibrated once on probe items; see _fit_length_model)."""
        if not hasattr(self, "_len_model"):
            self._fit_length_model()
        slope, intercept = self._len_model
        item = self.data[idx]
        est = (slope * self._item_text_chars(item) + intercept
               + self._item_media_tokens(item))
        return int(np.clip(est, 1, self.max_seq_len))


def video_frame_indices(total: int, native_fps: float, num_frames: int,
                        fps: Optional[float] = None,
                        max_num_frames: int = 16) -> np.ndarray:
    """EXACT reference training-path frame selection
    (reference data.py:706-720):

      - ``fps`` set: every ceil(native_fps/fps)-th frame, capped at
        ``max_num_frames``;
      - else, when the clip exceeds the target: every
        ceil(total/num_frames)-th frame (which can yield FEWER than
        num_frames — e.g. 10 frames at target 8 sample [0,5], the
        reference's arange-with-ceil-interval behavior, NOT linspace);
      - short clips keep every frame.

    Golden-pinned against the formula in tests/test_video_datasets.py
    because eval/train numbers depend on identical frame choices."""
    if total <= 0:
        return np.zeros((1,), int)   # let the decoder try frame 0
    if fps:
        interval = math.ceil(native_fps / fps)
        return np.arange(0, total, interval).astype(int)[:max_num_frames]
    if num_frames and total > num_frames:
        interval = math.ceil(total / num_frames)
        return np.arange(0, total, interval).astype(int)
    return np.arange(total)


class ChatVideoDataset(ChatDataset):
    """Video conversations: frames decoded host-side via cv2
    (reference uses decord/PyAV, data.py:507-560; cv2 is the decoder
    available in this image), frame INDICES chosen by the reference's
    exact formula (video_frame_indices), fed as interleaved frame
    images."""

    def __init__(self, *args, num_frames: int = 8, fps: Optional[float] =
                 None, max_num_frames: int = 16, video_dir: Optional[str]
                 = None, use_video_encoder: bool = False,
                 num_video_tokens: int = 64, **kwargs):
        super().__init__(*args, **kwargs)
        self.num_frames = num_frames
        self.fps = fps
        self.max_num_frames = max_num_frames
        self.video_dir = video_dir or self.image_dir
        # reference data.py:763-799: keep a <video> token that a video
        # encoder consumes (vs frames-as-images): the token expands to
        # num_video_tokens copies (one per temporal-perceiver latent,
        # e.g. siglip_video's resampler) and raw frames ride along as
        # ``video_frames`` for the encoder.
        self.use_video_encoder = use_video_encoder
        self.num_video_tokens = num_video_tokens
        if use_video_encoder:
            tok = self.processor.tokenizer
            if DEFAULT_VIDEO_TOKEN not in tok.get_vocab():
                tok.add_special_tokens(
                    {"additional_special_tokens": [DEFAULT_VIDEO_TOKEN]})

    def _read_video_frames(self, path: str) -> List[Image.Image]:
        import cv2

        if self.video_dir and not os.path.isabs(path):
            path = os.path.join(self.video_dir, path)
        cap = cv2.VideoCapture(path)
        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        native_fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
        idxs = video_frame_indices(total, native_fps, self.num_frames,
                                   self.fps, self.max_num_frames)
        frames = []
        for i in idxs:
            cap.set(cv2.CAP_PROP_POS_FRAMES, int(i))
            ok, frame = cap.read()
            if not ok:
                continue
            frames.append(Image.fromarray(
                cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)))
        cap.release()
        return frames

    def getitem(self, idx: int) -> Dict[str, np.ndarray]:
        item = self.data[idx]
        frames = self._read_video_frames(item["video"]) \
            if "video" in item else []
        conv_messages = self._conv_messages(item)
        n = len(frames)
        if self.use_video_encoder:
            # <video> stays a video placeholder run; frames go to the
            # video tower separately
            vid_tok_id = self.processor.tokenizer.convert_tokens_to_ids(
                DEFAULT_VIDEO_TOKEN)
            out = self._getitem_video_encoder(
                item, conv_messages, frames, vid_tok_id)
            return out
        # frames-as-images: replace <video> with N <image> tokens
        # (reference data.py:763-799)
        for m in conv_messages:
            if DEFAULT_VIDEO_TOKEN in m[1]:
                m[1] = m[1].replace(
                    DEFAULT_VIDEO_TOKEN, DEFAULT_IMAGE_TOKEN * n, 1)
        item = dict(item)
        item["images"] = frames
        item.pop("video", None)
        key = "conversation" if "conversation" in item else "conversations"
        new_source = []
        for (role, text) in conv_messages:
            new_source.append({"from":
                               "human" if role == self.conv.roles[0]
                               else "gpt", "value": text})
        item[key] = new_source
        return self.getitem_from_item(item)

    def _getitem_video_encoder(self, item, conv_messages, frames,
                               vid_tok_id):
        conv = self.conv.copy()
        conv.messages = conv_messages
        conv_str = conv.get_prompt()
        enc = self.processor(conv_str, None, truncation=True,
                             max_length=self.max_seq_len,
                             expand_image_tokens=False)
        ids = np.asarray(enc["input_ids"][0], np.int64)
        labels = mask_labels(ids, self.conv, self.processor.tokenizer)
        # expand each <video> token to num_video_tokens placeholders
        out_ids, out_lab = [], []
        for t, l in zip(ids.tolist(), labels.tolist()):
            if t == vid_tok_id:
                out_ids.extend([t] * self.num_video_tokens)
                out_lab.extend([IGNORE_INDEX] * self.num_video_tokens)
            else:
                out_ids.append(t)
                out_lab.append(l)
        out = {"input_ids": np.asarray(out_ids, np.int64),
               "labels": np.asarray(out_lab, np.int64)}
        if frames:
            ip = getattr(self.processor, "image_processor", None)
            if ip is not None:
                out["video_frames"] = ip(frames)
            else:
                out["video_frames"] = np.stack(
                    [np.asarray(f, np.float32).transpose(2, 0, 1) / 255.
                     for f in frames])
        return out

    def _item_media_tokens(self, item) -> int:
        if "video" not in item:
            return super()._item_media_tokens(item)
        if self.use_video_encoder:
            return self.num_video_tokens
        # frames-as-images: fps-sampled counts vary per clip; the fixed
        # num_frames target is the planning estimate (clips shorter
        # than it over-estimate, which only under-fills, never splits)
        per = getattr(self.processor, "num_image_tokens", 0) or 0
        return per * self.num_frames

    def media_count(self, idx: int) -> int:
        if "video" not in self.data[idx]:
            return super().media_count(idx)
        return 0 if self.use_video_encoder else self.num_frames


class ClassificationDataset(ChatDataset):
    """Multi-label float targets (reference data.py:1138-1349):
    item['labels'] is a {name: float} dict; emits 'class_labels'."""

    def __init__(self, *args, label_names: Optional[List[str]] = None,
                 **kwargs):
        super().__init__(*args, **kwargs)
        if label_names is None:
            names = set()
            for it in self.data:
                names.update((it.get("labels") or {}).keys())
            label_names = sorted(names)
        self.label_names = label_names

    def getitem_from_item(self, item: Dict) -> Dict[str, np.ndarray]:
        out = super().getitem_from_item(item)
        raw = item.get("labels") or {}
        out["class_labels"] = np.asarray(
            [float(raw.get(n, 0.0)) for n in self.label_names], np.float32)
        # classification: no LM labels
        out["labels"] = np.full_like(out["labels"], IGNORE_INDEX)
        return out


# ---------------------------------------------------------------------------
# Mixtures / packing / collation
# ---------------------------------------------------------------------------

class DatasetCollection:
    """Concat with sqrt balancing: each sub-dataset is sampled
    proportionally to sqrt(len), capped at 1.1x actual size
    (reference data.py:1351-1372)."""

    def __init__(self, datasets: List, balancing: bool = True):
        self.datasets = datasets
        if balancing and len(datasets) > 1:
            sizes = np.array([len(d) for d in datasets], np.float64)
            ratios = np.array(
                [d.sample_ratio if getattr(d, "sample_ratio", None)
                 else math.sqrt(s) for d, s in zip(datasets, sizes)])
            ratios = ratios / ratios.sum()
            target = ratios * sizes.sum()
            target = np.minimum(target, sizes * 1.1)
            self.counts = np.maximum(target.astype(int), 1)
        else:
            self.counts = np.array([len(d) for d in datasets], int)
        self.cum = np.cumsum(self.counts)

    def __len__(self) -> int:
        return int(self.cum[-1]) if len(self.counts) else 0

    def __getitem__(self, idx: int):
        ds_idx = bisect.bisect_right(self.cum, idx)
        local = idx - (self.cum[ds_idx - 1] if ds_idx else 0)
        ds = self.datasets[ds_idx]
        return ds[int(local) % len(ds)]

    def estimate_length(self, idx: int):
        """Forward to the owning sub-dataset (None when it has no
        estimator — PackingDataset falls back conservatively)."""
        ds_idx = bisect.bisect_right(self.cum, idx)
        local = idx - (self.cum[ds_idx - 1] if ds_idx else 0)
        ds = self.datasets[ds_idx]
        est = getattr(ds, "estimate_length", None)
        return est(int(local) % len(ds)) if est is not None else None

    def media_count(self, idx: int) -> int:
        ds_idx = bisect.bisect_right(self.cum, idx)
        local = idx - (self.cum[ds_idx - 1] if ds_idx else 0)
        ds = self.datasets[ds_idx]
        mc = getattr(ds, "media_count", None)
        return mc(int(local) % len(ds)) if mc is not None else 0


class PackingDataset:
    """Greedy sequence packing with segment ids.

    The reference builds 4-D block-diagonal masks + restarting position
    ids (data.py:1626-1647); here each packed example carries
    ``segment_ids`` (1..K, 0 = padding) and per-segment positions, which
    is what the flash kernel and loss consume.
    """

    def __init__(self, dataset, max_self_attn_len: int = 8192,
                 max_images_per_pack: Optional[int] = None,
                 packing_same_mm_media: bool = False):
        self.dataset = dataset
        self.max_len = max_self_attn_len
        self.max_images = max_images_per_pack
        # group conversations sharing a video/image set into the same
        # pack (reference: data.py:607-614)
        self.same_mm_media = packing_same_mm_media
        self._plan: List[List[int]] = []
        self._build_plan()

    def _build_plan(self):
        """Build the pack plan from estimated lengths.

        When every item has a length estimate (ChatDataset exposes
        estimate_length — probe-calibrated, reference data.py:1563-1587)
        the plan is first-fit-decreasing over a bounded window of open
        packs: measured fill >90% on varied-length mixtures where the
        round-3 sequential plan reached ~80% (and the length-blind
        max_len//4 default far less).  A small capacity margin absorbs
        estimator noise so a slightly-underestimated pack truncates a
        few text tokens instead of dropping an image part.  same-media
        grouping and estimator-less datasets keep the sequential greedy
        plan (media adjacency / conservative default respectively)."""
        n = len(self.dataset)
        est = getattr(self.dataset, "estimate_length", None)
        lengths = [(est(i) if est is not None else None)
                   for i in range(n)]
        mc = getattr(self.dataset, "media_count", None)
        imgs = [(mc(i) if mc is not None else 0) for i in range(n)]
        cap = self.max_len - max(8, self.max_len // 32)  # margin

        def fits(cur_len, cur_imgs, L, k, capacity):
            if cur_len + L > capacity:
                return False
            return (self.max_images is None
                    or cur_imgs + k <= self.max_images)

        def sequential(order, capacity):
            cur: List[int] = []
            cur_len = cur_imgs = 0
            for i in order:
                L = lengths[i] if lengths[i] is not None \
                    else self.max_len // 4
                if cur and not fits(cur_len, cur_imgs, L, imgs[i],
                                    capacity):
                    self._plan.append(cur)
                    cur, cur_len, cur_imgs = [], 0, 0
                cur.append(i)
                cur_len += L
                cur_imgs += imgs[i]
            if cur:
                self._plan.append(cur)

        if self.same_mm_media and hasattr(self.dataset, "media_key"):
            order = sorted(range(n), key=lambda i: (
                str(self.dataset.media_key(i)), i))
            sequential(order, cap)
            return
        if n and all(L is not None for L in lengths):
            order = sorted(range(n), key=lambda i: -lengths[i])
            open_bins: List[list] = []   # [used_len, used_imgs, items]
            MAX_OPEN = 64
            for i in order:
                L = lengths[i]
                for b in open_bins:
                    if fits(b[0], b[1], L, imgs[i], cap):
                        b[0] += L
                        b[1] += imgs[i]
                        b[2].append(i)
                        break
                else:
                    open_bins.append([L, imgs[i], [i]])
                    if len(open_bins) > MAX_OPEN:
                        # close the fullest pack (least room left)
                        j = max(range(len(open_bins)),
                                key=lambda k: open_bins[k][0])
                        self._plan.append(open_bins.pop(j)[2])
            for b in open_bins:
                self._plan.append(b[2])
            return
        sequential(range(n), cap)

    def __len__(self) -> int:
        return len(self._plan)

    def planned_fill_rate(self) -> float:
        """Estimated tokens per pack / max_len (plan-time, cheap)."""
        est = getattr(self.dataset, "estimate_length", None)
        if est is None or not self._plan:
            return 0.0
        total = sum(est(i) or self.max_len // 4
                    for pack in self._plan for i in pack)
        return total / (len(self._plan) * self.max_len)

    def measured_fill_rate(self) -> float:
        """Tokens ACTUALLY packed / capacity — tokenizes everything;
        the number docs/PERF.md reports for the example mixture."""
        if not self._plan:
            return 0.0
        total = sum(len(self[k]["input_ids"]) for k in range(len(self)))
        return total / (len(self._plan) * self.max_len)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        parts = [self.dataset[i] for i in self._plan[idx]]
        ids, labels, seg, pos, pix = [], [], [], [], []
        total = 0
        for s_idx, p in enumerate(parts, start=1):
            n = len(p["input_ids"])
            if total + n > self.max_len:
                if "pixel_values" in p and len(p["pixel_values"]):
                    # never SPLIT an image part: a cut image-token
                    # block desynchronizes patches from tokens for
                    # every later image in the pack (the plan's length
                    # estimates are approximate, so overflow happens)
                    if ids:
                        break
                    raise ValueError(
                        f"packed part with images exceeds "
                        f"max_self_attn_len={self.max_len} on its own "
                        f"({n} tokens); raise the budget or truncate "
                        f"upstream")
                n = self.max_len - total
                if n <= 0:
                    break
            ids.append(p["input_ids"][:n])
            labels.append(p["labels"][:n])
            seg.append(np.full(n, s_idx, np.int32))
            pos.append(np.arange(n, dtype=np.int32))
            if "pixel_values" in p:
                pix.append(p["pixel_values"])
            total += n
        out = {
            "input_ids": np.concatenate(ids),
            "labels": np.concatenate(labels),
            "segment_ids": np.concatenate(seg),
            "positions": np.concatenate(pos),
        }
        if pix:
            out["pixel_values"] = np.concatenate(pix)
        return out


def _bucket_len(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class Collator:
    """Right-pad into static length buckets (TPU-friendly replacement for
    the reference's dynamic longest-in-batch padding, data.py:1375-1544).

    Image counts are padded up to a bucket with black frames; the
    corresponding rows of ``input_ids`` get pad image tokens appended so
    splice arithmetic still matches (their labels are IGNORE and their
    segment id is 0, so they influence nothing).
    """

    def __init__(self, pad_token_id: int, image_token_id: int,
                 num_image_tokens: int,
                 seq_buckets: Sequence[int] = (512, 1024, 2048, 4096, 8192),
                 image_buckets: Sequence[int] = (0, 1, 2, 4, 8, 16, 32),
                 image_size: int = 336, pad_to_max: bool = False,
                 context_parallel_size: int = 1,
                 pad_image_tokens: bool = True):
        self.pad_token_id = pad_token_id
        self.image_token_id = image_token_id
        self.num_image_tokens = num_image_tokens
        self.seq_buckets = sorted(seq_buckets)
        self.image_buckets = sorted(image_buckets)
        self.image_size = image_size
        self.pad_to_max = pad_to_max
        self.cp = context_parallel_size
        # pad_image_tokens=False: pad images are appended to
        # pixel_values (static shapes for the vision tower) but get NO
        # placeholder tokens in the sequence.  Correct for
        # feature-GATHER models (mllava merge_image_features: the i-th
        # image token takes flat feature row i, so unreferenced
        # trailing pad features are never read) — and required when
        # packed rows leave no sequence headroom for placeholder
        # blocks.  Keep True for archs that consume ALL image features
        # positionally (x-attn kv, strict masked-scatter merges).
        self.pad_image_tokens = pad_image_tokens
        if self.cp > 1:
            for b in self.seq_buckets:
                assert b % (2 * self.cp) == 0, (
                    f"seq bucket {b} not divisible by 2*cp={2 * self.cp}")

    def __call__(self, examples: List[Dict[str, np.ndarray]]
                 ) -> Dict[str, np.ndarray]:
        b = len(examples)
        n_imgs = sum(e.get("pixel_values", np.zeros((0,))).shape[0]
                     for e in examples)
        img_bucket = (self.image_buckets[-1] if self.pad_to_max
                      else _bucket_len(n_imgs, self.image_buckets))
        # clamp: image_buckets=(0,) means "exact counts, never pad",
        # and a count above the top bucket pads nothing — a negative
        # pad would shrink the last row's contribution to the seq
        # bucket choice and silently truncate it
        pad_imgs = max(img_bucket - n_imgs, 0)

        # pad images become extra image tokens appended to the LAST row
        extra_tokens = (pad_imgs * self.num_image_tokens
                        if self.pad_image_tokens else 0)
        max_len = max(
            len(e["input_ids"]) + (extra_tokens if i == b - 1 else 0)
            for i, e in enumerate(examples))
        tgt = (self.seq_buckets[-1] if self.pad_to_max
               else _bucket_len(max_len, self.seq_buckets))

        input_ids = np.full((b, tgt), self.pad_token_id, np.int64)
        labels = np.full((b, tgt), IGNORE_INDEX, np.int64)
        segment_ids = np.zeros((b, tgt), np.int32)
        positions = np.zeros((b, tgt), np.int32)
        kept_images: List[int] = []  # images surviving truncation, per ex.
        for i, e in enumerate(examples):
            ids = np.asarray(e["input_ids"][:tgt]).copy()
            n = len(ids)
            lab = np.asarray(e["labels"][:n]).copy()
            seg = e.get("segment_ids")
            seg = (np.asarray(seg[:n]).copy() if seg is not None
                   else np.ones(n, np.int32))
            n_ex_imgs = e.get("pixel_values", np.zeros((0,))).shape[0]
            if len(e["input_ids"]) > tgt and n_ex_imgs:
                # Truncation may cut image-token blocks: keep only the
                # fully surviving images and neutralize any partial
                # trailing block so token count == kept_images * P
                # (otherwise merge_image_features misassigns patches for
                # every subsequent image in the batch).
                kept_tok = int((ids == self.image_token_id).sum())
                full = kept_tok // self.num_image_tokens
                partial = kept_tok % self.num_image_tokens
                if partial:
                    img_pos = np.flatnonzero(ids == self.image_token_id)
                    cut = img_pos[-partial:]
                    ids[cut] = self.pad_token_id
                    lab[cut] = IGNORE_INDEX
                    seg[cut] = 0
                kept_images.append(min(full, n_ex_imgs))
            else:
                kept_images.append(n_ex_imgs)
            input_ids[i, :n] = ids
            labels[i, :n] = lab
            segment_ids[i, :n] = seg
            pos = e.get("positions")
            positions[i, :n] = pos[:n] if pos is not None \
                else np.arange(n)
            if i == b - 1 and pad_imgs > 0 and self.pad_image_tokens:
                m = min(extra_tokens, tgt - n)
                if m < extra_tokens:
                    raise ValueError(
                        "sequence bucket too small for pad image tokens")
                input_ids[i, n:n + m] = self.image_token_id
                # labels stay IGNORE, segment stays 0 -> inert
        if self.cp > 1:
            # Context parallelism: pre-shift labels globally (so the CP
            # loss needs no local shift), then zigzag-reorder the
            # sequence dimension (reference extract_local semantics,
            # modeling_internlm2.py:134-208).
            from mantis_tpu.ops.ring_attention import zigzag_reorder

            shifted = np.full_like(labels, IGNORE_INDEX)
            shifted[:, :-1] = labels[:, 1:]
            # a shifted label is only valid where the CURRENT token is
            # attended (mirror of attention_mask[..., 1:] gating)
            shifted[:, :-1][segment_ids[:, 1:] == 0] = IGNORE_INDEX
            labels = shifted
            # Feature-index map computed on the ORIGINAL order: after the
            # zigzag permutation a cumsum over image-token positions no
            # longer matches the row-major image order, so the model must
            # gather by this precomputed (and identically permuted) map.
            is_img = (input_ids == self.image_token_id)
            image_feature_idx = (
                np.cumsum(is_img.reshape(-1)).reshape(is_img.shape)
                .astype(np.int32) - 1)
            input_ids = zigzag_reorder(input_ids, self.cp)
            labels = zigzag_reorder(labels, self.cp)
            segment_ids = zigzag_reorder(segment_ids, self.cp)
            positions = zigzag_reorder(positions, self.cp)
            image_feature_idx = zigzag_reorder(image_feature_idx, self.cp)

        out = {
            "input_ids": input_ids,
            "labels": labels,
            "segment_ids": segment_ids,
            "positions": positions,
        }
        if self.cp > 1:
            out["image_feature_idx"] = image_feature_idx
        pix = [e["pixel_values"][:kept_images[i]]
               for i, e in enumerate(examples) if "pixel_values" in e]
        if pix or pad_imgs:
            pix_cat = (np.concatenate(pix) if pix else
                       np.zeros((0, 3, self.image_size, self.image_size),
                                np.float32))
            if pad_imgs > 0:
                pad_block = np.zeros(
                    (pad_imgs, *pix_cat.shape[1:]) if pix else
                    (pad_imgs, 3, self.image_size, self.image_size),
                    np.float32)
                pix_cat = np.concatenate([pix_cat, pad_block])
            out["pixel_values"] = pix_cat.astype(np.float32)
        # other per-image inputs (NaViT masks, fuyu patches, qwen grids)
        for key in IMAGE_BATCH_KEYS:
            if key == "pixel_values":
                continue
            vals = [e[key] for e in examples if key in e]
            if not vals:
                continue
            if key in ("patch_mask", "patch_position_ids"):
                vals = [e[key][:kept_images[i]]
                        for i, e in enumerate(examples) if key in e]
                cat = np.concatenate(vals)
                if pad_imgs > 0:
                    # pad images are full-square canvases: all-ones mask
                    # and the square position grid keep NaViT attention
                    # well-formed; nothing references their features
                    pad = (np.ones((pad_imgs, *cat.shape[1:]), cat.dtype)
                           if key == "patch_mask" else
                           np.broadcast_to(
                               np.arange(cat.shape[1], dtype=cat.dtype),
                               (pad_imgs, cat.shape[1])).copy())
                    cat = np.concatenate([cat, pad])
                out[key] = cat
            else:
                # fuyu patches / qwen grids: no pad-image or truncation
                # story (variable tokens per image) — require the batch
                # to fit, with exact image buckets
                truncated = any(
                    key in e and len(e["input_ids"]) > tgt
                    for e in examples)
                if pad_imgs > 0 or truncated:
                    raise ValueError(
                        f"image padding/truncation unsupported with "
                        f"'{key}' inputs; raise seq bucket or use exact "
                        f"image buckets")
                out[key] = np.concatenate(vals)
        if "class_labels" in examples[0]:
            out["class_labels"] = np.stack(
                [e["class_labels"] for e in examples])
        return out


# ---------------------------------------------------------------------------
# YAML config loader (reference: data.py:1901-1979)
# ---------------------------------------------------------------------------

FORMAT_CLASSES = {
    "chat": ChatDataset,
    "chat_video": ChatVideoDataset,
    "classification": ClassificationDataset,
    # resolved lazily below (classes defined later in this module):
    "qwen2_video_classification": None,
    "siglip_video": None,
}


def load_data_from_config(config_path: str, processor, conv: Conversation,
                          data_args: Optional[Dict] = None):
    """YAML -> (train DatasetCollection, val, test, Collator)."""
    import yaml

    with open(config_path) as f:
        cfg = yaml.safe_load(f)
    data_args = data_args or {}
    splits: Dict[str, List] = {"train": [], "val": [], "test": []}
    for entry in cfg.get("data", []):
        fmt = entry.get("format", "chat")
        if fmt not in FORMAT_CLASSES:
            raise KeyError(
                f"unknown data format {fmt!r}; expected one of "
                f"{sorted(FORMAT_CLASSES)}")
        # offline integrity pin (the reference's train_config_offline
        # per-entry offline_sha, ref data_configs/
        # train_config_offline.yaml): a filled sha256 must match the
        # local train.json byte-for-byte or loading refuses loudly
        sha = entry.get("offline_sha")
        if sha and os.path.exists(entry["path"]):
            import hashlib

            with open(entry["path"], "rb") as fh:
                got = hashlib.sha256(fh.read()).hexdigest()
            if got != sha:
                raise ValueError(
                    f"offline_sha mismatch for {entry['path']}: "
                    f"config pins {sha[:12]}..., file is "
                    f"{got[:12]}... — re-run the converter or update "
                    f"the pin")
        if fmt == "siglip_video":
            # different contract: (text, frames) contrastive pairs
            # (reference data.py:903-1136)
            ds = SiglipVideoDataset(
                entry["path"], processor.tokenizer,
                getattr(processor, "image_processor", processor),
                num_frames=entry.get("num_frames", 8))
            splits[entry.get("use_split", "train")
                   if entry.get("use_split") in splits
                   else "train"].append(ds)
            continue
        cls = (Qwen2VideoClassificationDataset
               if fmt == "qwen2_video_classification"
               else FORMAT_CLASSES[fmt])
        kwargs = dict(
            data_path=entry["path"],
            name=entry.get("name"),
            split=entry.get("split", "train"),
            processor=processor,
            conv=conv,
            max_seq_len=data_args.get("max_seq_len", 8192),
            max_num_images=entry.get("max_num_images"),
            max_size=entry.get("max_size"),
            sample_ratio=entry.get("sample_ratio"),
            shuffle=entry.get("shuffle", False),
            image_dir=entry.get("image_dir"),
            max_image_size=data_args.get("max_image_size"),
            ensure_seq_len_multiple_of=data_args.get(
                "ensure_seq_len_multiple_of"),
        )
        if fmt == "chat_video":
            kwargs.update(num_frames=entry.get("num_frames", 8),
                          fps=entry.get("fps"),
                          max_num_frames=entry.get("max_num_frames", 16),
                          video_dir=entry.get("video_dir"),
                          use_video_encoder=entry.get(
                              "use_video_encoder", False),
                          num_video_tokens=entry.get(
                              "num_video_tokens", 64))
        elif fmt == "qwen2_video_classification":
            kwargs.update(num_frames=entry.get("num_frames", 8),
                          use_label_special_tokens=entry.get(
                              "use_label_special_tokens", False),
                          video_dir=entry.get("video_dir"))
        ds = cls(**kwargs)
        splits[entry.get("use_split", "train")
               if entry.get("use_split") in splits else
               ("train" if entry.get("split", "train") == "train"
                else "val")].append(ds)

    max_packed = data_args.get("max_self_attn_len")
    train: Any = DatasetCollection(splits["train"]) \
        if splits["train"] else None
    if train is not None and max_packed:
        train = PackingDataset(train, max_packed)
    val = DatasetCollection(splits["val"]) if splits["val"] else None
    test = DatasetCollection(splits["test"]) if splits["test"] else None

    collator = Collator(
        pad_token_id=processor.tokenizer.pad_token_id or 0,
        image_token_id=processor.image_token_index,
        num_image_tokens=processor.num_image_tokens,
        seq_buckets=data_args.get(
            "seq_buckets", (512, 1024, 2048, 4096, 8192)),
        image_buckets=data_args.get(
            "image_buckets", (0, 1, 2, 4, 8, 16, 32)),
        image_size=data_args.get("image_size", 336),
    )
    return train, val, test, collator


class DataLoader:
    """Minimal shuffling batch iterator (host-side).

    Replaces torch DataLoader; numpy batches go straight to device_put.
    """

    def __init__(self, dataset, collator, batch_size: int,
                 shuffle: bool = True, seed: int = 0,
                 drop_last: bool = True):
        self.dataset = dataset
        self.collator = collator
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return n

    def __iter__(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.RandomState(self.seed + self.epoch).shuffle(order)
        self.epoch += 1
        for i in range(0, len(order), self.batch_size):
            idxs = order[i:i + self.batch_size]
            if self.drop_last and len(idxs) < self.batch_size:
                return
            yield self.collator([self.dataset[int(j)] for j in idxs])


class PrefetchDataLoader(DataLoader):
    """DataLoader with a background worker pool preparing batches ahead
    (the role torch DataLoader's C++ workers play in the reference)."""

    def __init__(self, *args, num_workers: int = 4, prefetch: int = 4,
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.num_workers = num_workers
        self.prefetch = prefetch

    def __iter__(self):
        from concurrent.futures import ThreadPoolExecutor

        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.RandomState(self.seed + self.epoch).shuffle(order)
        self.epoch += 1
        batches = [order[i:i + self.batch_size]
                   for i in range(0, len(order), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        def build(idxs):
            return self.collator([self.dataset[int(j)] for j in idxs])

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            futures = []
            it = iter(batches)
            for _ in range(self.prefetch):
                try:
                    futures.append(pool.submit(build, next(it)))
                except StopIteration:
                    break
            while futures:
                fut = futures.pop(0)
                try:
                    futures.append(pool.submit(build, next(it)))
                except StopIteration:
                    pass
                yield fut.result()


class SiglipVideoDataset:
    """(text, frames) pairs for contrastive video training
    (reference: data.py:903-1136 + SiglipVideoCollator :1879-1899).

    Items: {"video": path, "text"|"caption": str}; frames sampled
    uniformly and max-length-padded text (contrastive training uses
    fixed-shape text batches)."""

    def __init__(self, data_path: str, tokenizer, image_processor,
                 num_frames: int = 8, max_text_len: int = 64,
                 video_dir: Optional[str] = None,
                 max_size: Optional[int] = None):
        self.data = _load_json_data(data_path)
        if max_size:
            self.data = self.data[:max_size]
        self.tokenizer = tokenizer
        self.image_processor = image_processor
        self.num_frames = num_frames
        self.max_text_len = max_text_len
        self.video_dir = video_dir or os.path.dirname(data_path)

    def __len__(self):
        return len(self.data)

    def _frames(self, path):
        import cv2

        if self.video_dir and not os.path.isabs(path):
            path = os.path.join(self.video_dir, path)
        cap = cv2.VideoCapture(path)
        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        idxs = np.linspace(0, max(total - 1, 0), self.num_frames
                           ).astype(int)
        frames = []
        for i in idxs:
            cap.set(cv2.CAP_PROP_POS_FRAMES, int(i))
            ok, fr = cap.read()
            if ok:
                frames.append(Image.fromarray(
                    cv2.cvtColor(fr, cv2.COLOR_BGR2RGB)))
        cap.release()
        while len(frames) < self.num_frames and frames:
            frames.append(frames[-1])
        return frames

    def __getitem__(self, idx):
        item = self.data[idx]
        text = item.get("text", item.get("caption", ""))
        enc = self.tokenizer(
            text, truncation=True, max_length=self.max_text_len,
            padding="max_length")
        frames = self._frames(item["video"]) if "video" in item else [
            load_image(p, self.video_dir) for p in item.get("images", [])]
        return {
            "input_ids": np.asarray(enc["input_ids"], np.int64),
            "frames": self.image_processor(frames),
        }


class Qwen2VideoClassificationDataset(ClassificationDataset):
    """Video classification with optional per-label special tokens
    <|LABEL_i|> appended to the prompt (reference: data.py:1328-1332);
    frames are decoded like ChatVideoDataset and fed as images."""

    def __init__(self, *args, num_frames: int = 8,
                 use_label_special_tokens: bool = False,
                 video_dir: Optional[str] = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.num_frames = num_frames
        self.use_label_special_tokens = use_label_special_tokens
        self.video_dir = video_dir or self.image_dir
        if use_label_special_tokens:
            specials = [f"<|LABEL_{i}|>"
                        for i in range(len(self.label_names))]
            self.processor.tokenizer.add_special_tokens(
                {"additional_special_tokens": specials})
            self.label_token_ids = [
                self.processor.tokenizer.convert_tokens_to_ids(s)
                for s in specials]

    def getitem(self, idx):
        return self.getitem_from_item(self.data[idx])

    def getitem_from_item(self, item):
        if "video" in item and "images" not in item:
            helper = ChatVideoDataset.__new__(ChatVideoDataset)
            helper.__dict__.update(self.__dict__)
            helper.fps = None
            helper.max_num_frames = self.num_frames
            frames = helper._read_video_frames(item["video"])
            item = dict(item, images=frames)
        out = super().getitem_from_item(item)
        if self.use_label_special_tokens:
            ids = out["input_ids"]
            extra = np.asarray(self.label_token_ids, np.int64)
            out["input_ids"] = np.concatenate([ids, extra])
            out["labels"] = np.concatenate(
                [out["labels"],
                 np.full(len(extra), IGNORE_INDEX, np.int64)])
            out["label_token_positions"] = np.arange(
                len(ids), len(ids) + len(extra))
        return out


class CrossAttnPackingDataset(PackingDataset):
    """Packing with a separate image-kv budget for gated cross-attn
    models (reference: data.py:1673-1876): segments share the packed
    self-attn sequence while their image tokens become encoder kv,
    capped at ``max_cross_attn_kv_len`` (num_tokens_per_image each).

    Emits additionally: encoder_pixel_count per pack; images exceeding
    the budget drop the whole conversation from the pack."""

    def __init__(self, dataset, max_self_attn_len: int = 8192,
                 max_cross_attn_kv_len: int = 8192,
                 num_tokens_per_image: int = 256,
                 packing_same_mm_media: bool = False):
        self.max_kv = max_cross_attn_kv_len
        self.tokens_per_image = num_tokens_per_image
        super().__init__(dataset, max_self_attn_len,
                         packing_same_mm_media=packing_same_mm_media)

    def __getitem__(self, idx):
        idxs = self._plan[idx]
        parts = [self.dataset[i] for i in idxs]
        keys = ([self.dataset.media_key(i) for i in idxs]
                if self.same_mm_media
                and hasattr(self.dataset, "media_key")
                else [None] * len(idxs))
        ids, labels, seg, pos, pix = [], [], [], [], []
        total = kv_used = 0
        seen_media = set()
        for s_idx, (p, mkey) in enumerate(zip(parts, keys), start=1):
            n_img = p.get("pixel_values", np.zeros((0,))).shape[0]
            shared = (self.same_mm_media and mkey is not None
                      and mkey != () and mkey in seen_media)
            # conversations over the SAME media share one image-kv
            # block (reference: data.py:1779-1781)
            kv_need = 0 if shared else n_img * self.tokens_per_image
            if kv_used + kv_need > self.max_kv:
                continue  # kv budget exhausted for this conversation
            n = len(p["input_ids"])
            if total + n > self.max_len:
                break
            ids.append(p["input_ids"][:n])
            labels.append(p["labels"][:n])
            seg.append(np.full(n, s_idx, np.int32))
            pos.append(np.arange(n, dtype=np.int32))
            if n_img and not shared:
                pix.append(p["pixel_values"])
            if mkey is not None:
                seen_media.add(mkey)
            kv_used += kv_need
            total += n
        out = {
            "input_ids": np.concatenate(ids),
            "labels": np.concatenate(labels),
            "segment_ids": np.concatenate(seg),
            "positions": np.concatenate(pos),
        }
        if pix:
            out["pixel_values"] = np.concatenate(pix)
        return out


# late registration: defined below FORMAT_CLASSES
FORMAT_CLASSES["qwen2_video_classification"] = \
    Qwen2VideoClassificationDataset
FORMAT_CLASSES["siglip_video"] = SiglipVideoDataset


class DistributedDataLoader(DataLoader):
    """Multi-host input sharding (the v5p-8+ SFT configuration).

    Replaces the reference's torchrun DistributedSampler: every process
    draws the SAME seeded epoch permutation, takes its
    ``process_index``-strided row shard, and yields LOCAL batches of
    ``global_batch_size / process_count`` rows.  ``globalize`` turns a
    local numpy batch into jax global arrays over a mesh via
    ``jax.make_array_from_process_local_data`` so the pjit train step
    sees one logical batch.
    """

    def __init__(self, dataset, collator, global_batch_size: int,
                 process_index: Optional[int] = None,
                 process_count: Optional[int] = None,
                 shuffle: bool = True, seed: int = 0,
                 drop_last: bool = True):
        import jax

        pi = (jax.process_index() if process_index is None
              else process_index)
        pc = (jax.process_count() if process_count is None
              else process_count)
        assert global_batch_size % pc == 0, (global_batch_size, pc)
        super().__init__(dataset, collator, global_batch_size // pc,
                         shuffle=shuffle, seed=seed, drop_last=drop_last)
        self.process_index = pi
        self.process_count = pc
        self.global_batch_size = global_batch_size

    def __len__(self):
        shard = len(self.dataset) // self.process_count
        n = shard // self.batch_size
        if not self.drop_last and shard % self.batch_size:
            n += 1
        return n

    def __iter__(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            # identical permutation on every host (same seed+epoch)
            np.random.RandomState(self.seed + self.epoch).shuffle(order)
        self.epoch += 1
        shard = order[self.process_index::self.process_count]
        for i in range(0, len(shard), self.batch_size):
            idxs = shard[i:i + self.batch_size]
            if self.drop_last and len(idxs) < self.batch_size:
                return
            yield self.collator([self.dataset[int(j)] for j in idxs])

    def globalize(self, batch, mesh, batch_axes=("data", "fsdp")):
        """Local numpy batch -> global jax arrays sharded over mesh."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec

        axes = tuple(a for a in batch_axes if mesh.shape.get(a, 1) > 1)
        row_spec = PartitionSpec(axes if axes else None)
        out = {}
        for k, v in batch.items():
            if v.ndim >= 2 and v.shape[0] == self.batch_size:
                sh = NamedSharding(mesh, row_spec)
                out[k] = jax.make_array_from_process_local_data(sh, v)
            else:
                out[k] = jax.device_put(
                    v, NamedSharding(mesh, PartitionSpec()))
        return out
