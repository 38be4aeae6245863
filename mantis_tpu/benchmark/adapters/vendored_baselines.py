"""Eval adapters for the reference's vendored / remote-code baselines.

The reference ships six wrapper families that cannot load from plain
``transformers`` classes (reference: mantis/mllm_tools/__init__.py:4-60):

- cogvlm, qwen-vl(v1), minicpmv, emu2 — hub checkpoints that require
  ``trust_remote_code=True`` (the modeling code lives in the checkpoint
  repo, not in transformers);
- vila — requires the external VILA fork of the ``llava`` package
  (reference: mllm_tools/vila_eval.py:1-17 documents a dedicated conda
  env for it);
- otter image/video — requires ``OtterForConditionalGeneration``, which
  the reference VENDORS wholesale (~12.8K LoC under
  mllm_tools/model_utils/otter/) because it exists in no package;
- otterhd — a plain Fuyu checkpoint (model_utils/otter/otterhd.py:36
  loads ``FuyuForCausalLM``), so THIS one is fully loadable from stock
  transformers.

These are torch comparison baselines, not part of the TPU framework.
Each adapter reproduces the reference wrapper's exact prompt protocol
and output parsing, with the heavyweight model/tokenizer INJECTABLE so
the protocol logic is testable offline (this environment has no hub
egress and cannot execute remote code); ``from_pretrained`` documents
the real load path and fails with a clear message when the dependency
is unavailable.
"""

from __future__ import annotations

from typing import List

from PIL import Image

from mantis_tpu.benchmark.adapters import merge_images
from mantis_tpu.benchmark.adapters.chat_models import (
    expand_video_messages)


def _as_pil(image) -> Image.Image:
    if isinstance(image, str):
        return Image.open(image).convert("RGB")
    return image.convert("RGB")


def _split(messages: List[dict]):
    images = [_as_pil(m["content"]) for m in messages
              if m["type"] == "image"]
    text = "\n".join(m["content"] for m in messages
                     if m["type"] == "text")
    return images, text


class CogVLM:
    """reference: mllm_tools/cogvlm_eval.py — single-image (multi-image
    prompts merge horizontally); prompts go through the checkpoint's
    ``model.build_conversation_input_ids`` chat mode and a greedy
    generate with no_repeat_ngram_size=3."""

    support_multi_image = False

    def __init__(self, model_path: str = "THUDM/cogvlm-chat-hf",
                 model=None, tokenizer=None):
        if model is None:
            import torch
            import transformers

            # the reference pairs the cogvlm checkpoint with the
            # vicuna-7b tokenizer (cogvlm_eval.py:19-25)
            tokenizer = transformers.LlamaTokenizer.from_pretrained(
                "lmsys/vicuna-7b-v1.5")
            model = transformers.AutoModelForCausalLM.from_pretrained(
                model_path, torch_dtype=torch.bfloat16,
                trust_remote_code=True).eval()
        self.model = model
        self.tokenizer = tokenizer

    def __call__(self, messages: List[dict]) -> str:
        import torch

        messages = expand_video_messages(
            messages, getattr(self, "video_num_frames", 8))
        images, text = _split(messages)
        image = merge_images(images) if images else None
        feats = self.model.build_conversation_input_ids(
            self.tokenizer, query=text, history=[],
            images=[image] if image is not None else [])
        inputs = {
            "input_ids": feats["input_ids"].unsqueeze(0),
            "token_type_ids": feats["token_type_ids"].unsqueeze(0),
            "attention_mask": feats["attention_mask"].unsqueeze(0),
            "images": [[feats["images"][0]]] if image is not None
            else None,
        }
        with torch.no_grad():
            out = self.model.generate(
                **inputs, max_length=2048, do_sample=False,
                no_repeat_ngram_size=3, early_stopping=True)
        out = out[:, inputs["input_ids"].shape[1]:]
        return self.tokenizer.decode(
            out[0], skip_special_tokens=True).strip()


class QwenVL:
    """reference: mllm_tools/qwenVL_eval.py — Qwen-VL-Chat v1
    (remote-code); single-image merge, ``tokenizer.from_list_format``
    picture-tag prompt + the checkpoint's ``model.chat`` API.  PIL
    images are spooled to temp files because from_list_format takes
    paths only (qwenVL_eval.py:52-66)."""

    support_multi_image = False

    def __init__(self, model_path: str = "Qwen/Qwen-VL-Chat",
                 model=None, tokenizer=None):
        if model is None:
            import transformers

            tokenizer = transformers.AutoTokenizer.from_pretrained(
                model_path, trust_remote_code=True)
            model = transformers.AutoModelForCausalLM.from_pretrained(
                model_path, trust_remote_code=True).eval()
        self.model = model
        self.tokenizer = tokenizer
        self._tmp_files = []

    def __call__(self, messages: List[dict]) -> str:
        import tempfile

        messages = expand_video_messages(
            messages, getattr(self, "video_num_frames", 8))
        images, text = _split(messages)
        # one {'image': path} entry PER image, then the '\n'-joined
        # text — the reference does NOT merge inside the wrapper
        # (qwenVL_eval.py:48-67; the eval driver merges beforehand
        # because support_multi_image=False)
        entries = []
        for im in images:
            f = tempfile.NamedTemporaryFile(suffix=".jpg", delete=False)
            f.close()
            im.save(f.name)
            self._tmp_files.append(f.name)
            entries.append({"image": f.name})
        entries.append({"text": text})
        query = self.tokenizer.from_list_format(entries)
        response, _history = self.model.chat(
            self.tokenizer, query=query, history=None)
        return response.strip()

    def __del__(self):
        import os

        for f in getattr(self, "_tmp_files", []):
            if os.path.exists(f):
                os.remove(f)


class MiniCPMV:
    """reference: mllm_tools/minicpmv_eval.py — multi-image; the
    checkpoint's ``model.chat`` consumes one user turn whose content is
    an interleaved list of PIL images and strings, sampling=False
    (beam search by the checkpoint's default)."""

    support_multi_image = True

    def __init__(self,
                 model_path: str = "openbmb/MiniCPM-Llama3-V-2_5",
                 model=None, tokenizer=None):
        if model is None:
            import torch
            import transformers

            tokenizer = transformers.AutoTokenizer.from_pretrained(
                model_path, trust_remote_code=True)
            model = transformers.AutoModel.from_pretrained(
                model_path, trust_remote_code=True,
                torch_dtype=torch.float16).eval()
        self.model = model
        self.tokenizer = tokenizer

    def __call__(self, messages: List[dict]) -> str:
        messages = expand_video_messages(
            messages, getattr(self, "video_num_frames", 8))
        content = [_as_pil(m["content"]) if m["type"] == "image"
                   else m["content"] for m in messages]
        chat = [{"role": "user", "content": content}]
        res = self.model.chat(image=None, msgs=chat,
                              tokenizer=self.tokenizer, sampling=False)
        return res.strip() if isinstance(res, str) else res


class Emu2:
    """reference: mllm_tools/emu2_eval.py — multi-image; ``[<IMG_PLH>]``
    placeholder per image in the query, the checkpoint's
    ``model.build_input_ids`` packs text+images, greedy generate with
    max_new_tokens=64 and length_penalty=-1 (emu2_eval.py:61-81)."""

    support_multi_image = True

    def __init__(self, model_path: str = "BAAI/Emu2-Chat",
                 model=None, tokenizer=None):
        if model is None:
            import transformers

            tokenizer = transformers.AutoTokenizer.from_pretrained(
                model_path)
            model = transformers.AutoModelForCausalLM.from_pretrained(
                model_path, trust_remote_code=True).eval()
        self.model = model
        self.tokenizer = tokenizer

    def __call__(self, messages: List[dict]) -> str:
        import torch

        messages = expand_video_messages(
            messages, getattr(self, "video_num_frames", 8))
        images, query = [], ""
        for m in messages:
            if m["type"] == "image":
                images.append(_as_pil(m["content"]))
                query += "[<IMG_PLH>]"
            else:
                query += "\n" + m["content"]
        inputs = self.model.build_input_ids(
            text=[query], tokenizer=self.tokenizer, image=images)
        with torch.no_grad():
            out = self.model.generate(
                input_ids=inputs["input_ids"],
                attention_mask=inputs["attention_mask"],
                image=inputs["image"].to(torch.float16),
                max_new_tokens=64, length_penalty=-1)
        return self.tokenizer.batch_decode(
            out, skip_special_tokens=True,
            clean_up_tokenization_spaces=False)[0].strip()


# llava-package constants the VILA wrapper substitutes with
# (external llava/constants.py; values are stable public API)
_IMAGE_PLACEHOLDER = "<image-placeholder>"
_DEFAULT_IMAGE_TOKEN = "<image>"
_DEFAULT_IM_START_TOKEN = "<im_start>"
_DEFAULT_IM_END_TOKEN = "<im_end>"


def _vila_conv_mode(model_name: str) -> str:
    # reference vila_eval.py:55-65
    name = model_name.lower()
    if "llama-2" in name:
        return "llava_llama_2"
    if "llama-3" in name:
        return "llama_3"
    if "v1" in name:
        return "llava_v1"
    if "mpt" in name:
        return "mpt"
    return "llava_v0"


class VILA:
    """reference: mllm_tools/vila_eval.py — requires the external VILA
    fork of the ``llava`` package (the reference documents a dedicated
    conda env, vila_eval.py:1-17).  The wrapper-side prompt protocol is
    replicated byte-for-byte here (vila_eval.py:88-115): one
    ``<image-placeholder> `` per image concatenated with the raw text,
    re.sub'd to ``<image>`` (or ``<im_start><image><im_end>`` when the
    checkpoint sets mm_use_im_start_end), auto-prepended when no tag is
    present, then rendered through the conv template picked from the
    model name (vila_eval.py:55-66) with an empty assistant turn.  The
    llava-side model machinery is injectable as ``backend`` (an object
    with ``generate(prompt, images) -> str`` and optionally
    ``mm_use_im_start_end``); the final reply is stripped at the
    template's stop string exactly like vila_eval.py:120-145."""

    support_multi_image = True

    def __init__(self,
                 model_path: str =
                 "Efficient-Large-Model/Llama-3-VILA1.5-8b",
                 backend=None):
        if backend is None:
            raise ImportError(
                "VILA needs the external VILA fork of the 'llava' "
                "package (the reference documents a dedicated conda "
                "env for it, mllm_tools/vila_eval.py:1-17); build its "
                "load_pretrained_model/process_images/generate stack "
                "there and inject it as backend= (an object with "
                "generate(prompt, images) -> str).")
        self.backend = backend
        self.model_name = model_path.rstrip("/").split("/")[-1]
        self.conv_mode = _vila_conv_mode(self.model_name)

    def build_prompt(self, messages: List[dict]):
        """vila_eval.py:90-115 verbatim logic -> (prompt, stop_str)."""
        import re

        from mantis_tpu.models.conversation import (
            SeparatorStyle, conv_templates)

        images, text_prompt = [], ""
        for m in messages:
            if m["type"] == "image":
                images.append(_as_pil(m["content"]))
                text_prompt += f"{_IMAGE_PLACEHOLDER} "
            else:
                text_prompt += m["content"]
        use_se = bool(getattr(self.backend, "mm_use_im_start_end",
                              False))
        image_token_se = (_DEFAULT_IM_START_TOKEN
                          + _DEFAULT_IMAGE_TOKEN
                          + _DEFAULT_IM_END_TOKEN)
        if _IMAGE_PLACEHOLDER in text_prompt:
            text_prompt = re.sub(
                _IMAGE_PLACEHOLDER,
                image_token_se if use_se else _DEFAULT_IMAGE_TOKEN,
                text_prompt)
        elif _DEFAULT_IMAGE_TOKEN not in text_prompt:
            tag = image_token_se if use_se else _DEFAULT_IMAGE_TOKEN
            text_prompt = (tag + "\n") * len(images) + text_prompt
        conv = conv_templates[self.conv_mode].copy()
        conv.append_message(conv.roles[0], text_prompt)
        conv.append_message(conv.roles[1], None)
        stop = (conv.sep if conv.sep_style != SeparatorStyle.TWO
                else conv.sep2)
        return conv.get_prompt(), images, stop

    def __call__(self, messages: List[dict]) -> str:
        messages = expand_video_messages(
            messages, getattr(self, "video_num_frames", 8))
        prompt, images, stop_str = self.build_prompt(messages)
        out = self.backend.generate(prompt, images).strip()
        if stop_str and out.endswith(stop_str):
            out = out[: -len(stop_str)]
        return out.strip()


def _otter_prompt(question: str) -> str:
    # reference: model_utils/otter/otter_image.py:26-27
    return f"<image>User: {question} GPT:<answer>"


def _otter_parse(decoded: str) -> str:
    # reference: model_utils/otter/otter_image.py:83 — everything after
    # the last <answer>, cut at <|endofchunk|>
    return (decoded.split("<answer>")[-1]
            .split("<|endofchunk|>")[0].strip().strip('"'))


class OtterImage:
    """reference: mllm_tools/otterimage_eval.py + the vendored
    model_utils/otter/otter_image.py — Flamingo-style
    ``generate(vision_x, lang_x)`` with the ``<image>User: ...
    GPT:<answer>`` prompt, beam-3, no_repeat_ngram_size=3.  The model
    class (OtterForConditionalGeneration) exists in no package — the
    reference vendors ~12.8K LoC for it — so here the loaded model is
    injectable; single-image (merge)."""

    support_multi_image = False
    frames_axis = False  # OtterVideo stacks frames on the T axis

    def __init__(self, model_path: str = "luodian/OTTER-Image-MPT7B",
                 model=None, tokenizer=None, image_processor=None):
        if model is None:
            raise ImportError(
                "OtterForConditionalGeneration is not packaged "
                "anywhere (the reference vendors its whole tree, "
                "mllm_tools/model_utils/otter/); load it yourself and "
                "pass model=/tokenizer=/image_processor=.")
        self.model = model
        self.tokenizer = tokenizer
        self.image_processor = image_processor

    def _vision_x(self, images: List[Image.Image]):
        px = self.image_processor.preprocess(
            images, return_tensors="pt")["pixel_values"]
        # [B=1, N=1, T, C, H, W]: images batch on N, video frames on T
        return (px.unsqueeze(0).unsqueeze(0) if self.frames_axis
                else px.unsqueeze(1).unsqueeze(0))

    def __call__(self, messages: List[dict]) -> str:
        import torch

        messages = expand_video_messages(
            messages, getattr(self, "video_num_frames", 16))
        images, text = _split(messages)
        if self.frames_axis:
            vision = images or [Image.new("RGB", (224, 224))]
        else:
            vision = [merge_images(images)] if images else \
                [Image.new("RGB", (224, 224))]
        vision_x = self._vision_x(vision)
        lang_x = self.tokenizer([_otter_prompt(text)],
                                return_tensors="pt")
        bad = self.tokenizer(["User:", "GPT1:", "GFT:", "GPT:"],
                             add_special_tokens=False).input_ids
        with torch.no_grad():
            out = self.model.generate(
                vision_x=vision_x, lang_x=lang_x["input_ids"],
                attention_mask=lang_x["attention_mask"],
                max_new_tokens=512, num_beams=3,
                no_repeat_ngram_size=3, bad_words_ids=bad,
                pad_token_id=self.tokenizer.eos_token_id)
        return _otter_parse(self.tokenizer.decode(out[0]))


class OtterVideo(OtterImage):
    """reference: mllm_tools/ottervideo_eval.py + vendored
    otter_video.py — same Flamingo generate, but frames stack on the
    temporal axis of vision_x ([1, 1, T, C, H, W]) instead of merging;
    video messages expand to 16 frames like the reference's
    extract_frames default."""

    frames_axis = True

    def __init__(self, model_path: str = "luodian/OTTER-Video-LLaMA7B-DenseCaption",  # noqa: E501
                 model=None, tokenizer=None, image_processor=None):
        super().__init__(model_path, model=model, tokenizer=tokenizer,
                         image_processor=image_processor)


class OtterHD:
    """reference: mllm_tools/otterhd_eval.py + vendored otterhd.py —
    OtterHD-8B is a plain Fuyu checkpoint (otterhd.py:36 loads
    FuyuForCausalLM), so unlike the other otter variants this adapter
    is fully loadable from stock transformers.  ``User: ...
    Assistant:`` prompt; the reply is the text after the \\x04
    beginning-of-answer marker."""

    support_multi_image = False

    def __init__(self, model_path: str = "Otter-AI/OtterHD-8B",
                 model=None, processor=None,
                 max_new_tokens: int = 256):
        if model is None:
            import transformers

            model = transformers.FuyuForCausalLM.from_pretrained(
                model_path).eval()
            processor = transformers.FuyuProcessor.from_pretrained(
                model_path)
        self.model = model
        self.processor = processor
        self.max_new_tokens = max_new_tokens

    def __call__(self, messages: List[dict]) -> str:
        import torch

        messages = expand_video_messages(
            messages, getattr(self, "video_num_frames", 8))
        images, text = _split(messages)
        image = merge_images(images) if images else \
            Image.new("RGB", (224, 224))
        inputs = self.processor(text=f"User: {text} Assistant:",
                                images=[image], return_tensors="pt")
        tok = getattr(self.processor, "tokenizer", self.processor)
        with torch.no_grad():
            out = self.model.generate(
                **inputs, max_new_tokens=self.max_new_tokens,
                pad_token_id=tok.eos_token_id)
        decoded = self.processor.batch_decode(
            out, skip_special_tokens=True)[0]
        # \x04 separates prompt from answer in Fuyu decoding
        return (decoded.split("\x04")[1] if "\x04" in decoded
                else decoded).strip()


VENDORED_BASELINES = {
    "cogvlm": CogVLM,
    "qwen-vl": QwenVL,
    "minicpmv": MiniCPMV,
    "emu2": Emu2,
    "vila": VILA,
    "otterimage": OtterImage,
    "ottervideo": OtterVideo,
    "otterhd": OtterHD,
}
