"""Third-party torch baseline adapters for the eval harness.

The reference vendors ~20 wrappers so external LMMs can run through the
same benchmark protocol (reference: mantis/mllm_tools/__init__.py:4-60,
blip2_eval.py / instructblip_eval.py / kosmos2_eval.py /
llava_eval.py ...).  These are comparison baselines, not part of the
TPU framework: they run the HF torch implementations (CPU or whatever
torch device is available) behind the same
``support_multi_image`` + ``__call__(messages) -> str`` protocol.
Checkpoints must be local directories (this environment has no hub
egress).
"""

from __future__ import annotations

from typing import List

from PIL import Image

from mantis_tpu.benchmark.adapters import merge_images
from mantis_tpu.benchmark.adapters.chat_models import (
    expand_video_messages)


def _split_messages(messages: List[dict]):
    images, texts = [], []
    for m in messages:
        if m["type"] == "image":
            im = m["content"]
            if isinstance(im, str):
                im = Image.open(im).convert("RGB")
            images.append(im)
        else:
            texts.append(m["content"])
    return images, " ".join(texts)


class TorchBaseline:
    """Common machinery: local from_pretrained + greedy generate
    (reference decode protocol: max_new_tokens=4096, num_beams=1)."""

    support_multi_image = False
    model_cls = None
    processor_cls = "AutoProcessor"

    def __init__(self, path: str = None, model=None, processor=None,
                 max_new_tokens: int = 4096):
        import transformers

        if model is not None:
            self.model = model
            self.processor = processor
        else:
            cls = getattr(transformers, self.model_cls)
            self.model = cls.from_pretrained(path).eval()
            self.processor = getattr(
                transformers, self.processor_cls).from_pretrained(path)
        self.max_new_tokens = max_new_tokens

    def build_inputs(self, image, text):
        return self.processor(images=image, text=text,
                              return_tensors="pt")

    def __call__(self, messages: List[dict]) -> str:
        import torch

        messages = expand_video_messages(
            messages, getattr(self, "video_num_frames", 8))

        images, text = _split_messages(messages)
        image = merge_images(images) if images else None
        inputs = self.build_inputs(image, text)
        inputs.pop("token_type_ids", None)  # debug tokenizers emit it
        with torch.no_grad():
            out = self.model.generate(
                **inputs, max_new_tokens=self.max_new_tokens,
                num_beams=1, do_sample=False)
        prompt_len = inputs["input_ids"].shape[1] \
            if "input_ids" in inputs else 0
        tok = getattr(self.processor, "tokenizer", self.processor)
        return tok.decode(out[0][prompt_len:],
                          skip_special_tokens=True).strip()


class Blip2(TorchBaseline):
    """reference: mllm_tools/blip2_eval.py (single-image; multi-image
    prompts get horizontally merged)."""

    model_cls = "Blip2ForConditionalGeneration"


class InstructBlip(TorchBaseline):
    """reference: mllm_tools/instructblip_eval.py."""

    model_cls = "InstructBlipForConditionalGeneration"


class Kosmos2(TorchBaseline):
    """reference: mllm_tools/kosmos2_eval.py — <grounding> prefix and
    prompt-echo stripping."""

    model_cls = "Kosmos2ForConditionalGeneration"

    def build_inputs(self, image, text):
        return self.processor(images=image,
                              text=f"<grounding> {text}",
                              return_tensors="pt")

    def __call__(self, messages):
        import torch

        messages = expand_video_messages(
            messages, getattr(self, "video_num_frames", 8))

        images, text = _split_messages(messages)
        image = merge_images(images) if images else None
        inputs = self.build_inputs(image, text)
        with torch.no_grad():
            out = self.model.generate(
                **inputs, max_new_tokens=self.max_new_tokens,
                num_beams=1, do_sample=False)
        decoded = self.processor.batch_decode(
            out, skip_special_tokens=True)[0]
        cleaned, _ = self.processor.post_process_generation(decoded)
        prefix = text.strip()
        if cleaned.startswith(prefix):
            cleaned = cleaned[len(prefix):]
        return cleaned.strip()


class LlavaHF(TorchBaseline):
    """reference: mllm_tools/llava_eval.py — upstream HF llava baseline
    (vs our TPU-native mllava)."""

    model_cls = "LlavaForConditionalGeneration"
    support_multi_image = True

    def build_inputs(self, images, text):
        return self.processor(images=images, text=text,
                              return_tensors="pt")

    def __call__(self, messages):
        import torch

        messages = expand_video_messages(
            messages, getattr(self, "video_num_frames", 8))

        images, texts = [], []
        for m in messages:
            if m["type"] == "image":
                im = m["content"]
                if isinstance(im, str):
                    im = Image.open(im).convert("RGB")
                images.append(im)
                texts.append("<image>")
            else:
                texts.append(m["content"])
        prompt = "USER: " + "".join(texts) + " ASSISTANT:"
        inputs = self.build_inputs(images or None, prompt)
        inputs.pop("token_type_ids", None)
        with torch.no_grad():
            out = self.model.generate(
                **inputs, max_new_tokens=self.max_new_tokens,
                num_beams=1, do_sample=False)
        plen = inputs["input_ids"].shape[1]
        return self.processor.tokenizer.decode(
            out[0][plen:], skip_special_tokens=True).strip()


class LlavaNextHF(LlavaHF):
    """reference: mllm_tools/llava_eval.py (llava-next variant) —
    upstream HF LLaVA-NeXT anyres baseline."""

    model_cls = "LlavaNextForConditionalGeneration"


class VideoLlavaHF(LlavaHF):
    """reference: mllm_tools/videollava_eval.py — upstream HF
    Video-LLaVA baseline (frames arrive as image messages through the
    eval protocol; same USER/ASSISTANT prompt shape)."""

    model_cls = "VideoLlavaForConditionalGeneration"


class FuyuHF(TorchBaseline):
    """reference: mllm_tools/fuyu_eval.py — single-image Fuyu with the
    question + newline prompt."""

    model_cls = "FuyuForCausalLM"

    def build_inputs(self, image, text):
        return self.processor(images=image, text=text + "\n",
                              return_tensors="pt")


class IdeficsHF(TorchBaseline):
    """reference: mllm_tools/idefics_eval.py — Idefics-1 interleaved
    prompts (list of strings and PIL images)."""

    model_cls = "IdeficsForVisionText2Text"
    support_multi_image = True

    def __call__(self, messages):
        import torch

        messages = expand_video_messages(
            messages, getattr(self, "video_num_frames", 8))

        prompt = ["User:"]
        for m in messages:
            if m["type"] == "image":
                im = m["content"]
                if isinstance(im, str):
                    im = Image.open(im).convert("RGB")
                prompt.append(im)
            else:
                prompt.append(m["content"])
        prompt.append("<end_of_utterance>\nAssistant:")
        inputs = self.processor(text=[prompt], return_tensors="pt")
        bad = self.processor.tokenizer(
            ["<image>", "<fake_token_around_image>"],
            add_special_tokens=False).input_ids
        with torch.no_grad():
            out = self.model.generate(
                **inputs, max_new_tokens=self.max_new_tokens,
                num_beams=1, do_sample=False, bad_words_ids=bad)
        plen = inputs["input_ids"].shape[1]
        return self.processor.tokenizer.decode(
            out[0][plen:], skip_special_tokens=True).strip()


class Idefics2HF(TorchBaseline):
    """reference: mllm_tools/idefics2_eval.py — the torch counterpart
    of our TPU-native idefics2 adapter; User/Assistant turns with
    inline <image> markers."""

    model_cls = "Idefics2ForConditionalGeneration"
    support_multi_image = True
    user_prefix = "User:"
    assistant_prefix = "\nAssistant:"
    eou = "<end_of_utterance>"

    def __call__(self, messages):
        import torch

        messages = expand_video_messages(
            messages, getattr(self, "video_num_frames", 8))

        images, texts = [], []
        for m in messages:
            if m["type"] == "image":
                im = m["content"]
                if isinstance(im, str):
                    im = Image.open(im).convert("RGB")
                images.append(im)
                texts.append("<image>")
            else:
                texts.append(m["content"])
        prompt = (self.user_prefix + "".join(texts) + self.eou
                  + self.assistant_prefix)
        inputs = self.processor(images=images or None, text=prompt,
                                return_tensors="pt")
        inputs.pop("token_type_ids", None)
        with torch.no_grad():
            out = self.model.generate(
                **inputs, max_new_tokens=self.max_new_tokens,
                num_beams=1, do_sample=False)
        plen = inputs["input_ids"].shape[1]
        tok = getattr(self.processor, "tokenizer", self.processor)
        return tok.decode(out[0][plen:],
                          skip_special_tokens=True).strip()


class Idefics3HF(Idefics2HF):
    """reference: mllm_tools/idefics3_eval.py."""

    model_cls = "Idefics3ForConditionalGeneration"


class Qwen2VLHF(TorchBaseline):
    """reference: mllm_tools/qwen2_vl_eval.py — chatml turns with the
    vision_start/image_pad/vision_end placeholder run."""

    model_cls = "Qwen2VLForConditionalGeneration"
    support_multi_image = True

    def __call__(self, messages):
        import torch

        messages = expand_video_messages(
            messages, getattr(self, "video_num_frames", 8))

        images, texts = [], []
        for m in messages:
            if m["type"] == "image":
                im = m["content"]
                if isinstance(im, str):
                    im = Image.open(im).convert("RGB")
                images.append(im)
                texts.append(
                    "<|vision_start|><|image_pad|><|vision_end|>")
            else:
                texts.append(m["content"])
        prompt = ("<|im_start|>user\n" + "".join(texts)
                  + "<|im_end|>\n<|im_start|>assistant\n")
        inputs = self.processor(images=images or None, text=prompt,
                                return_tensors="pt")
        with torch.no_grad():
            out = self.model.generate(
                **inputs, max_new_tokens=self.max_new_tokens,
                num_beams=1, do_sample=False)
        plen = inputs["input_ids"].shape[1]
        tok = getattr(self.processor, "tokenizer", self.processor)
        return tok.decode(out[0][plen:],
                          skip_special_tokens=True).strip()


class GPT4V:
    """reference: mllm_tools/gpt4v_eval.py — OpenAI multimodal API
    through the judge client (base64 image URLs).  Egress-gated; tests
    inject completion_fn."""

    support_multi_image = True

    def __init__(self, model_name: str = "gpt-4o",
                 completion_fn=None, max_new_tokens: int = 4096,
                 cache_dir=None):
        self.model_name = model_name
        self.completion_fn = completion_fn
        self.max_new_tokens = max_new_tokens
        self.cache_dir = cache_dir

    @staticmethod
    def _b64(image) -> str:
        import base64
        import io

        if isinstance(image, str):
            image = Image.open(image).convert("RGB")
        buf = io.BytesIO()
        image.save(buf, format="PNG")
        return ("data:image/png;base64,"
                + base64.b64encode(buf.getvalue()).decode())

    def __call__(self, messages: List[dict]) -> str:
        from mantis_tpu.judge.openai_utils import openai_completions

        messages = expand_video_messages(
            messages, getattr(self, "video_num_frames", 8))

        content = []
        for m in messages:
            if m["type"] == "image":
                content.append({"type": "image_url",
                                "image_url": {
                                    "url": self._b64(m["content"])}})
            else:
                content.append({"type": "text", "text": m["content"]})
        chat = [{"role": "user", "content": content}]
        res = openai_completions(
            [chat], model_name=self.model_name,
            completion_fn=self.completion_fn,
            max_tokens=self.max_new_tokens, cache_dir=self.cache_dir)
        return (res["completions"][0] or "").strip()


TORCH_BASELINES = {
    "blip2": Blip2,
    "instructblip": InstructBlip,
    "kosmos2": Kosmos2,
    "llava-hf": LlavaHF,
    "llava-next-hf": LlavaNextHF,
    "videollava-hf": VideoLlavaHF,
    "fuyu-hf": FuyuHF,
    "idefics1-hf": IdeficsHF,
    "idefics2-hf": Idefics2HF,
    "idefics3-hf": Idefics3HF,
    "qwen2-vl-hf": Qwen2VLHF,
}
