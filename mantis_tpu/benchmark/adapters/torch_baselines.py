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


TORCH_BASELINES = {
    "blip2": Blip2,
    "instructblip": InstructBlip,
    "kosmos2": Kosmos2,
    "llava-hf": LlavaHF,
}
