"""Model adapter registry for the eval harness.

Mirrors the reference's ``MLLM_Models(name)`` factory
(reference: mantis/mllm_tools/__init__.py:61-174) and its adapter
protocol: each adapter exposes ``support_multi_image`` and is called with
an interleaved message list ``[{"type": "image"|"text", "content": ...}]``
returning a string (reference: mllm_tools/mllava_eval.py:10-78).
"""

from __future__ import annotations

import random
from typing import Callable, Dict, List

_REGISTRY: Dict[str, Callable] = {}


def register_model(name: str):
    def deco(cls):
        _REGISTRY[name] = cls
        return cls
    return deco


def MLLM_Models(model_name: str):
    """Resolve an adapter class by name.

    - 'random' is handled by the driver itself.
    - 'mantis-tpu:<checkpoint_dir>' loads a local Mantis/LLaVA checkpoint
      through the TPU-native MantisLlava stack.
    - registered names resolve from the registry.
    """
    if model_name.startswith(("mantis-tpu:", "mllava:")):
        path = model_name.split(":", 1)[1]
        return lambda **kw: MantisTPUAdapter(path, **kw)
    if ":" in model_name:
        arch, path = model_name.split(":", 1)
        from mantis_tpu.benchmark.adapters.chat_models import (
            ARCH_CHAT_CLASSES)

        if arch in ARCH_CHAT_CLASSES:
            cls = ARCH_CHAT_CLASSES[arch]
            return lambda **kw: cls.from_pretrained(path, **kw)
        from mantis_tpu.benchmark.adapters.torch_baselines import (
            TORCH_BASELINES)

        if arch in TORCH_BASELINES:
            bcls = TORCH_BASELINES[arch]
            return lambda: bcls(path)
        from mantis_tpu.benchmark.adapters.vendored_baselines import (
            VENDORED_BASELINES)

        if arch in VENDORED_BASELINES:
            vcls = VENDORED_BASELINES[arch]
            return lambda: vcls(path)
    if model_name == "gpt4v" or model_name.startswith("gpt4v:"):
        # reference: mllm_tools/gpt4v_eval.py (egress-gated OpenAI API)
        from mantis_tpu.benchmark.adapters.torch_baselines import GPT4V

        gpt_model = (model_name.split(":", 1)[1]
                     if ":" in model_name else "gpt-4o")
        return lambda: GPT4V(model_name=gpt_model)
    if model_name in _REGISTRY:
        return _REGISTRY[model_name]
    from mantis_tpu.benchmark.adapters.vendored_baselines import (
        VENDORED_BASELINES)

    if model_name in VENDORED_BASELINES:
        # bare reference names (cogvlm, minicpmv, ...) use each
        # wrapper's default hub checkpoint, like the reference registry
        return VENDORED_BASELINES[model_name]
    if model_name == "qwenVL":  # reference spelling
        return VENDORED_BASELINES["qwen-vl"]
    from mantis_tpu.benchmark.adapters.chat_models import (
        ARCH_CHAT_CLASSES)

    raise KeyError(
        f"Unknown model {model_name!r}; registered: {sorted(_REGISTRY)}, "
        f"or '<arch>:<checkpoint_dir>' with arch in "
        f"{sorted(ARCH_CHAT_CLASSES) + ['mantis-tpu']}")


def merge_images(images):
    """Horizontally concatenate for single-image models
    (reference: mllm_tools/mllm_utils.py:26-61)."""
    from PIL import Image

    if len(images) == 1:
        return images[0]
    heights = [im.height for im in images]
    h = min(heights)
    scaled = [im.resize((int(im.width * h / im.height), h))
              for im in images]
    total_w = sum(im.width for im in scaled)
    out = Image.new("RGB", (total_w, h))
    x = 0
    for im in scaled:
        out.paste(im, (x, 0))
        x += im.width
    return out


class MantisTPUAdapter:
    """Eval adapter over the TPU-native MLlava stack.

    Decode config matches the reference protocol: greedy,
    max_new_tokens=4096, no sampling (mllm_tools/mllava_eval.py:51-55).
    """

    support_multi_image = True

    def __init__(self, checkpoint_dir: str, max_new_tokens: int = 4096,
                 model=None, quantize=None):
        if model is not None:
            self.model = model
        else:
            from mantis_tpu.models.mllava import MantisLlava

            self.model = MantisLlava.from_pretrained(
                checkpoint_dir, quantize=quantize)
        self.max_new_tokens = max_new_tokens

    def __call__(self, messages: List[dict]) -> str:
        from mantis_tpu.benchmark.adapters.chat_models import (
            expand_video_messages)

        messages = expand_video_messages(messages)
        text_parts = []
        images = []
        for m in messages:
            if m["type"] == "image":
                images.append(m["content"])
                text_parts.append("<image>")
            else:
                text_parts.append(m["content"])
        text = "".join(text_parts)
        generated, _ = self.model.chat(
            text, images or None, max_new_tokens=self.max_new_tokens,
            do_sample=False)
        return generated


@register_model("random")
class RandomAdapter:
    support_multi_image = True

    def __call__(self, messages):
        return ""
