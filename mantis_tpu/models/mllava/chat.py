"""Chat API for MLlava — the TPU equivalent of ``chat_mllava``
(reference: mantis/models/mllava/utils.py:10-97).

``MantisLlava`` bundles config + params + processor behind an OO shell
over the functional core, giving users the same workflow as the
reference's ``run_mantis.py`` example:

    model = MantisLlava.from_pretrained("/path/to/Mantis-8B-siglip-llama3")
    text, history = model.chat("Describe <image> and <image>.", images)
"""

from __future__ import annotations

from typing import List, Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np
from PIL import Image

from mantis_tpu.generation.sampler import GenerationConfig, generate
from mantis_tpu.models.configs import LlavaConfig
from mantis_tpu.models.conversation import conv_mllava_v1, conv_templates
from mantis_tpu.models.mllava import model as mllava_model
from mantis_tpu.generation.speculative import speculative_generate_fused
from mantis_tpu.models.mllava.processor import MLlavaProcessor


class MantisLlava:
    def __init__(self, cfg: LlavaConfig, params, processor: MLlavaProcessor,
                 model_name: str = "", cache_dtype=jnp.bfloat16):
        self.cfg = cfg
        self.params = params
        self.processor = processor
        self.model_name = model_name
        self.cache_dtype = cache_dtype
        # >0: greedy decode drafts this many tokens per verify pass via
        # prompt-lookup speculative decoding (generation/speculative.py;
        # token-identical output, data-dependent speedup)
        self.speculative = 0

    @classmethod
    def from_pretrained(cls, path: str, dtype=jnp.bfloat16,
                        quantize=None):
        """quantize: None, "int8"/"int4" (or 8/4) — weight-only
        quantization of the LM at load time.  int8 + an int8 KV cache
        is the measured single-v5e serving config (docs/PERF.md): an
        8B bf16 checkpoint does not fit the 16 GB chip."""
        from mantis_tpu.io.hf_loader import load_llava

        bits = {None: None, "int8": 8, "int4": 4, 8: 8, 4: 4}[quantize]
        cfg, params = load_llava(path, dtype=dtype, quantize_bits=bits)
        processor = MLlavaProcessor.from_pretrained(
            path, num_image_tokens=cfg.num_image_tokens,
            tower_type=cfg.vision_config.tower_type,
            image_size=cfg.vision_config.image_size)
        cache_dtype = jnp.int8 if bits else jnp.bfloat16
        return cls(cfg, params, processor, model_name=path,
                   cache_dtype=cache_dtype)

    # ------------------------------------------------------------------
    def pick_conversation(self):
        """llama-3 template when the LM is LLaMA-3, else mllava_v1
        (reference: utils.py:33-42).  Matches BOTH spellings: the
        flagship checkpoint is named "Mantis-8B-siglip-llama3" (no
        hyphen) while the reference checks the LM path
        "Meta-Llama-3-..." — missing it would feed a LLaMA-3 model the
        USER:/ASSISTANT: template with no <|eot_id|> terminator."""
        name = self.model_name.lower()
        if "llama-3" in name or "llama3" in name:
            conv = conv_templates["llama_3"]
            terminators = [self.processor.tokenizer.eos_token_id,
                           self.processor.tokenizer.convert_tokens_to_ids(
                               "<|eot_id|>")]
        else:
            conv = conv_mllava_v1
            terminators = [self.processor.tokenizer.eos_token_id]
        terminators = tuple(t for t in terminators if t is not None)
        return conv.copy(), terminators

    def generate(self, prompt: str, images, gen_cfg: GenerationConfig,
                 max_input_length: Optional[int] = None) -> str:
        inputs = self.processor(
            prompt, images, truncation=True, max_length=max_input_length)
        if self.speculative > 0 and not gen_cfg.do_sample \
                and np.asarray(inputs["input_ids"]).shape[0] == 1:
            out, _ = speculative_generate_fused(
                self.params, self.cfg, mllava_model.forward,
                inputs["input_ids"], inputs.get("pixel_values"),
                gen_cfg=gen_cfg, cache_dtype=self.cache_dtype,
                n_draft=self.speculative)
            out = np.asarray([out])
        else:
            out = generate(
                self.params, self.cfg, mllava_model.forward,
                inputs["input_ids"], inputs.get("pixel_values"),
                inputs["attention_mask"], gen_cfg,
                cache_dtype=self.cache_dtype)
        ids = out[0]
        eos_set = set(gen_cfg.eos_token_ids)
        stop = len(ids)
        for i, t in enumerate(ids):
            if int(t) in eos_set:
                stop = i
                break
        return self.processor.decode(ids[:stop], skip_special_tokens=True)

    def chat(
        self,
        text: str,
        images: Optional[List[Union[Image.Image, str]]] = None,
        history: Optional[List[dict]] = None,
        max_input_length: Optional[int] = None,
        **gen_kwargs,
    ) -> Tuple[str, List[dict]]:
        """Multi-turn chat matching the reference protocol
        (utils.py:44-97): history is a list of {role, text} dicts."""
        conv, terminators = self.pick_conversation()
        conv.messages = []
        if history is not None:
            for message in history:
                assert message["role"] in conv.roles
                conv.append_message(message["role"], message["text"])
            if text:
                assert conv.messages[-1][0] == conv.roles[1], (
                    "The last message in the history should be the "
                    "assistant if text is given")
                conv.append_message(conv.roles[0], text)
                conv.append_message(conv.roles[1], "")
                history.append({"role": conv.roles[0], "text": text})
                history.append({"role": conv.roles[1], "text": ""})
        else:
            history = [
                {"role": conv.roles[0], "text": text},
                {"role": conv.roles[1], "text": ""},
            ]
            conv.append_message(conv.roles[0], text)
            conv.append_message(conv.roles[1], "")

        prompt = conv.get_prompt()
        if images:
            images = [Image.open(im).convert("RGB") if isinstance(im, str)
                      else im for im in images]

        gen_cfg = GenerationConfig(
            max_new_tokens=gen_kwargs.pop("max_new_tokens", 1024),
            do_sample=gen_kwargs.pop("do_sample", False),
            temperature=gen_kwargs.pop("temperature", 1.0),
            top_p=gen_kwargs.pop("top_p", 1.0),
            top_k=gen_kwargs.pop("top_k", 0),
            eos_token_ids=terminators,
            pad_token_id=self.processor.tokenizer.pad_token_id or 0,
        )
        generated = self.generate(prompt, images, gen_cfg, max_input_length)
        history[-1]["text"] = generated
        return generated, history

    def chat_stream(
        self,
        text: str,
        images: Optional[List[Union[Image.Image, str]]] = None,
        history: Optional[List[dict]] = None,
        max_input_length: Optional[int] = None,
        **gen_kwargs,
    ):
        """Streaming chat: yields incremental text.  ``history`` is
        updated IN PLACE as the stream progresses — the reference's
        multi-turn contract (utils.py:100-186): after the generator is
        consumed, history carries both the user turn and the full
        assistant reply, ready for the next turn."""
        from mantis_tpu.generation.sampler import generate_stream

        conv, terminators = self.pick_conversation()
        conv.messages = []
        if history is None:
            history = []
        for message in history:
            conv.append_message(message["role"], message["text"])
        conv.append_message(conv.roles[0], text)
        conv.append_message(conv.roles[1], "")
        history.append({"role": conv.roles[0], "text": text})
        reply_entry = {"role": conv.roles[1], "text": ""}
        history.append(reply_entry)
        prompt = conv.get_prompt()
        if images:
            images = [Image.open(im).convert("RGB") if isinstance(im, str)
                      else im for im in images]
        inputs = self.processor(prompt, images, truncation=True,
                                max_length=max_input_length)
        gen_cfg = GenerationConfig(
            max_new_tokens=gen_kwargs.pop("max_new_tokens", 1024),
            do_sample=gen_kwargs.pop("do_sample", False),
            temperature=gen_kwargs.pop("temperature", 1.0),
            top_p=gen_kwargs.pop("top_p", 1.0),
            top_k=gen_kwargs.pop("top_k", 0),
            eos_token_ids=terminators,
            pad_token_id=self.processor.tokenizer.pad_token_id or 0,
        )
        ids: List[int] = []
        prev = ""
        for tok in generate_stream(
                self.params, self.cfg, mllava_model.forward,
                inputs["input_ids"], inputs.get("pixel_values"),
                inputs["attention_mask"], gen_cfg,
                cache_dtype=self.cache_dtype):
            ids.append(tok)
            full = self.processor.decode(ids, skip_special_tokens=True)
            reply_entry["text"] = full
            if len(full) > len(prev):
                yield full[len(prev):]
                prev = full


def chat_mllava(text, images, model: MantisLlava, processor=None,
                max_input_length=None, history=None, **kwargs):
    """Functional alias mirroring the reference signature (utils.py:10)."""
    return model.chat(text, images, history=history,
                      max_input_length=max_input_length, **kwargs)
