"""Third-party torch baseline adapters (reference mllm_tools wrappers):
driven end-to-end over tiny in-memory HF models."""

import numpy as np
import pytest
import torch
import transformers
from PIL import Image

from mantis_tpu.benchmark.adapters.torch_baselines import Blip2, LlavaHF


def _imgs(n=2):
    rng = np.random.RandomState(0)
    return [Image.fromarray(rng.randint(0, 255, (48, 56, 3), np.uint8))
            for _ in range(n)]


def test_blip2_adapter_tiny():
    cfg = transformers.Blip2Config(
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=2,
                           image_size=224, patch_size=16),
        qformer_config=dict(hidden_size=32, intermediate_size=64,
                            num_hidden_layers=2, num_attention_heads=2,
                            encoder_hidden_size=32),
        text_config=dict(model_type="opt", vocab_size=128,
                         hidden_size=32, ffn_dim=64, num_hidden_layers=2,
                         num_attention_heads=2, word_embed_proj_dim=32,
                         max_position_embeddings=512),
        num_query_tokens=4)
    tok = _tiny_gpt2_tok()
    tok.add_special_tokens({"additional_special_tokens": ["<image>"]})
    cfg.image_token_id = tok.convert_tokens_to_ids("<image>")
    cfg.text_config.vocab_size = max(len(tok), 128)
    torch.manual_seed(0)
    model = transformers.Blip2ForConditionalGeneration(cfg).eval()
    ip = transformers.BlipImageProcessor(size={"height": 224,
                                               "width": 224})
    proc = transformers.Blip2Processor(ip, tok, num_query_tokens=4)
    adapter = Blip2(model=model, processor=proc, max_new_tokens=3)
    out = adapter([{"type": "image", "content": _imgs(2)[0]},
                   {"type": "text", "content": "what is this"}])
    assert isinstance(out, str)


def _tiny_gpt2_tok():
    # a minimal offline tokenizer compatible with AutoProcessor shims
    from mantis_tpu.utils.debug_tokenizer import build_tokenizer_from_texts

    return build_tokenizer_from_texts(["what is this a b c"])


def test_llava_hf_prompt_protocol():
    """LlavaHF builds the USER/ASSISTANT prompt with one <image> marker
    per image and strips the prompt from the decode (protocol-level test
    with stubs; the real-model path is covered by the blip2 test)."""
    import torch

    captured = {}

    class StubTok:
        def decode(self, ids, skip_special_tokens=True):
            return "stub answer"

    class StubProc:
        tokenizer = StubTok()

        def __call__(self, images=None, text=None, return_tensors=None):
            captured["text"] = text
            captured["n_images"] = len(images) if images else 0
            return {"input_ids": torch.ones((1, 5), dtype=torch.long)}

    class StubModel:
        def generate(self, **kw):
            return torch.ones((1, 8), dtype=torch.long)

    adapter = LlavaHF(model=StubModel(), processor=StubProc(),
                      max_new_tokens=3)
    out = adapter([
        {"type": "image", "content": _imgs(2)[0]},
        {"type": "text", "content": "compare with"},
        {"type": "image", "content": _imgs(2)[1]},
    ])
    assert out == "stub answer"
    assert captured["text"] == "USER: <image>compare with<image> ASSISTANT:"
    assert captured["n_images"] == 2


def test_registry_resolves_baseline_names():
    from mantis_tpu.benchmark.adapters import MLLM_Models

    factory = MLLM_Models("blip2:/nonexistent/path")
    assert callable(factory)
    with pytest.raises(Exception):
        factory()  # no checkpoint there — resolution itself worked


def _stub_pair(capture):
    import torch

    class StubTok:
        def decode(self, ids, skip_special_tokens=True):
            return "stub answer"

        def __call__(self, texts, add_special_tokens=True):
            class R:
                input_ids = [[7], [8]]
            return R()

    class StubProc:
        tokenizer = StubTok()

        def __call__(self, images=None, text=None, return_tensors=None):
            capture["text"] = text
            if isinstance(text, list):  # idefics1 interleaved prompts
                capture["n_images"] = sum(
                    not isinstance(x, str) for x in text[0])
            else:
                capture["n_images"] = len(images) if images else 0
            return {"input_ids": torch.ones((1, 5), dtype=torch.long)}

    class StubModel:
        def generate(self, **kw):
            return torch.ones((1, 8), dtype=torch.long)

    return StubModel(), StubProc()


def test_idefics2_hf_prompt_protocol():
    from mantis_tpu.benchmark.adapters.torch_baselines import Idefics2HF

    cap = {}
    model, proc = _stub_pair(cap)
    adapter = Idefics2HF(model=model, processor=proc, max_new_tokens=2)
    out = adapter([
        {"type": "image", "content": _imgs(1)[0]},
        {"type": "text", "content": "what?"},
    ])
    assert out == "stub answer"
    assert cap["text"] == ("User:<image>what?<end_of_utterance>"
                           "\nAssistant:")
    assert cap["n_images"] == 1


def test_qwen2_vl_hf_prompt_protocol():
    from mantis_tpu.benchmark.adapters.torch_baselines import Qwen2VLHF

    cap = {}
    model, proc = _stub_pair(cap)
    adapter = Qwen2VLHF(model=model, processor=proc, max_new_tokens=2)
    adapter([
        {"type": "image", "content": _imgs(1)[0]},
        {"type": "text", "content": "hi"},
    ])
    assert cap["text"] == (
        "<|im_start|>user\n<|vision_start|><|image_pad|>"
        "<|vision_end|>hi<|im_end|>\n<|im_start|>assistant\n")


def test_idefics1_hf_interleaved_prompt():
    from mantis_tpu.benchmark.adapters.torch_baselines import IdeficsHF

    cap = {}
    model, proc = _stub_pair(cap)
    adapter = IdeficsHF(model=model, processor=proc, max_new_tokens=2)
    adapter([
        {"type": "image", "content": _imgs(2)[0]},
        {"type": "text", "content": "a"},
        {"type": "image", "content": _imgs(2)[1]},
    ])
    assert cap["n_images"] == 2
    assert cap["text"][0][0] == "User:"
    assert cap["text"][0][-1] == "<end_of_utterance>\nAssistant:"


def test_gpt4v_offline_with_injected_completion(tmp_path):
    from mantis_tpu.benchmark.adapters.torch_baselines import GPT4V

    seen = {}

    def fake(messages, model_name, **kw):
        seen["content"] = messages[0]["content"]
        return {"text": " the answer ", "prompt_tokens": 0,
                "completion_tokens": 0}

    # unique cache dir: the judge client caches by prompt uid, and a
    # stale hit would skip the injected completion_fn entirely
    adapter = GPT4V(model_name="gpt-4o", completion_fn=fake,
                    cache_dir=str(tmp_path))
    out = adapter([
        {"type": "image", "content": _imgs(1)[0]},
        {"type": "text", "content": "describe"},
    ])
    assert out == "the answer"
    kinds = [c["type"] for c in seen["content"]]
    assert kinds == ["image_url", "text"]
    assert seen["content"][0]["image_url"]["url"].startswith(
        "data:image/png;base64,")


def test_registry_resolves_new_names():
    from mantis_tpu.benchmark.adapters import MLLM_Models

    for name in ("fuyu-hf", "idefics1-hf", "idefics2-hf", "idefics3-hf",
                 "llava-next-hf", "videollava-hf", "qwen2-vl-hf"):
        assert callable(MLLM_Models(f"{name}:/nonexistent"))
    assert callable(MLLM_Models("gpt4v"))
    assert callable(MLLM_Models("gpt4v:gpt-4o-mini"))


def test_video_messages_expand_on_torch_baselines():
    """`video` messages become uniformly sampled frames-as-images on
    every wrapper without a video tower (expand_video_messages at each
    __call__; code-review finding: they previously fell through to the
    text branch)."""
    from mantis_tpu.benchmark.adapters.chat_models import (
        expand_video_messages)

    clip = _imgs(5)
    out = expand_video_messages(
        [{"type": "video", "content": clip},
         {"type": "text", "content": "q"}], num_frames=3)
    assert [m["type"] for m in out] == ["image"] * 3 + ["text"]

    # end-to-end through a real wrapper
    cfg = transformers.Blip2Config(
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=2,
                           image_size=224, patch_size=16),
        qformer_config=dict(hidden_size=32, intermediate_size=64,
                            num_hidden_layers=2, num_attention_heads=2,
                            encoder_hidden_size=32),
        text_config=dict(model_type="opt", vocab_size=128,
                         hidden_size=32, ffn_dim=64, num_hidden_layers=2,
                         num_attention_heads=2, word_embed_proj_dim=32,
                         max_position_embeddings=512),
        num_query_tokens=4)
    tok = _tiny_gpt2_tok()
    tok.add_special_tokens({"additional_special_tokens": ["<image>"]})
    cfg.image_token_id = tok.convert_tokens_to_ids("<image>")
    cfg.text_config.vocab_size = max(len(tok), 128)
    torch.manual_seed(0)
    model = transformers.Blip2ForConditionalGeneration(cfg).eval()
    ip = transformers.BlipImageProcessor(size={"height": 224,
                                               "width": 224})
    proc = transformers.Blip2Processor(ip, tok, num_query_tokens=4)
    adapter = Blip2(model=model, processor=proc, max_new_tokens=2)
    out = adapter([{"type": "video", "content": _imgs(4)},
                   {"type": "text", "content": "what happens"}])
    assert isinstance(out, str)


# ---------------------------------------------------------------------------
# EXECUTED (not protocol-stubbed) drives of the stock-transformers
# baselines over tiny random-weight models: the real processor builds
# the inputs and the real HF model generates (reference wrappers:
# mllm_tools/llava_eval.py, instructblip_eval.py, kosmos2_eval.py).
# Upgrades VERDICT r3 §2.6 "protocol-tested only" for every baseline
# this offline environment can actually instantiate.
# ---------------------------------------------------------------------------

def _tiny_llama_text_cfg(tok):
    return dict(model_type="llama", vocab_size=max(len(tok), 128),
                hidden_size=32, intermediate_size=64,
                num_hidden_layers=2, num_attention_heads=2,
                num_key_value_heads=2)


def test_llava_hf_executed_tiny():
    from mantis_tpu.benchmark.adapters.torch_baselines import LlavaHF

    tok = _tiny_gpt2_tok()
    tok.add_special_tokens({"additional_special_tokens": ["<image>"]})
    cfg = transformers.LlavaConfig(
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=2,
                           image_size=32, patch_size=16),
        text_config=_tiny_llama_text_cfg(tok),
        image_token_index=tok.convert_tokens_to_ids("<image>"),
        vision_feature_layer=-1,
        vision_feature_select_strategy="default")
    torch.manual_seed(0)
    model = transformers.LlavaForConditionalGeneration(cfg).eval()
    ip = transformers.CLIPImageProcessor(
        size={"shortest_edge": 32}, crop_size={"height": 32, "width": 32})
    proc = transformers.LlavaProcessor(ip, tok, patch_size=16)
    adapter = LlavaHF(model=model, processor=proc, max_new_tokens=3)
    # multi-image: LlavaHF advertises support_multi_image
    out = adapter([{"type": "image", "content": _imgs(2)[0]},
                   {"type": "image", "content": _imgs(2)[1]},
                   {"type": "text", "content": "what is this"}])
    assert isinstance(out, str)


def test_llava_next_hf_executed_tiny():
    from mantis_tpu.benchmark.adapters.torch_baselines import LlavaNextHF

    tok = _tiny_gpt2_tok()
    tok.add_special_tokens({"additional_special_tokens": ["<image>"]})
    pinpoints = [[32, 32], [32, 64], [64, 32]]
    cfg = transformers.LlavaNextConfig(
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=2,
                           image_size=32, patch_size=16),
        text_config=_tiny_llama_text_cfg(tok),
        image_token_index=tok.convert_tokens_to_ids("<image>"),
        vision_feature_layer=-1,
        vision_feature_select_strategy="default",
        image_grid_pinpoints=pinpoints)
    torch.manual_seed(0)
    model = transformers.LlavaNextForConditionalGeneration(cfg).eval()
    ip = transformers.LlavaNextImageProcessor(
        size={"shortest_edge": 32}, crop_size={"height": 32, "width": 32},
        image_grid_pinpoints=pinpoints)
    proc = transformers.LlavaNextProcessor(ip, tok, patch_size=16)
    adapter = LlavaNextHF(model=model, processor=proc, max_new_tokens=3)
    out = adapter([{"type": "image", "content": _imgs(1)[0]},
                   {"type": "text", "content": "what is this"}])
    assert isinstance(out, str)


def test_instructblip_executed_tiny():
    from mantis_tpu.benchmark.adapters.torch_baselines import InstructBlip

    tok = _tiny_gpt2_tok()
    tok.add_special_tokens({"additional_special_tokens": ["<image>"]})
    cfg = transformers.InstructBlipConfig(
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=2,
                           image_size=32, patch_size=16),
        qformer_config=dict(hidden_size=32, intermediate_size=64,
                            num_hidden_layers=2, num_attention_heads=2,
                            encoder_hidden_size=32,
                            vocab_size=max(len(tok), 128)),
        text_config=dict(model_type="opt", vocab_size=max(len(tok), 128),
                         hidden_size=32, ffn_dim=64, num_hidden_layers=2,
                         num_attention_heads=2, word_embed_proj_dim=32,
                         max_position_embeddings=512),
        num_query_tokens=4)
    cfg.image_token_id = tok.convert_tokens_to_ids("<image>")
    torch.manual_seed(0)
    model = transformers.InstructBlipForConditionalGeneration(cfg).eval()
    ip = transformers.BlipImageProcessor(size={"height": 32, "width": 32})
    proc = transformers.InstructBlipProcessor(ip, tok, tok,
                                              num_query_tokens=4)
    adapter = InstructBlip(model=model, processor=proc, max_new_tokens=3)
    out = adapter([{"type": "image", "content": _imgs(1)[0]},
                   {"type": "text", "content": "what is this"}])
    assert isinstance(out, str)


def test_kosmos2_executed_tiny():
    """Kosmos-2 executes its full <grounding>-prefixed path including
    post_process_generation and the prompt-echo strip (reference:
    mllm_tools/kosmos2_eval.py)."""
    from mantis_tpu.benchmark.adapters.torch_baselines import Kosmos2

    tok = _tiny_gpt2_tok()
    tok.add_special_tokens({"additional_special_tokens": [
        "<image>", "</image>", "<grounding>"] +
        [f"<patch_index_{i:04d}>" for i in range(4)]})
    cfg = transformers.Kosmos2Config(
        text_config=dict(vocab_size=max(len(tok), 128), embed_dim=32,
                         ffn_dim=64, layers=2, attention_heads=2),
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=2,
                           image_size=32, patch_size=16),
        # the HF Kosmos2Processor always inserts 64 image-latent slots
        latent_query_num=64)
    torch.manual_seed(0)
    model = transformers.Kosmos2ForConditionalGeneration(cfg).eval()
    ip = transformers.CLIPImageProcessor(
        size={"shortest_edge": 32}, crop_size={"height": 32, "width": 32})
    proc = transformers.Kosmos2Processor(ip, tok, num_patch_index_tokens=4)
    adapter = Kosmos2(model=model, processor=proc, max_new_tokens=3)
    out = adapter([{"type": "image", "content": _imgs(1)[0]},
                   {"type": "text", "content": "what is this"}])
    assert isinstance(out, str)
    # the echo of the prompt text must have been stripped
    assert not out.startswith("what is this")
