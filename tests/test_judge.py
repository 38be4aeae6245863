"""Judge client + Mementos scoring tests (offline completion_fn)."""

import json

from mantis_tpu.benchmark.eval_on_mementos import (
    f1, parse_keywords, score_predictions)
from mantis_tpu.judge.openai_utils import (
    openai_completions, prompt_uid, to_chatml)


def fake_llm(messages, model_name, **kw):
    text = messages[0]["content"]
    if isinstance(text, list):
        text = " ".join(m.get("text", "") for m in text)
    # trivial "extraction": words after 'cat'/'runs' style cues
    behaviors = "runs" if "runs" in text else "sits"
    objects = "cat" if "cat" in text else "dog"
    return {"text": f"BEHAVIORS: {behaviors}\nOBJECTS: {objects}",
            "prompt_tokens": 10, "completion_tokens": 5}


def test_cache_and_batching(tmp_path):
    calls = []

    def counting_fn(messages, model_name, **kw):
        calls.append(1)
        return {"text": "ok", "prompt_tokens": 4, "completion_tokens": 2}

    out = openai_completions(
        ["a", "b", "a"], "gpt-4o", cache_dir=str(tmp_path),
        completion_fn=counting_fn)
    assert out["completions"] == ["ok"] * 3
    assert len(calls) == 2  # 'a' cached after first call
    # totally cached on rerun
    calls.clear()
    openai_completions(["a", "b"], "gpt-4o", cache_dir=str(tmp_path),
                       completion_fn=counting_fn)
    assert len(calls) == 0


def test_retry_with_backoff(tmp_path):
    attempts = []

    def flaky(messages, model_name, **kw):
        attempts.append(1)
        if len(attempts) < 3:
            raise RuntimeError("rate limit")
        return {"text": "done", "prompt_tokens": 1,
                "completion_tokens": 1}

    out = openai_completions(["x"], "gpt-4o", cache_dir=str(tmp_path),
                             completion_fn=flaky,
                             retry_base_delay=0.01)
    assert out["completions"] == ["done"]
    assert len(attempts) == 3


def test_chatml_interleaved():
    from PIL import Image

    msgs = to_chatml([
        {"type": "text", "content": "look"},
        {"type": "image", "content": Image.new("RGB", (4, 4))},
    ])
    assert msgs[0]["role"] == "user"
    kinds = [c["type"] for c in msgs[0]["content"]]
    assert kinds == ["text", "image_url"]
    assert msgs[0]["content"][1]["image_url"]["url"].startswith(
        "data:image/png;base64,")


def test_mementos_scoring(tmp_path):
    preds = ["the cat runs fast", "a dog sits"]
    refs = ["cat runs", "dog sits still"]
    scores = score_predictions(preds, refs, "gpt-4o",
                               completion_fn=fake_llm,
                               cache_dir=str(tmp_path))
    assert scores["behavior_f1"] == 1.0
    assert scores["object_f1"] == 1.0
    assert scores["judge_cost"] > 0


def test_f1_and_parse():
    assert f1({"a"}, {"a", "b"}) == 2 * 1 * 0.5 / 1.5
    kw = parse_keywords("BEHAVIORS: run, jump\nOBJECTS: cat")
    assert kw["behaviors"] == {"run", "jump"}
    assert kw["objects"] == {"cat"}


def test_prompt_to_chatml_reference_semantics():
    """Reference _prompt_to_chatml (:401-455): roles split on first
    newline, 'system name=x' annotations become message kwargs."""
    from mantis_tpu.judge.openai_utils import prompt_to_chatml

    prompt = ("<|im_start|>system\nYou are a helpful assistant.\n"
              "<|im_end|>\n<|im_start|>system name=example_user\n"
              "Knock knock.\n<|im_end|>\n<|im_start|>user\n"
              "Orange.\n<|im_end|>")
    got = prompt_to_chatml(prompt)
    assert got == [
        {"content": "You are a helpful assistant.", "role": "system"},
        {"content": "Knock knock.", "role": "system",
         "name": "example_user"},
        {"content": "Orange.", "role": "user"},
    ]


def test_chatml_roundtrip_and_requires():
    from mantis_tpu.judge.openai_utils import (chatml_to_prompt,
                                               prompt_to_chatml,
                                               requires_chatml)

    msgs = [{"content": "hi there", "role": "user"}]
    flat = chatml_to_prompt(msgs)
    assert flat == "<|im_start|>user\nhi there\n<|im_end|>\n"
    assert prompt_to_chatml(flat) == msgs
    assert requires_chatml("gpt-4o") and requires_chatml(
        "gpt-3.5-turbo")
    assert not requires_chatml("text-davinci-003")


def test_legacy_completions_model_gets_flat_prompt(tmp_path):
    """A non-chat model receives a ChatML STRING (reference
    openai_completions :128-134), a chat model receives messages."""
    from mantis_tpu.judge.openai_utils import openai_completions

    seen = {}

    def fake(payload, model_name, **kw):
        seen[model_name] = payload
        return {"text": "ok", "prompt_tokens": 1,
                "completion_tokens": 1}

    msgs = [{"role": "user", "content": "1+1="}]
    openai_completions([msgs], "text-davinci-003",
                       cache_dir=str(tmp_path / "a"),
                       completion_fn=fake)
    assert seen["text-davinci-003"] == \
        "<|im_start|>user\n1+1=\n<|im_end|>\n"
    openai_completions([msgs], "gpt-4o",
                       cache_dir=str(tmp_path / "b"),
                       completion_fn=fake)
    assert seen["gpt-4o"] == msgs


def _picklable_fake(payload, model_name, **kw):
    return {"text": f"echo:{payload}", "prompt_tokens": 2,
            "completion_tokens": 3}


def test_process_pool_parity(tmp_path):
    """pool_type='process' (the reference's multiprocessing.Pool,
    :214-254) returns the same results and prices as the thread pool
    and shares the disk cache."""
    from mantis_tpu.judge.openai_utils import openai_completions

    prompts = ["a", "b", "c"]
    thread = openai_completions(
        prompts, "gpt-3.5-turbo", cache_dir=str(tmp_path),
        completion_fn=_picklable_fake, num_procs=2)
    proc = openai_completions(
        prompts, "gpt-3.5-turbo", cache_dir=str(tmp_path),
        completion_fn=_picklable_fake, num_procs=2,
        pool_type="process")
    assert proc["completions"] == thread["completions"]
    assert proc["total_price"] == thread["total_price"]
