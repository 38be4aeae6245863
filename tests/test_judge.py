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
