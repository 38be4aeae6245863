"""Parallel, disk-cached OpenAI batch client for LLM-judge evals.

Behavioral port of the reference's easy_openai
(reference: mantis/easy_openai/openai_utils.py:57-593):
``openai_completions(prompts, model_name, ...)`` with a disk cache keyed
by a prompt/config fingerprint (:38-55), a worker pool, retry with
backoff (:256-394), chatml conversion and base64 image URLs (:458-488),
and token-price accounting (:554-570).

The ``openai`` package is not in this image and the environment has no
egress; the network call is isolated behind ``completion_fn`` so tests
(and offline judges) can inject a local function, while the cache,
parallelism, retry and accounting layers run unchanged.
"""

from __future__ import annotations

import base64
import hashlib
import io
import json
import os
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, List, Optional

# $/1k tokens (prompt, completion) — extend as needed
MODEL_PRICES = {
    "gpt-4o": (0.0025, 0.01),
    "gpt-4-turbo": (0.01, 0.03),
    "gpt-3.5-turbo": (0.0005, 0.0015),
}


def _fingerprint(obj):
    """PIL images fingerprint by CONTENT: default=str would embed the
    object's memory address — a different uid every run (cache never
    hits) and, worse, address reuse within a run can alias two
    different images to one uid (wrong cached judgement)."""
    if hasattr(obj, "save") and hasattr(obj, "tobytes"):
        return "img:" + hashlib.sha256(obj.tobytes()).hexdigest()
    return str(obj)


def prompt_uid(prompt, model_name: str, **decoding_kwargs) -> str:
    payload = json.dumps(
        {"prompt": prompt, "model": model_name, "kw": decoding_kwargs},
        sort_keys=True, default=_fingerprint)
    return hashlib.sha256(payload.encode()).hexdigest()[:32]


def encode_image(image) -> str:
    """PIL image -> base64 data URL (reference :458-488)."""
    buf = io.BytesIO()
    image.save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    return f"data:image/png;base64,{b64}"


def requires_chatml(model: str) -> bool:
    """Chat-only models need ChatML message lists (reference
    _requires_chatml, :395-399)."""
    m = model.lower()
    return "turbo" in m or "gpt-4" in m or "chatgpt" in m


def string_to_dict(to_convert: str) -> Dict[str, str]:
    """' name=user university=stanford' -> {'name': ..., ...}
    (reference _string_to_dict, :546-552)."""
    return {kv.split("=", 1)[0]: kv.split("=", 1)[1]
            for kv in to_convert.split(" ") if kv}


def prompt_to_chatml(prompt: str, start_token: str = "<|im_start|>",
                     end_token: str = "<|im_end|>") -> List[Dict]:
    """Parse a ChatML-formatted STRING into message dicts (reference
    _prompt_to_chatml, :401-455 — incl. the ``system name=...`` role
    annotations; literal-eval of quoted content uses
    ``ast.literal_eval`` rather than the reference's bare ``eval``)."""
    import ast

    prompt = prompt.strip()
    assert prompt.startswith(start_token), "not a ChatML prompt"
    assert prompt.endswith(end_token), "not a ChatML prompt"
    messages = []
    for p in prompt.split(start_token)[1:]:
        role, rest = p.split("\n", 1)
        role = role.strip()
        raw = rest.split(end_token, 1)[0].strip()
        try:
            content = ast.literal_eval(raw)
        except (SyntaxError, ValueError):
            content = raw
        extra: Dict[str, str] = {}
        if role.startswith("system") and role != "system":
            extra = string_to_dict(role.split("system", 1)[-1])
            role = "system"
        messages.append(dict(content=content, role=role, **extra))
    return messages


def chatml_to_prompt(messages: List[Dict],
                     start_token: str = "<|im_start|>",
                     end_token: str = "<|im_end|>") -> str:
    """Flatten message dicts to the ChatML STRING legacy completions
    models consume (reference _chatml_to_prompt, :489-544; image parts
    inline as data URLs via encode_image)."""
    prompt = ""
    for m in messages:
        role = m["role"]
        if m.get("name") is not None:
            role += f" name={m['name']}"
        content = m["content"]
        if isinstance(content, list):
            parts = []
            for c in content:
                if c["type"] == "text":
                    parts.append(c["text"])
                elif c["type"] in ("image", "image_url"):
                    url = c.get("image_url", c.get("image"))
                    if isinstance(url, dict):
                        url = url["url"]
                    if not isinstance(url, str):
                        url = encode_image(url)
                    parts.append(url)
                else:
                    raise ValueError(f"unknown content type {c['type']}")
            content = "\n".join(parts)
        prompt += f"{start_token}{role}\n{content}\n{end_token}\n"
    return prompt


def to_chatml(prompt) -> List[Dict]:
    """str | ChatML string | [{role, content}] | interleaved
    [{'type': 'image'/'text'}] -> OpenAI chat messages."""
    if isinstance(prompt, str):
        if prompt.strip().startswith("<|im_start|>"):
            return prompt_to_chatml(prompt)
        return [{"role": "user", "content": prompt}]
    if isinstance(prompt, list) and prompt and "type" in prompt[0]:
        content = []
        for m in prompt:
            if m["type"] == "text":
                content.append({"type": "text", "text": m["content"]})
            else:
                url = (m["content"] if isinstance(m["content"], str)
                       else encode_image(m["content"]))
                content.append({"type": "image_url",
                                "image_url": {"url": url}})
        return [{"role": "user", "content": content}]
    return prompt


class DiskCache:
    def __init__(self, cache_dir: Optional[str] = None):
        self.dir = cache_dir or os.path.join(
            os.path.expanduser("~"), ".cache", "mantis_tpu_openai")
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, uid: str) -> str:
        return os.path.join(self.dir, uid + ".json")

    def get(self, uid: str):
        p = self._path(uid)
        if os.path.exists(p):
            try:
                with open(p) as f:
                    return json.load(f)
            except (json.JSONDecodeError, OSError):
                return None   # truncated by a crash mid-put: a miss
        return None

    def put(self, uid: str, value) -> None:
        # atomic: a kill mid-write must not poison the cache entry
        tmp = self._path(uid) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(value, f)
        os.replace(tmp, self._path(uid))


def _default_completion_fn(messages, model_name, **kw):
    try:
        import openai  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "The openai package is unavailable in this environment; "
            "pass completion_fn= to openai_completions (e.g. a local "
            "judge) or install openai where egress exists.") from e
    client = openai.OpenAI()
    resp = client.chat.completions.create(
        model=model_name, messages=messages, **kw)
    return {
        "text": resp.choices[0].message.content,
        "prompt_tokens": resp.usage.prompt_tokens,
        "completion_tokens": resp.usage.completion_tokens,
    }


class _ProcessWorker:
    """Picklable per-prompt worker for pool_type="process": rebuilds
    the disk cache in the child and runs the same payload/retry path
    as the thread pool."""

    def __init__(self, fn, model_name, cache_dir, decoding_kwargs,
                 max_retries, retry_base_delay):
        self.fn = fn
        self.model_name = model_name
        self.cache_dir = cache_dir
        self.decoding_kwargs = decoding_kwargs
        self.max_retries = max_retries
        self.retry_base_delay = retry_base_delay

    def __call__(self, prompt):
        cache = DiskCache(self.cache_dir)
        uid = prompt_uid(prompt, self.model_name,
                         **self.decoding_kwargs)
        hit = cache.get(uid)
        if hit is not None:
            return hit
        if requires_chatml(self.model_name):
            payload = to_chatml(prompt)
        else:
            payload = (prompt if isinstance(prompt, str)
                       else chatml_to_prompt(to_chatml(prompt)))
        delay = self.retry_base_delay
        for attempt in range(self.max_retries):
            try:
                out = self.fn(payload, self.model_name,
                              **self.decoding_kwargs)
                break
            except Exception:
                if attempt == self.max_retries - 1:
                    raise
                time.sleep(delay)
                delay *= 2
        cache.put(uid, out)
        return out


def openai_completions(
    prompts: List,
    model_name: str,
    cache_dir: Optional[str] = None,
    num_procs: int = 8,
    max_retries: int = 5,
    retry_base_delay: float = 1.0,
    completion_fn: Optional[Callable] = None,
    pool_type: str = "thread",
    **decoding_kwargs,
) -> Dict:
    """Batch completions with caching + retry.

    Returns {'completions': [...], 'price_per_example': [...],
    'total_price': float} (reference return contract, :554-570).
    """
    cache = DiskCache(cache_dir)
    fn = completion_fn or _default_completion_fn

    def one(prompt):
        uid = prompt_uid(prompt, model_name, **decoding_kwargs)
        hit = cache.get(uid)
        if hit is not None:
            return hit
        if requires_chatml(model_name):
            payload = to_chatml(prompt)
        else:
            # legacy completions model: flatten chat messages to a
            # ChatML prompt STRING (reference openai_completions
            # :128-134 routing via _chatml_to_prompt)
            payload = (prompt if isinstance(prompt, str)
                       else chatml_to_prompt(to_chatml(prompt)))
        delay = retry_base_delay
        for attempt in range(max_retries):
            try:
                out = fn(payload, model_name, **decoding_kwargs)
                break
            except Exception:
                if attempt == max_retries - 1:
                    raise
                time.sleep(delay)
                delay *= 2
        cache.put(uid, out)
        return out

    if pool_type == "process":
        # the reference parallelizes with multiprocessing.Pool
        # (:214-254); requires a PICKLABLE completion_fn and pays
        # fork+import per worker — the thread pool is the default
        # because the work is network-bound
        import multiprocessing as mp

        with mp.get_context("spawn").Pool(num_procs) as pool:
            results = pool.map(
                _ProcessWorker(fn, model_name, cache_dir,
                               decoding_kwargs, max_retries,
                               retry_base_delay), prompts)
    else:
        with ThreadPoolExecutor(max_workers=num_procs) as pool:
            results = list(pool.map(one, prompts))

    prices = []
    pin, pout = MODEL_PRICES.get(model_name, (0.0, 0.0))
    for r in results:
        prices.append(
            r.get("prompt_tokens", 0) / 1000 * pin
            + r.get("completion_tokens", 0) / 1000 * pout)
    return {
        "completions": [r["text"] for r in results],
        "price_per_example": prices,
        "total_price": sum(prices),
    }
