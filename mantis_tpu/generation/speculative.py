"""Speculative decoding with prompt-lookup drafting.

Batch-1 decode is HBM-bound on the weight read per step (docs/PERF.md:
~8 GB/token), so verifying k drafted tokens in ONE forward costs about
the same as decoding one token — every accepted draft token is nearly
free.  Drafts come from prompt-lookup (Saxena 2023; HF
``prompt_lookup_num_tokens``): match the trailing n-gram against the
context and propose its historical continuation — no draft model, and
greedy verification makes the output EXACTLY equal to plain greedy
decoding (tests/test_speculative.py).  Acceptance (and thus speedup)
is data-dependent: high for extractive/repetitive generations
(summaries, code edits, judge answer rephrasings), ~0 on random text.

The verify step reuses the incremental-prefill primitive
(``cache_attention=True``, llama.forward): the k+1-token chunk attends
to the live cache plus itself causally, its KV lands in the cache, and
rejected slots are simply rewound (overwritten by the next write,
causally masked meanwhile — same invariant as generation/session.py).
"""
import dataclasses
import functools
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from mantis_tpu.generation.sampler import GenerationConfig, _bucket
from mantis_tpu.models.llama import KVCache


def prompt_lookup_draft(tokens: List[int], n_draft: int,
                        ngram: int = 3) -> List[int]:
    """Propose up to n_draft tokens by matching the trailing `ngram`
    against the context (first occurrence wins, like HF's
    prompt-lookup — earlier matches have longer continuations)."""
    n = len(tokens)
    if n < ngram + 1:
        return []
    tail = tokens[-ngram:]
    for start in range(0, n - ngram):
        if tokens[start:start + ngram] == tail:
            cont = tokens[start + ngram:start + ngram + n_draft]
            return list(cont)
    return []


@functools.partial(
    jax.jit,
    static_argnames=("model_forward", "model_cfg"),
    donate_argnames=("cache",),
)
def _verify_jit(params, chunk, start, cache, *, model_forward,
                model_cfg):
    """Forward the [last_accepted ++ drafts] chunk against the cache;
    returns greedy next-token per position and the advanced cache
    (length including every chunk slot — the caller rewinds)."""
    b, k1 = chunk.shape
    pos = (start + jnp.arange(k1))[None, :]
    logits, _, cache = model_forward(
        params, model_cfg, input_ids=chunk, pixel_values=None,
        positions=pos, segment_ids=jnp.ones((b, k1), jnp.int32),
        kv_cache=cache, cache_attention=True)
    return jnp.argmax(logits[0], axis=-1).astype(jnp.int32), cache


@functools.partial(
    jax.jit,
    static_argnames=("model_forward", "model_cfg", "max_new",
                     "cache_dtype"),
)
def _prefill_jit(params, ids, pixel_values, true_len, *, model_forward,
                 model_cfg, max_new, cache_dtype):
    text_cfg = getattr(model_cfg, "text_config", model_cfg)
    b, s = ids.shape
    seg = (jnp.arange(s)[None, :] < true_len).astype(jnp.int32)
    positions = jnp.arange(s)[None, :] * seg
    cache = KVCache.create(text_cfg, b, s + max_new, dtype=cache_dtype)
    logits, _, cache = model_forward(
        params, model_cfg, input_ids=ids, pixel_values=pixel_values,
        positions=positions, segment_ids=seg, kv_cache=cache)
    last = jnp.take_along_axis(
        logits, jnp.reshape(true_len - 1, (1, 1, 1)), axis=1)[:, 0]
    tok0 = jnp.argmax(last, axis=-1).astype(jnp.int32)
    cache = dataclasses.replace(cache, length=true_len)
    return tok0, cache


def speculative_generate(
    params,
    model_cfg,
    model_forward,
    input_ids: np.ndarray,
    pixel_values: Optional[np.ndarray] = None,
    gen_cfg: Optional[GenerationConfig] = None,
    cache_dtype=jnp.bfloat16,
    n_draft: int = 5,
    ngram: int = 3,
    draft_fn=None,
):
    """Greedy generation, token-identical to ``generate(do_sample=
    False)``, batch 1.  Returns (new_token_ids list, stats dict with
    verify_calls / drafted / accepted).

    ``draft_fn(history) -> List[int]`` overrides the draft source
    (default: prompt-lookup); e.g. a small draft model, or an oracle
    in benchmarks.  Greedy verification keeps the output exact
    regardless of what the draft proposes."""
    gen_cfg = gen_cfg or GenerationConfig(do_sample=False)
    assert not gen_cfg.do_sample, "speculative decoding is greedy-only"
    input_ids = np.asarray(input_ids)
    assert input_ids.shape[0] == 1
    b, s = input_ids.shape

    sb = _bucket(s)
    ids = np.full((1, sb), gen_cfg.pad_token_id, np.int32)
    ids[0, :s] = input_ids[0]
    pv = None if pixel_values is None else jnp.asarray(pixel_values)

    tok0, cache = _prefill_jit(
        params, jnp.asarray(ids), pv, jnp.asarray(s, jnp.int32),
        model_forward=model_forward, model_cfg=model_cfg,
        max_new=gen_cfg.max_new_tokens + n_draft + 1,
        cache_dtype=cache_dtype)

    context = [int(t) for t in input_ids[0]]
    out, stats, cache, _ = decode_from_cache(
        params, model_cfg, model_forward, cache, s, context,
        int(tok0[0]), gen_cfg, n_draft=n_draft, ngram=ngram,
        draft_fn=draft_fn)
    return out, stats


def decode_from_cache(
    params, model_cfg, model_forward, cache, length: int,
    context: List[int], tok0: int, gen_cfg: GenerationConfig,
    n_draft: int = 5, ngram: int = 3, draft_fn=None,
):
    """The draft/verify loop, continuing from a live cache whose first
    `length` slots are written (`context` = those tokens, used for the
    n-gram lookup; `tok0` = the already-sampled first new token, KV not
    yet written — the ChatSession invariant).

    Returns (out_tokens, stats, cache, cached_count): out_tokens is
    everything emitted (incl. a trailing eos if hit); cached_count of
    them have their KV in the cache (always len(out) - 1, same
    invariant as the plain decode loop).  The cache must have
    length + max_new + n_draft + 1 slots free."""
    max_new = gen_cfg.max_new_tokens
    eos = set(gen_cfg.eos_token_ids or ())
    pad_tok = gen_cfg.pad_token_id or 0
    out: List[int] = [tok0]
    stats = {"verify_calls": 0, "drafted": 0, "accepted": 0}
    while len(out) < max_new and out[-1] not in eos:
        history = context + out
        draft = (draft_fn(history) if draft_fn is not None
                 else prompt_lookup_draft(history, n_draft, ngram))
        draft = list(draft)[:n_draft]
        stats["drafted"] += len(draft)
        chunk = [out[-1]] + draft + [pad_tok] * (n_draft - len(draft))
        greedy, cache = _verify_jit(
            params, jnp.asarray([chunk], jnp.int32),
            jnp.asarray(length, jnp.int32), cache,
            model_forward=model_forward, model_cfg=model_cfg)
        stats["verify_calls"] += 1
        g = [int(t) for t in np.asarray(greedy)]
        # g[i] is the model's next token after chunk[:i+1]; accept
        # drafts while they match the model's own choice
        emitted = [g[0]]
        a = 0
        while (a < len(draft) and draft[a] == g[a]
               and emitted[-1] not in eos
               and len(out) + len(emitted) < max_new):
            emitted.append(g[a + 1])
            a += 1
        stats["accepted"] += a
        # KV of chunk[0] (=out[-1]) and the a accepted drafts is valid;
        # rewind past the rejected/padded slots
        length = length + 1 + a
        cache = dataclasses.replace(
            cache, length=jnp.asarray(length, jnp.int32))
        for t in emitted:
            out.append(t)
            if t in eos or len(out) >= max_new:
                break
    return out, stats, cache, len(out) - 1
