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
    cache = KVCache.create(text_cfg, b, s + max_new, dtype=cache_dtype,
                           pad_to=128)
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


# ---------------------------------------------------------------------------
# Fully fused speculative decoding (round 3)
#
# The host-stepped loop below (decode_from_cache) pays one dispatch per
# verify call; behind a remote-tunnel runtime that is ~35 ms/call and the
# WORST case (no drafts accepted) degrades 4x vs the fused greedy loop
# (docs/SERVING.md measurements).  The TPU-native fix: run drafting,
# verification, acceptance, and cache rewind inside ONE lax.while_loop —
# prompt-lookup is a vectorized n-gram match over the token buffer (VPU
# work measured in microseconds), so the whole generation is a single
# device program regardless of acceptance behaviour.  Worst case then
# costs one (n_draft+1)-token forward per emitted token — about the same
# HBM traffic as plain decode — and the best case keeps the 1/(a+1)
# weight-read amortization with zero host round-trips.
# ---------------------------------------------------------------------------


def prompt_lookup_draft_jax(buf, length, *, n_draft: int, ngram: int):
    """In-graph prompt-lookup over ``buf[:length]`` — the jax counterpart
    of :func:`prompt_lookup_draft` (first match wins, continuation
    truncated at ``length``).  Returns ``(drafts [n_draft] int32,
    draft_len scalar int32)``; positions >= draft_len are junk that
    greedy verification can never accept."""
    t = buf.shape[0]
    tail = jax.lax.dynamic_slice(
        buf, (jnp.maximum(length - ngram, 0),), (ngram,))
    nw = t - ngram + 1
    # windows[i, j] = buf[j + i]: ngram shifted static slices
    windows = jnp.stack(
        [jax.lax.slice(buf, (i,), (i + nw,)) for i in range(ngram)])
    match = jnp.all(windows == tail[:, None], axis=0)
    match = match & (jnp.arange(nw) < (length - ngram))
    found = jnp.any(match)
    j = jnp.argmax(match)  # first True (argmax of bools)
    cont = j + ngram
    drafts = jax.lax.dynamic_slice(buf, (cont,), (n_draft,))
    draft_len = jnp.where(found, jnp.minimum(n_draft, length - cont), 0)
    return drafts.astype(jnp.int32), draft_len.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("model_forward", "model_cfg", "gen_cfg", "n_draft",
                     "ngram", "use_oracle"),
    donate_argnames=("cache", "buf"),
)
def _spec_fused_jit(params, cache, buf, start_len, tok0, oracle,
                    oracle_len, *, model_forward, model_cfg,
                    gen_cfg: GenerationConfig, n_draft: int, ngram: int,
                    use_oracle: bool):
    """Draft/verify/accept loop as ONE device program.

    Contract: ``cache.length == start_len`` (the KV of ``buf[:start_len]``
    is written; images occupy their placeholder slots so token index ==
    RoPE position == KV slot throughout), ``tok0`` [1] is the sampled
    first new token whose KV is NOT yet written, and the cache has
    ``start_len + max_new_tokens + n_draft + 1`` slots.  With
    ``use_oracle`` the drafts come from ``oracle[out_len:]`` instead of
    prompt-lookup (benchmark harness).  Returns
    ``(buf, out_len, cache, verify_calls, drafted, accepted)``; the
    emitted tokens are ``buf[start_len : start_len + out_len]`` and the
    final ``cache.length == start_len + out_len - 1`` (the last emitted
    token's KV is not written — the ChatSession invariant)."""
    max_new = gen_cfg.max_new_tokens
    k1 = n_draft + 1
    eos = (jnp.asarray(gen_cfg.eos_token_ids, jnp.int32)
           if gen_cfg.eos_token_ids else None)

    def is_eos(tok):
        if eos is None:
            return jnp.zeros(jnp.shape(tok), bool)
        return jnp.any(tok[..., None] == eos, axis=-1)

    buf = jax.lax.dynamic_update_slice(
        buf, tok0.astype(jnp.int32), (start_len,))
    i32 = functools.partial(jnp.asarray, dtype=jnp.int32)

    def cond(state):
        out_len, _, last, _, _, _, _, _ = state
        return (out_len < max_new) & ~is_eos(last)

    def body(state):
        out_len, bl, last, cache, buf, vc, dr, ac = state
        if use_oracle:
            drafts = jax.lax.dynamic_slice(
                oracle, (out_len,), (n_draft,)).astype(jnp.int32)
            draft_len = jnp.clip(oracle_len - out_len, 0, n_draft)
        else:
            drafts, draft_len = prompt_lookup_draft_jax(
                buf, bl, n_draft=n_draft, ngram=ngram)
        # chunk = [last ++ drafts]; last sits at token index bl-1, whose
        # KV slot (== cache.length) is exactly bl-1 by the invariant
        chunk = jnp.concatenate([last[None], drafts])[None, :]
        pos = (bl - 1 + jnp.arange(k1))[None, :]
        logits, _, cache = model_forward(
            params, model_cfg, input_ids=chunk, pixel_values=None,
            positions=pos, segment_ids=jnp.ones((1, k1), jnp.int32),
            kv_cache=cache, cache_attention=True)
        g = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)  # [k1]
        # accept draft i while all previous accepted, it matches the
        # model's own choice, the running last token isn't eos, and the
        # emission budget holds (same conditions as the host loop)
        idx = jnp.arange(n_draft)
        ok = ((idx < draft_len) & (drafts == g[:n_draft])
              & ~is_eos(g[:n_draft]) & (idx < (max_new - out_len - 1)))
        a = jnp.sum(jnp.cumprod(ok.astype(jnp.int32)))
        # write all k1 greedy tokens at bl; positions beyond the a+1
        # emitted ones are junk past the new length — never matched
        # (window filter j < length - ngram) and never emitted
        buf = jax.lax.dynamic_update_slice(buf, g, (bl,))
        last_new = jnp.take(g, a)
        cache = dataclasses.replace(cache, length=bl + a)
        return (out_len + a + 1, bl + a + 1, last_new, cache, buf,
                vc + 1, dr + draft_len, ac + a)

    state = (i32(1), start_len.astype(jnp.int32) + 1,
             tok0[0].astype(jnp.int32), cache, buf, i32(0), i32(0),
             i32(0))
    out_len, _, _, cache, buf, vc, dr, ac = jax.lax.while_loop(
        cond, body, state)
    return buf, out_len, cache, vc, dr, ac


def _fused_token_buffer(context: List[int], gen_cfg: GenerationConfig,
                        n_draft: int, ngram: int) -> np.ndarray:
    """Bucketed token buffer sized so draft-continuation slices never
    clamp: context + tok0 + max_new emissions + n_draft + ngram slack."""
    need = len(context) + 1 + gen_cfg.max_new_tokens + n_draft + ngram
    buf = np.full(_bucket(need), gen_cfg.pad_token_id or 0, np.int32)
    buf[:len(context)] = context
    return buf


def decode_from_cache_fused(
    params, model_cfg, model_forward, cache, length: int,
    context: List[int], tok0: int, gen_cfg: GenerationConfig,
    n_draft: int = 5, ngram: int = 3,
):
    """Fused drop-in for :func:`decode_from_cache` (same contract and
    return tuple) when the draft source is prompt-lookup.  One device
    program replaces 1-2 dispatches per emitted token."""
    assert length == len(context), (
        "fused speculative requires token index == KV slot "
        f"(got {len(context)} tokens, cache length {length})")
    buf = _fused_token_buffer(context, gen_cfg, n_draft, ngram)
    dummy = jnp.zeros(n_draft, jnp.int32)
    buf, out_len, cache, vc, dr, ac = _spec_fused_jit(
        params, cache, jnp.asarray(buf), jnp.asarray(length, jnp.int32),
        jnp.asarray([tok0], jnp.int32), dummy, jnp.asarray(0, jnp.int32),
        model_forward=model_forward, model_cfg=model_cfg,
        gen_cfg=gen_cfg, n_draft=n_draft, ngram=ngram, use_oracle=False)
    n = int(out_len)
    out = [int(t) for t in np.asarray(buf[length:length + n])]
    stats = {"verify_calls": int(vc), "drafted": int(dr),
             "accepted": int(ac)}
    return out, stats, cache, len(out) - 1


def speculative_generate_fused(
    params,
    model_cfg,
    model_forward,
    input_ids: np.ndarray,
    pixel_values: Optional[np.ndarray] = None,
    gen_cfg: Optional[GenerationConfig] = None,
    cache_dtype=jnp.bfloat16,
    n_draft: int = 5,
    ngram: int = 3,
    oracle: Optional[List[int]] = None,
):
    """Greedy generation, token-identical to ``generate(do_sample=
    False)`` and to :func:`speculative_generate`, batch 1 — but the
    entire draft/verify loop runs on-device in one program (see the
    module-section comment).  ``oracle`` (benchmarks) supplies a
    precomputed continuation used as the draft stream instead of
    prompt-lookup; greedy verification keeps the output exact either
    way.  Returns (new_token_ids list, stats dict)."""
    gen_cfg = gen_cfg or GenerationConfig(do_sample=False)
    assert not gen_cfg.do_sample, "speculative decoding is greedy-only"
    input_ids = np.asarray(input_ids)
    assert input_ids.shape[0] == 1
    _, s = input_ids.shape

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
    buf = _fused_token_buffer(context, gen_cfg, n_draft, ngram)
    use_oracle = oracle is not None
    if use_oracle:
        orc = np.full(gen_cfg.max_new_tokens + n_draft,
                      gen_cfg.pad_token_id or 0, np.int32)
        n_orc = min(len(oracle), len(orc))
        orc[:n_orc] = list(oracle)[:n_orc]
    else:
        orc, n_orc = np.zeros(n_draft, np.int32), 0

    buf, out_len, cache, vc, dr, ac = _spec_fused_jit(
        params, cache, jnp.asarray(buf), jnp.asarray(s, jnp.int32),
        tok0.astype(jnp.int32), jnp.asarray(orc),
        jnp.asarray(n_orc, jnp.int32), model_forward=model_forward,
        model_cfg=model_cfg, gen_cfg=gen_cfg, n_draft=n_draft,
        ngram=ngram, use_oracle=use_oracle)
    n = int(out_len)
    out = [int(t) for t in np.asarray(buf[s:s + n])]
    stats = {"verify_calls": int(vc), "drafted": int(dr),
             "accepted": int(ac)}
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
