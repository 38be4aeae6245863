"""Continuous-batching decode engine (slot-based, static shapes).

The round-2 endpoint serialized requests behind a lock while the chip
demonstrably decodes 6-9x more aggregate tokens at batch 8-16
(docs/PERF.md).  This engine realizes that capacity the TPU-native way:

  - ONE static-shape batched KV cache ``[L, max_slots, slot_ctx, ...]``
    (int8 by default — the measured capacity lever) lives on device for
    the server's lifetime; XLA compiles exactly three programs (prefill
    per bucket, slot-insert per bucket, decode chunk) and reuses them
    for every request.  No dynamic shapes, no per-request compilation.
  - Each request occupies a SLOT with an independent per-row length:
    ``KVCache.length`` carries a ``[max_slots]`` vector, cache writes
    are per-row vmapped dynamic-update-slices, and decode attention
    masks per-row positions (models/llama.py write_kv/_decode_attention).
  - The engine thread owns the device.  Requests are admitted at chunk
    boundaries: prefill runs batch-1 into a bucket-sized scratch cache,
    a jitted insert scatters it into the slot, and the shared decode
    chunk (``chunk_tokens`` greedy steps fused in one jit via lax.scan)
    advances every live slot at once.  Streams retire on EOS or their
    token budget mid-chunk (masked in-graph) and free the slot for the
    next admission.
  - Chunked stepping amortizes the host<->device round trip (the axon
    tunnel adds ~35 ms/dispatch); admission latency is bounded by one
    chunk (~chunk_tokens * per-token step time).

Sampling: each request carries (temperature, top_p, seed).  Greedy
slots are bit-identical to their batch-1 greedy decode (asserted in
tests/test_engine.py) because every row's attention/matmul math is
independent of co-resident slots — and because greedy rows take argmax
even inside the sampling program.  Sampled slots are deterministic in
(seed, prompt) alone: row k's token i always consumes the i-th split
of its decode key, independent of chunk boundaries or co-residents.
When no live slot samples, the engine dispatches a greedy-only program
with no sampling ops (no vocab sort on the hot path).

Streaming: a request submitted with ``stream=True`` gets a queue the
scheduler pushes tokens into as each chunk retires; ``None`` is the
end-of-stream sentinel (EngineAdapter.stream turns this into text
deltas for the server's SSE path).

Round-3 composition layers (each measured in docs/SERVING.md):
  - ``spec_tokens``: speculative verify-steps inside the shared decode
    chunk (per-slot prompt-lookup drafts, one batched (k+1)-token
    verify, per-row accept/rewind) — _spec_decode_chunk_jit;
  - ``prefill_chunk``: long admissions as incremental-prefill pieces
    with decode chunks interleaved (bounded co-resident stalls) —
    _prefill_piece_jit;
  - ``max_cached_prefixes``: prefix cache with suffix-only prefill;
  - request cancellation (stop sequences / client abort): consumers
    set ``req.cancelled``; the scheduler retires the slot at the next
    chunk boundary.

The reference has no serving stack at all (its demo is an external HF
Space, reference .gitmodules:1-3); the protocol surface this feeds is
serving/server.py.
"""

from __future__ import annotations

import contextlib
import dataclasses
import functools
import queue
import threading
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from mantis_tpu.models.llama import KVCache


# ---------------------------------------------------------------------------
# jitted device programs
# ---------------------------------------------------------------------------

def _sample_rows(keys, logits, temps, top_ps):
    """Per-row temperature/top-p sampling; rows with temp<=0 take
    argmax (bit-identical to the greedy path — sampling co-residents
    cannot perturb a greedy stream).

    keys [B, 2] uint32 (one PRNG key per row), logits [B, V] f32,
    temps/top_ps [B].
    """
    greedy = jnp.argmax(logits, -1)
    scaled = logits / jnp.maximum(temps, 1e-6)[:, None]
    # per-row nucleus: keep the smallest prefix of sorted probs whose
    # cumulative mass reaches top_p (rows with top_p=1 keep everything)
    sorted_logits = jnp.sort(scaled, axis=-1)[:, ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # clamp: with top_p=1.0 float error can leave cum[-1] < 1.0, which
    # would index one past the vocab
    cutoff_idx = jnp.minimum(
        jnp.sum(cum < top_ps[:, None], axis=-1), logits.shape[-1] - 1)
    cutoff = jnp.take_along_axis(
        sorted_logits, cutoff_idx[:, None], axis=-1)
    masked = jnp.where(scaled < cutoff, -jnp.inf, scaled)
    sampled = jax.vmap(jax.random.categorical)(keys, masked)
    return jnp.where(temps > 0, sampled, greedy).astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("model_forward", "model_cfg", "cache_dtype",
                              "bucket", "sampling"))
def _prefill_jit(params, ids, pixel_values, true_len, temp, top_p, key,
                 *, model_forward, model_cfg, cache_dtype, bucket,
                 sampling=False):
    """Batch-1 prompt prefill into a fresh bucket-sized scratch cache.

    ids [1, bucket] (padded), true_len scalar.  Returns (first token —
    greedy, or sampled when ``sampling``; the greedy program is
    compiled without any sampling ops), scratch KVCache with
    per-position seg validity).
    """
    seg = (jnp.arange(bucket)[None, :] < true_len).astype(jnp.int32)
    positions = jnp.arange(bucket)[None, :] * seg
    cache = KVCache.create(model_cfg.text_config, 1, bucket,
                           dtype=cache_dtype)
    logits, _, cache = model_forward(
        params, model_cfg, input_ids=ids, pixel_values=pixel_values,
        positions=positions, segment_ids=seg, kv_cache=cache)
    last = jnp.take_along_axis(
        logits, jnp.reshape(true_len - 1, (1, 1, 1)), axis=1)[:, 0]
    last = last.astype(jnp.float32)
    if sampling:
        tok0 = _sample_rows(key[None, :], last, temp[None], top_p[None])
    else:
        tok0 = jnp.argmax(last, -1).astype(jnp.int32)
    return tok0[0], cache


@functools.partial(
    jax.jit, static_argnames=("model_forward", "model_cfg", "cache_dtype",
                              "bucket", "sampling"))
def _prefill_batch_jit(params, ids, true_lens, temps, top_ps, keys, *,
                       model_forward, model_cfg, cache_dtype, bucket,
                       sampling=False):
    """Batched TEXT-ONLY prompt prefill: k same-bucket prompts run as
    ONE forward into a fresh [k, bucket] scratch cache — a burst of
    admissions costs one dispatch + one weight read instead of k
    (the per-admission RTT dominates short-decode workloads like
    engine-backed evaluation).  ids [k, bucket] (padded), true_lens
    [k]; returns per-row first tokens + the batched scratch cache."""
    k = ids.shape[0]
    seg = (jnp.arange(bucket)[None, :]
           < true_lens[:, None]).astype(jnp.int32)
    positions = jnp.arange(bucket)[None, :] * seg
    cache = KVCache.create(model_cfg.text_config, k, bucket,
                           dtype=cache_dtype)
    logits, _, cache = model_forward(
        params, model_cfg, input_ids=ids, positions=positions,
        segment_ids=seg, kv_cache=cache)
    last = jnp.take_along_axis(
        logits, (true_lens - 1).reshape(k, 1, 1), axis=1)[:, 0]
    last = last.astype(jnp.float32)
    if sampling:
        toks = _sample_rows(keys, last, temps, top_ps)
    else:
        toks = jnp.argmax(last, -1).astype(jnp.int32)
    return toks, cache


@functools.partial(jax.jit, donate_argnames=("big",))
def _insert_batch_jit(big: KVCache, small: KVCache, slots, true_lens):
    """Scatter the k rows of a batched scratch cache into slots
    ``slots`` of the big cache in one program (row semantics identical
    to _insert_slot_jit)."""
    m_big = big.k.shape[2]

    def body(i, carry):
        k, v, seg, length, ks, vs = carry
        zero = jnp.zeros((), jnp.int32)
        slot = slots[i]
        start5 = (zero, slot, zero, zero, zero)
        row_k = jax.lax.dynamic_slice_in_dim(small.k, i, 1, axis=1)
        row_v = jax.lax.dynamic_slice_in_dim(small.v, i, 1, axis=1)
        k = jax.lax.dynamic_update_slice(k, row_k.astype(k.dtype),
                                         start5)
        v = jax.lax.dynamic_update_slice(v, row_v.astype(v.dtype),
                                         start5)
        seg_row = jnp.zeros((1, m_big), jnp.int32)
        seg_row = jax.lax.dynamic_update_slice(
            seg_row, jax.lax.dynamic_slice_in_dim(small.seg, i, 1,
                                                  axis=0), (0, 0))
        seg = jax.lax.dynamic_update_slice(seg, seg_row, (slot, zero))
        if ks is not None:
            ks = jax.lax.dynamic_update_slice(
                ks, jax.lax.dynamic_slice_in_dim(small.k_scale, i, 1,
                                                 axis=1), start5[:4])
            vs = jax.lax.dynamic_update_slice(
                vs, jax.lax.dynamic_slice_in_dim(small.v_scale, i, 1,
                                                 axis=1), start5[:4])
        length = length.at[slot].set(true_lens[i])
        return (k, v, seg, length, ks, vs)

    k, v, seg, length, ks, vs = jax.lax.fori_loop(
        0, slots.shape[0], body,
        (big.k, big.v, big.seg, big.length, big.k_scale, big.v_scale))
    return KVCache(k=k, v=v, seg=seg, length=length, k_scale=ks,
                   v_scale=vs)


@functools.partial(
    jax.jit, static_argnames=("model_forward", "model_cfg",
                              "cache_dtype", "pbucket", "tbucket",
                              "sbucket", "sampling"))
def _prefill_suffix_jit(params, prefix: KVCache, suffix_ids,
                        pixel_values, match_len, n_suffix, temp, top_p,
                        key, *, model_forward, model_cfg, cache_dtype,
                        pbucket, tbucket, sbucket, sampling=False):
    """Prefix-reuse prefill: seed a fresh tbucket-sized scratch cache
    with the first ``match_len`` positions of a stored prompt cache
    (KV of token i depends only on tokens <= i, so any stored prompt's
    prefix KV is valid for a prompt sharing those tokens+images), then
    run ONLY the suffix through the model with ``cache_attention=True``
    (queries attend to the seeded history plus themselves).  Computes
    sbucket instead of match_len+sbucket token-positions of prefill.

    suffix_ids [1, sbucket]; match_len/n_suffix scalars (dynamic — one
    compiled program per (pbucket, tbucket, sbucket) combination).
    """
    cache = KVCache.create(model_cfg.text_config, 1, tbucket,
                           dtype=cache_dtype)
    m = min(pbucket, tbucket)
    cache = dataclasses.replace(
        cache,
        k=cache.k.at[:, :, :m].set(prefix.k[:, :, :m]
                                   .astype(cache.k.dtype)),
        v=cache.v.at[:, :, :m].set(prefix.v[:, :, :m]
                                   .astype(cache.v.dtype)),
        # stale stored positions beyond the match stay masked
        seg=(jnp.arange(tbucket)[None, :] < match_len).astype(jnp.int32),
        length=jnp.asarray(match_len, jnp.int32),
        k_scale=(cache.k_scale.at[..., :m].set(prefix.k_scale[..., :m])
                 if cache.k_scale is not None else None),
        v_scale=(cache.v_scale.at[..., :m].set(prefix.v_scale[..., :m])
                 if cache.v_scale is not None else None))
    seg_q = (jnp.arange(sbucket)[None, :] < n_suffix).astype(jnp.int32)
    positions = (match_len + jnp.arange(sbucket)[None, :]) * seg_q
    logits, _, cache = model_forward(
        params, model_cfg, input_ids=suffix_ids,
        pixel_values=pixel_values, positions=positions,
        segment_ids=seg_q, kv_cache=cache, cache_attention=True)
    last = jnp.take_along_axis(
        logits, jnp.reshape(n_suffix - 1, (1, 1, 1)), axis=1)[:, 0]
    last = last.astype(jnp.float32)
    if sampling:
        tok0 = _sample_rows(key[None, :], last, temp[None], top_p[None])
    else:
        tok0 = jnp.argmax(last, -1).astype(jnp.int32)
    return tok0[0], cache


@functools.partial(
    jax.jit, static_argnames=("model_forward", "model_cfg", "tbucket",
                              "cbucket", "sampling", "emit"),
    donate_argnames=("cache",))
def _prefill_piece_jit(params, cache: KVCache, piece_ids, pixel_values,
                       offset, n_valid, temp, top_p, key, *,
                       model_forward, model_cfg, tbucket, cbucket,
                       sampling=False, emit=False):
    """One CHUNKED-prefill piece: run ``piece_ids`` [1, cbucket] through
    the model with ``cache_attention=True`` against the scratch cache's
    first ``offset`` positions (incremental prefill — the same primitive
    as multi-turn KV reuse), writing its KV at [offset, offset+cbucket).
    Long prompts admit as a sequence of pieces with decode chunks
    interleaved, so co-resident streams stall for at most one piece
    instead of one full prompt.  ``emit`` (last piece) also returns the
    prompt's first generated token.  Image features merge positionally
    within the piece (cumsum over its own <image> tokens), so callers
    must never split an image-token span across pieces and must pass
    exactly the piece's images."""
    assert cache.k.shape[2] == tbucket
    seg_q = (jnp.arange(cbucket)[None, :] < n_valid).astype(jnp.int32)
    positions = (offset + jnp.arange(cbucket)[None, :]) * seg_q
    logits, _, cache = model_forward(
        params, model_cfg, input_ids=piece_ids,
        pixel_values=pixel_values, positions=positions,
        segment_ids=seg_q, kv_cache=cache, cache_attention=True)
    # the forward advanced length by cbucket; only n_valid are real
    cache = dataclasses.replace(
        cache, length=(offset + n_valid).astype(jnp.int32))
    if not emit:
        return None, cache
    last = jnp.take_along_axis(
        logits, jnp.reshape(n_valid - 1, (1, 1, 1)), axis=1)[:, 0]
    last = last.astype(jnp.float32)
    if sampling:
        tok0 = _sample_rows(key[None, :], last, temp[None], top_p[None])
    else:
        tok0 = jnp.argmax(last, -1).astype(jnp.int32)
    return tok0[0], cache


@functools.partial(jax.jit, donate_argnames=("big",))
def _insert_slot_jit(big: KVCache, small: KVCache, slot, true_len):
    """Scatter a scratch prefill cache into slot ``slot`` of the big
    cache; the slot's seg row is fully rewritten (stale KV beyond the
    scratch bucket stays masked), lengths[slot] := true_len."""
    m_big = big.k.shape[2]
    zero = jnp.zeros((), jnp.int32)
    start5 = (zero, slot, zero, zero, zero)
    k = jax.lax.dynamic_update_slice(
        big.k, small.k.astype(big.k.dtype), start5)
    v = jax.lax.dynamic_update_slice(
        big.v, small.v.astype(big.v.dtype), start5)
    # seg row fully rewritten: positions beyond the scratch bucket go
    # to 0 so a previous occupant's stale KV stays masked
    seg_row = jnp.zeros((1, m_big), jnp.int32)
    seg_row = jax.lax.dynamic_update_slice(seg_row, small.seg, (0, 0))
    seg = jax.lax.dynamic_update_slice(big.seg, seg_row, (slot, zero))
    ks = vs = None
    if big.k_scale is not None:
        ks = jax.lax.dynamic_update_slice(
            big.k_scale, small.k_scale, start5[:4])
        vs = jax.lax.dynamic_update_slice(
            big.v_scale, small.v_scale, start5[:4])
    length = big.length.at[slot].set(true_len)
    return KVCache(k=k, v=v, seg=seg, length=length, k_scale=ks,
                   v_scale=vs)


@functools.partial(
    jax.jit,
    static_argnames=("model_forward", "model_cfg", "chunk", "pad_id",
                     "sampling"),
    donate_argnames=("cache",))
def _decode_chunk_jit(params, cache: KVCache, toks, live, remaining,
                      eos_ids, temps, top_ps, keys, pos_off, *,
                      model_forward, model_cfg, chunk, pad_id,
                      sampling=False):
    """``chunk`` fused decode steps over every slot at once.

    toks [B]: each live slot's pending token (sampled but not yet
    KV-written).  Each step writes the pending tokens' KV at the
    per-row lengths, samples the next token for live rows, advances
    lengths for live rows only, and retires rows in-graph on EOS or
    exhausted budget.  Dead rows write seg=0 rows (masked, overwritten
    by the slot's next occupant).  ``sampling`` statically selects the
    per-row temperature/top-p program (temps/top_ps/keys [B]/[B]/[B,2];
    greedy rows keep temp=0 and take argmax regardless of RNG, so the
    greedy-only program never pays the vocab sort).  ``pos_off`` [B]:
    per-row RoPE position offset added to the cache length (0 for every
    family except qwen2_vl, whose M-RoPE shifts text decode positions
    by the prompt's vision-span compression delta; all three M-RoPE
    axes advance together in text decode, so a scalar per row suffices
    — llama.rope_cos_sin treats equal axes identically to standard
    RoPE).  Returns (out [B, chunk], new toks, live, remaining, keys,
    cache).
    """
    def is_eos(t):
        return jnp.any(t[:, None] == eos_ids[None, :], axis=-1)

    def step(carry, _):
        cache, tok, live, remaining, keys = carry
        seg = live.astype(jnp.int32)[:, None]
        logits, _, cache = model_forward(
            params, model_cfg, input_ids=tok[:, None],
            pixel_values=None,
            positions=(cache.length + pos_off)[:, None] * seg,
            segment_ids=seg, kv_cache=cache)
        # forward advanced every row's length by 1; only live rows
        # actually wrote a valid (seg=1) position
        cache = dataclasses.replace(
            cache, length=cache.length - 1 + live.astype(jnp.int32))
        last = logits[:, -1].astype(jnp.float32)
        if sampling:
            split = jax.vmap(jax.random.split)(keys)
            keys, use = split[:, 0], split[:, 1]
            nxt = _sample_rows(use, last, temps, top_ps)
        else:
            nxt = jnp.argmax(last, -1).astype(jnp.int32)
        nxt = jnp.where(live, nxt, pad_id)
        remaining = remaining - live.astype(jnp.int32)
        live = live & ~is_eos(nxt) & (remaining > 0)
        return (cache, nxt, live, remaining, keys), nxt

    (cache, tok, live, remaining, keys), out = jax.lax.scan(
        step, (cache, toks, live, remaining, keys), None, length=chunk)
    return out.T, tok, live, remaining, keys, cache


@functools.partial(
    jax.jit,
    static_argnames=("model_forward", "model_cfg", "chunk", "k", "ngram",
                     "pad_id", "sampling"),
    donate_argnames=("cache", "bufs"))
def _spec_decode_chunk_jit(params, cache: KVCache, bufs, toks, live,
                           remaining, eos_ids, temps, top_ps, keys, *,
                           model_forward, model_cfg, chunk, k, ngram,
                           pad_id, sampling=False):
    """``chunk`` fused SPECULATIVE verify-steps over every slot at once
    (continuous batching composed with the fused speculative loop of
    generation/speculative.py).

    Each step drafts up to ``k`` tokens per row by prompt-lookup over
    the row's token-history buffer (a vectorized n-gram match — VPU
    noise), verifies ``[pending ++ drafts]`` for ALL rows in ONE
    (k+1)-token forward (per-row cache writes/positions, the same
    machinery as the 1-token chunk), accepts per-row the longest prefix
    matching the model's own greedy choice, rewinds per-row lengths
    past rejected slots, and retires rows in-graph.  A row emits
    between 1 and k+1 tokens per verify step at the HBM cost of ~one
    decode step (weights dominate), so aggregate throughput rises with
    draft acceptance and the worst case tracks the greedy chunk.

    Sampling rows (temp>0) draft nothing and sample exactly one token
    per verify step — one key split per emitted token, so their streams
    are deterministic in (seed, prompt) and identical to the greedy
    engine's cadence.  Greedy rows accept drafts even inside the
    sampling program.

    bufs [B, T]: per-row token history (prompt + generated, including
    the pending token at index length[row]); invariant: row token count
    == cache.length[row] + 1.  Returns (out [B, chunk, k+1] emitted
    tokens pad-masked past the per-row count, counts [B, chunk], toks,
    live, remaining, keys, cache, bufs).
    """
    from mantis_tpu.generation.speculative import prompt_lookup_draft_jax

    k1 = k + 1
    b = toks.shape[0]

    def is_eos(t):
        return jnp.any(t[..., None] == eos_ids, axis=-1)

    def step(carry, _):
        cache, tok, live, remaining, keys, bufs = carry
        lens = cache.length                      # [B] KV-written counts
        buf_len = lens + 1                       # + the pending token
        drafts, dlen = jax.vmap(
            lambda row, n: prompt_lookup_draft_jax(
                row, n, n_draft=k, ngram=ngram))(bufs, buf_len)
        if sampling:
            dlen = jnp.where(temps > 0, 0, dlen)
        chunk_ids = jnp.concatenate([tok[:, None], drafts], axis=1)
        seg = jnp.broadcast_to(live.astype(jnp.int32)[:, None], (b, k1))
        positions = (lens[:, None] + jnp.arange(k1)[None, :]) * seg
        logits, _, cache = model_forward(
            params, model_cfg, input_ids=chunk_ids, pixel_values=None,
            positions=positions, segment_ids=seg, kv_cache=cache,
            cache_attention=True)
        lf = logits.astype(jnp.float32)          # [B, k1, V]
        g = jnp.argmax(lf, -1).astype(jnp.int32)
        if sampling:
            split = jax.vmap(jax.random.split)(keys)
            keys2, use = split[:, 0], split[:, 1]
            s0 = _sample_rows(use, lf[:, 0], temps, top_ps)
            keys = jnp.where((temps > 0)[:, None], keys2, keys)
            g = g.at[:, 0].set(jnp.where(temps > 0, s0, g[:, 0]))
        idx = jnp.arange(k)[None, :]
        ok = ((idx < dlen[:, None]) & (drafts == g[:, :k])
              & ~is_eos(g[:, :k]) & (idx < (remaining[:, None] - 1)))
        a = jnp.sum(jnp.cumprod(ok.astype(jnp.int32), axis=1), axis=1)
        a = jnp.where(live, a, 0)
        n_emit = jnp.where(live, a + 1, 0)
        # the forward advanced every row by k1; rewind to the accepted
        # prefix (stale KV past the new length stays causally masked)
        cache = dataclasses.replace(cache, length=lens + n_emit)
        nxt = jnp.take_along_axis(g, a[:, None], axis=1)[:, 0]
        nxt = jnp.where(live, nxt, pad_id)
        remaining = remaining - n_emit
        live = live & ~is_eos(nxt) & (remaining > 0)
        emit_mask = jnp.arange(k1)[None, :] < n_emit[:, None]
        out_toks = jnp.where(emit_mask, g, pad_id)
        bufs = jax.vmap(
            lambda row, gi, o: jax.lax.dynamic_update_slice(
                row, gi, (o,)))(bufs, g, buf_len)
        return (cache, nxt, live, remaining, keys, bufs), \
            (out_toks, n_emit)

    (cache, tok, live, remaining, keys, bufs), (out, counts) = \
        jax.lax.scan(step, (cache, toks, live, remaining, keys, bufs),
                     None, length=chunk)
    # out [chunk, B, k1] -> [B, chunk, k1]; counts [chunk, B] -> [B, chunk]
    return (out.transpose(1, 0, 2), counts.T, tok, live, remaining,
            keys, cache, bufs)


# ---------------------------------------------------------------------------
# engine
# ---------------------------------------------------------------------------

def _plan_pieces(n: int, runs, chunk: int):
    """[(start, end)] covering [0, n) in ~chunk-token pieces that never
    split an image-token run; a run longer than ``chunk`` becomes its
    own piece (image features merge by cumsum WITHIN a forward, so a
    split run would pair patches with the wrong image)."""
    pieces, p = [], 0
    while p < n:
        q = min(p + chunk, n)
        for (s, e) in runs:
            if s < q < e:
                q = s if s > p else min(e, n)
                break
        pieces.append((p, q))
        p = q
    return pieces


class _Request:
    def __init__(self, ids: List[int], pixel_values, max_new: int,
                 temperature: float = 0.0, top_p: float = 1.0,
                 seed: Optional[int] = None, stream: bool = False,
                 media_fn=None, pos_offset: int = 0):
        self.ids = ids
        self.pixel_values = pixel_values
        # media_fn(bucket) -> media pytree sized to the prefill bucket,
        # for archs whose prefill extras depend on the padded length
        # (qwen2_vl M-RoPE position tables); overrides pixel_values at
        # admission when set
        self.media_fn = media_fn
        # per-row RoPE offset for decode steps (qwen2_vl rope_delta)
        self.pos_offset = int(pos_offset)
        self.max_new = max_new
        self.temperature = float(temperature)
        self.top_p = float(top_p)
        self.seed = seed
        self.tokens: List[int] = []
        self.error: Optional[Exception] = None
        self.done = threading.Event()
        # set by the consumer (e.g. a stop-sequence hit) — the scheduler
        # retires the slot at the next chunk boundary
        self.cancelled = False
        # streaming consumers drain tokens as they are delivered;
        # None is the end-of-stream sentinel
        self.stream_q: Optional["queue.Queue"] = (
            queue.Queue() if stream else None)

    @property
    def sampling(self) -> bool:
        return self.temperature > 0.0


class _Slot:
    __slots__ = ("req", "generated")

    def __init__(self, req: _Request):
        self.req = req
        self.generated = 0


class ContinuousBatchingEngine:
    """Shared decode scheduler over one model (MantisLlava-style:
    cfg/params/processor/pick_conversation/cache_dtype)."""

    def __init__(self, model, max_slots: int = 8, slot_ctx: int = 2048,
                 chunk_tokens: int = 8,
                 prefill_buckets=(64, 128, 256, 512, 1024, 2048),
                 max_admits_per_chunk: int = 2,
                 max_cached_prefixes: int = 2,
                 min_prefix_tokens: int = 32,
                 spec_tokens: int = 0, spec_ngram: int = 3,
                 prefill_chunk: int = 0, forward=None, eos_ids=None):
        """``forward``/``eos_ids`` generalize the engine beyond the
        flagship: any forward with the shared contract
        (input_ids/pixel_values/positions/segment_ids/kv_cache ->
        (logits, loss, cache), llama-style per-row cache lengths) can
        drive it — see GenericEngineAdapter."""
        from mantis_tpu.models.mllava import model as mllava_model

        self.model = model
        self.forward = forward if forward is not None \
            else mllava_model.forward
        self.max_slots = max_slots
        self.slot_ctx = slot_ctx
        self.chunk_tokens = chunk_tokens
        # speculative verify-steps inside the shared decode chunk
        # (greedy rows draft spec_tokens by prompt-lookup; 0 = off)
        self.spec_tokens = spec_tokens
        self.spec_ngram = spec_ngram
        # chunked prefill: admit prompts longer than this in pieces,
        # running a decode chunk for co-residents between pieces so
        # live streams stall at most one piece per admission (0 = off,
        # whole-prompt prefill)
        self.prefill_chunk = prefill_chunk
        # a bucket longer than slot_ctx could never be inserted
        self.prefill_buckets = tuple(
            b for b in sorted(prefill_buckets) if b <= slot_ctx)
        assert self.prefill_buckets, \
            f"no prefill bucket fits slot_ctx={slot_ctx}"
        # head-of-line bound: live streams stall for at most this many
        # batch-1 prefills between decode chunks (a burst of arrivals
        # would otherwise freeze every co-resident decode while the
        # whole queue prefills)
        self.max_admits_per_chunk = max_admits_per_chunk
        # prefix cache: the last N prompts' scratch KV caches, reused
        # for new prompts sharing a (tokens + image bytes) prefix —
        # only the suffix is prefilled (0 = off)
        self.max_cached_prefixes = max_cached_prefixes
        self.min_prefix_tokens = min_prefix_tokens
        self.prefix_store: List[dict] = []   # engine-thread only
        self.counters = {"prefills": 0, "decode_chunks": 0,
                         "tokens_out": 0, "requests": 0,
                         "chunk_slot_steps": 0, "prefix_hits": 0,
                         "prefix_tokens_reused": 0,
                         "spec_extra_tokens": 0,
                         "prefill_pieces": 0, "prefill_batches": 0}
        if eos_ids is None:
            _, eos_ids = model.pick_conversation()
        self.eos_ids = jnp.asarray(
            list(eos_ids) or [model.processor.tokenizer.eos_token_id],
            jnp.int32)
        self.pad_id = int(model.processor.tokenizer.pad_token_id or 0)

        cache = KVCache.create(model.cfg.text_config, max_slots,
                               slot_ctx, dtype=model.cache_dtype)
        self.cache = dataclasses.replace(
            cache, length=jnp.zeros((max_slots,), jnp.int32))
        self.toks = jnp.full((max_slots,), self.pad_id, jnp.int32)
        self.live = jnp.zeros((max_slots,), bool)
        self.remaining = jnp.zeros((max_slots,), jnp.int32)
        # per-slot sampling state; temp=0 rows are greedy inside the
        # sampling program, so stale values in freed slots are inert
        self.temps = jnp.zeros((max_slots,), jnp.float32)
        self.top_ps = jnp.ones((max_slots,), jnp.float32)
        self.keys = jnp.zeros((max_slots, 2), jnp.uint32)
        # per-slot RoPE decode offset (qwen2_vl M-RoPE delta; 0 = plain)
        self.pos_off = jnp.zeros((max_slots,), jnp.int32)
        self._auto_seed = 0
        # per-row token-history buffers for in-graph prompt-lookup;
        # sized so the k1-token buffer write never clamps
        self.buf_t = slot_ctx + spec_tokens + 2
        self.bufs = (jnp.full((max_slots, self.buf_t), self.pad_id,
                              jnp.int32) if spec_tokens else None)

        self.slots: List[Optional[_Slot]] = [None] * max_slots
        self.pending: "queue.Queue[_Request]" = queue.Queue()
        self._wake = threading.Event()
        self._hold_admission = False
        self._stop = False
        # host-side copy: _deliver runs per live slot per chunk and
        # must not pay a device fetch each time
        self._eos_host = frozenset(
            int(t) for t in np.asarray(self.eos_ids))
        self._counter_lock = threading.Lock()
        # set to the fatal exception if the scheduler thread dies;
        # submit_ids refuses new work once set
        self._dead: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------------
    def submit_ids(self, ids: List[int], pixel_values, max_new: int,
                   temperature: float = 0.0, top_p: float = 1.0,
                   seed: Optional[int] = None,
                   stream: bool = False, media_fn=None,
                   pos_offset: int = 0) -> _Request:
        # speculative verify chunks need spec_tokens+1 KV headroom past
        # the last decoded position (same invariant as the single-stream
        # speculative loop)
        need = len(ids) + max_new + 1 + self.spec_tokens
        if need > self.slot_ctx:
            raise ValueError(
                f"prompt {len(ids)} + max_new {max_new} exceeds "
                f"slot_ctx {self.slot_ctx}")
        if len(ids) > max(self.prefill_buckets):
            raise ValueError(
                f"prompt {len(ids)} exceeds the largest prefill bucket "
                f"{max(self.prefill_buckets)}")
        if not 0.0 < top_p <= 1.0:
            raise ValueError(f"top_p must be in (0, 1], got {top_p}")
        if (pos_offset != 0 or media_fn is not None) and self.spec_tokens:
            # the spec verify chunk builds its own position table and
            # does not carry the per-row offset — refuse loudly rather
            # than decode with wrong RoPE positions.  media_fn implies
            # an M-RoPE-style family even when its delta happens to be
            # 0, so it is refused on the same grounds.
            raise ValueError(
                "pos_offset / media_fn (M-RoPE) does not compose with "
                "spec_tokens")
        if media_fn is not None and (self.max_cached_prefixes
                                     or self.prefill_chunk):
            raise ValueError(
                "media_fn (bucket-shaped prefill media) does not "
                "compose with the prefix cache or chunked prefill")
        if self._dead is not None:
            raise RuntimeError(
                f"engine scheduler died: {self._dead!r}")
        req = _Request(list(ids), pixel_values, max_new,
                       temperature=temperature, top_p=top_p, seed=seed,
                       stream=stream, media_fn=media_fn,
                       pos_offset=pos_offset)
        with self._counter_lock:   # += on a dict entry is not atomic
            self.counters["requests"] += 1
        self.pending.put(req)
        self._wake.set()
        return req

    @contextlib.contextmanager
    def hold_admission(self):
        """Buffer submissions without admitting until the block exits.

        Every request submitted inside the block reaches the scheduler's
        queue but ``_admit`` is a no-op until release, so on exit the
        whole burst is visible to ONE admission pass and same-bucket
        text-only requests deterministically coalesce into ONE batched
        prefill (``_admit_batch``).  Without this, a concurrent burst
        races the scheduler thread: it may drain 1..k requests per pass
        depending on thread wake-up order, splitting the burst into
        arbitrary (kpad, bucket) program shapes — which is exactly the
        nondeterminism that left batched-prefill compiles inside
        bench.py's timed serving window in round 3 (BENCH_r03: 56.1
        tok/s vs the 195+ measured with warm programs)."""
        self._hold_admission = True
        try:
            yield
        finally:
            self._hold_admission = False
            self._wake.set()

    def stats(self) -> dict:
        """Occupancy + throughput counters (served as /v1/metrics).

        ``mean_live_per_chunk_step`` is the effective decode batch:
        delivered decode tokens / decode steps executed (prefill first
        tokens excluded) — 1.0 means the engine ran serial, max_slots
        means every step advanced a full batch."""
        occ = sum(s is not None for s in self.slots)
        c = dict(self.counters)
        steps = c.pop("chunk_slot_steps")
        decode_toks = max(c["tokens_out"] - c["prefills"], 0)
        return {**c, "occupancy": occ, "max_slots": self.max_slots,
                "queue_depth": self.pending.qsize(),
                "decode_steps": steps,
                "mean_live_per_chunk_step":
                    round(decode_toks / steps, 3) if steps else 0.0}

    def generate_sync(self, ids, pixel_values, max_new,
                      timeout: float = 600.0, **sampling) -> List[int]:
        req = self.submit_ids(ids, pixel_values, max_new, **sampling)
        if not req.done.wait(timeout):
            # stop spending decode chunks on a result nobody will read
            req.cancelled = True
            self._wake.set()
            raise TimeoutError("engine request timed out")
        if req.error is not None:
            raise req.error
        return req.tokens

    def generate_stream(self, ids, pixel_values, max_new,
                        timeout: float = 600.0, **sampling):
        """Yield token ids as the scheduler produces them; raises the
        request's error (if any) after the stream drains.  Abandoning
        the generator cancels the request (the slot frees at the next
        chunk boundary)."""
        req = self.submit_ids(ids, pixel_values, max_new, stream=True,
                              **sampling)
        try:
            yield from self._drain_stream(req, timeout)
        finally:
            if not req.done.is_set():
                req.cancelled = True
                self._wake.set()

    def _drain_stream(self, req: _Request, timeout: float):
        while True:
            try:
                t = req.stream_q.get(timeout=timeout)
            except queue.Empty:
                raise TimeoutError(
                    "engine stream stalled") from None
            if t is None:
                break
            yield t
        if req.error is not None:
            raise req.error

    def shutdown(self):
        self._stop = True
        self._wake.set()
        self._thread.join(timeout=30.0)
        # waiters on queued/live requests must not block to their own
        # timeouts after the scheduler is gone
        self._fail_all(RuntimeError("engine shut down"))
        self._thread.join(timeout=30)

    # ------------------------------------------------------------------
    def _bucket_for(self, n: int) -> int:
        for b in self.prefill_buckets:
            if n <= b:
                return b
        raise ValueError(f"prompt length {n} exceeds buckets")

    # -------------------------- prefix cache --------------------------
    @staticmethod
    def _image_hashes(pixel_values) -> List[str]:
        """Content hashes per image: the match key must include image
        bytes — two prompts with identical <image> placeholder tokens
        but different pictures must NOT share KV."""
        if pixel_values is None:
            return []
        import hashlib

        arr = np.asarray(pixel_values)
        return [hashlib.md5(np.ascontiguousarray(a).tobytes())
                .hexdigest() for a in arr]

    def _image_runs(self, ids: List[int]):
        """[(start, end)] of each consecutive image-token span."""
        tpi = self.model.cfg.num_image_tokens
        itok = self.model.cfg.image_token_index
        runs, i = [], 0
        while i < len(ids):
            if ids[i] == itok:
                runs.append((i, min(i + tpi, len(ids))))
                i += tpi
            else:
                i += 1
        return runs

    def _match_prefix(self, ids: List[int], hashes: List[str]):
        """Longest stored (tokens + image bytes) prefix usable for
        ``ids`` -> (match_len, entry) or (0, None).  The match never
        splits an image-token span, keeps >=1 suffix token (the next-
        token logits come from the suffix forward), and requires every
        prefix image's bytes to equal the stored prompt's."""
        runs = self._image_runs(ids)
        best_m, best_e = 0, None
        for entry in self.prefix_store:
            eids = entry["ids"]
            lim = min(len(ids) - 1, len(eids))
            m = 0
            while m < lim and ids[m] == eids[m]:
                m += 1
            while True:   # each clamp strictly decreases m
                n_img, clamped = 0, False
                for (s, e) in runs:
                    if e <= m:
                        n_img += 1
                    elif s < m:
                        m, clamped = s, True   # straddling span
                        break
                if clamped:
                    continue
                bad = [i for i in range(n_img)
                       if hashes[i] != entry["hashes"][i]]
                if not bad:
                    break
                m = runs[bad[0]][0]
            if m > best_m:
                best_m, best_e = m, entry
        if best_m < self.min_prefix_tokens:
            return 0, None
        return best_m, best_e

    def _store_prefix(self, ids: List[int], hashes: List[str],
                      cache: KVCache, bucket: int):
        """LRU-keep the last N prompts' scratch caches (engine thread
        only).  A stored prompt seeds ANY future prompt sharing a
        prefix — KV of token i depends only on tokens <= i."""
        if not self.max_cached_prefixes:
            return
        for e in self.prefix_store:
            if e["ids"] == ids:
                self.prefix_store.remove(e)
                e.update(cache=cache, bucket=bucket)
                self.prefix_store.insert(0, e)
                return
        self.prefix_store.insert(0, dict(
            ids=list(ids), hashes=hashes, cache=cache, bucket=bucket))
        del self.prefix_store[self.max_cached_prefixes:]

    def _plan_prefix_reuse(self, ids: List[int], hashes: List[str]):
        """-> (match_len, entry, sbucket, tbucket, n_prefix_imgs) or
        None when no stored prefix helps.

        tbucket is the prompt's natural bucket; the suffix chunk must
        land inside it ([mlen, mlen+sbucket) <= tbucket), so the reused
        prefix shrinks to tbucket - sbucket when the match runs too
        close to the bucket edge (smallest viable sbucket wins)."""
        mlen, entry = self._match_prefix(ids, hashes)
        if entry is None:
            return None
        n = len(ids)
        tbucket = self._bucket_for(n)
        runs = self._image_runs(ids)
        for sbucket in self.prefill_buckets:
            m = min(mlen, tbucket - sbucket)
            if m <= 0:
                break          # suffix chunk fills the whole bucket
            for (s, e) in runs:
                if s < m < e:  # never split an image span
                    m = s
                    break
            if m >= self.min_prefix_tokens and n - m <= sbucket:
                n_pref = sum(1 for (_, e) in runs if e <= m)
                return m, entry, sbucket, tbucket, n_pref
        return None

    def _admit_one(self, req: _Request, slot_idx: int):
        model = self.model
        n = len(req.ids)
        kp, kd = self._sampling_keys(req)
        temp = jnp.asarray(req.temperature, jnp.float32)
        top_p = jnp.asarray(req.top_p, jnp.float32)
        hashes, plan = [], None
        if self.max_cached_prefixes:
            hashes = self._image_hashes(req.pixel_values)
            plan = self._plan_prefix_reuse(req.ids, hashes)
        try:
            if plan is not None:
                mlen, entry, sbucket, tbucket, n_pref = plan
                suffix = req.ids[mlen:] + [self.pad_id] * (
                    sbucket - (n - mlen))
                pix_sfx = None
                if req.pixel_values is not None:
                    rest = np.asarray(req.pixel_values)[n_pref:]
                    if len(rest):
                        pix_sfx = jnp.asarray(rest)
                tok0, scratch = _prefill_suffix_jit(
                    model.params, entry["cache"],
                    jnp.asarray([suffix]), pix_sfx,
                    jnp.asarray(mlen, jnp.int32),
                    jnp.asarray(n - mlen, jnp.int32), temp, top_p, kp,
                    model_forward=self.forward, model_cfg=model.cfg,
                    cache_dtype=model.cache_dtype,
                    pbucket=entry["bucket"], tbucket=tbucket,
                    sbucket=sbucket, sampling=req.sampling)
                self.counters["prefix_hits"] += 1
                self.counters["prefix_tokens_reused"] += mlen
                bucket = tbucket
            elif self.prefill_chunk and n > self.prefill_chunk:
                bucket = self._bucket_for(n)
                tok0, scratch = self._prefill_chunked(
                    req, bucket, temp, top_p, kp)
            else:
                bucket = self._bucket_for(n)
                padded = req.ids + [self.pad_id] * (bucket - n)
                pix = None
                if req.media_fn is not None:
                    # bucket-sized media (qwen2_vl M-RoPE tables must
                    # match the padded prefill shape)
                    pix = jax.tree.map(jnp.asarray, req.media_fn(bucket))
                elif req.pixel_values is not None:
                    # plain array (mllava) or a media pytree (generic
                    # adapters: pixel_values + per-arch extras)
                    pix = jax.tree.map(jnp.asarray, req.pixel_values)
                tok0, scratch = _prefill_jit(
                    model.params, jnp.asarray([padded]), pix,
                    jnp.asarray(n, jnp.int32), temp, top_p, kp,
                    model_forward=self.forward, model_cfg=model.cfg,
                    cache_dtype=model.cache_dtype, bucket=bucket,
                    sampling=req.sampling)
        except Exception as e:
            req.error = e
            self._finish(req)
            return
        self.counters["prefills"] += 1
        self._store_prefix(req.ids, hashes, scratch, bucket)
        self.cache = _insert_slot_jit(
            self.cache, scratch, jnp.asarray(slot_idx, jnp.int32),
            jnp.asarray(n, jnp.int32))
        self._activate_slot(req, slot_idx, int(tok0), kd)

    def _activate_slot(self, req: _Request, slot_idx: int, first: int,
                       kd):
        """Post-prefill host bookkeeping shared by single and batched
        admission: slot record, first-token delivery, per-row decode
        state."""
        slot = _Slot(req)
        self.slots[slot_idx] = slot
        self._deliver(slot_idx, [first])
        if self.slots[slot_idx] is None:   # single-token reply (eos)
            return
        self.toks = self.toks.at[slot_idx].set(first)
        self.live = self.live.at[slot_idx].set(True)
        self.remaining = self.remaining.at[slot_idx].set(
            req.max_new - 1)
        if self.spec_tokens:
            n = len(req.ids)
            row = np.full(self.buf_t, self.pad_id, np.int32)
            row[:n] = req.ids
            row[n] = first
            self.bufs = self.bufs.at[slot_idx].set(jnp.asarray(row))
        self.temps = self.temps.at[slot_idx].set(req.temperature)
        self.top_ps = self.top_ps.at[slot_idx].set(req.top_p)
        self.keys = self.keys.at[slot_idx].set(kd)
        self.pos_off = self.pos_off.at[slot_idx].set(req.pos_offset)

    def _sampling_keys(self, req: _Request):
        """(prefill key, decode key) for a request; greedy requests get
        inert zero keys (the greedy program compiles without sampling
        ops, and greedy rows take argmax even in the sampling one)."""
        if req.sampling:
            seed = req.seed
            if seed is None:
                self._auto_seed += 1
                seed = self._auto_seed
            return jax.random.split(jax.random.PRNGKey(seed))
        z = jnp.zeros((2,), jnp.uint32)
        return z, z

    def _admit_batch(self, pairs, bucket: int):
        """Admit k same-bucket TEXT-ONLY requests with ONE batched
        prefill forward + ONE batched slot insert (vs one dispatch
        pair per request): a burst of arrivals — the engine-backed
        eval workload — pays one RTT + one weight read.  Only taken
        when the prefix cache is off (per-row scratch caches are not
        stored) and no request needs chunked prefill.

        The batch is padded up a power-of-two ladder so XLA compiles
        one program per (bucket, padded-k) instead of one per burst
        size; dummy rows (1 pad token) come FIRST and alias the first
        real slot, whose real row overwrites them in the ascending
        insert loop."""
        k = len(pairs)
        kpad = 2
        while kpad < k:
            kpad *= 2
        pad_rows = kpad - k
        ids = np.full((kpad, bucket), self.pad_id, np.int32)
        lens = [1] * pad_rows
        temps = [0.0] * pad_rows
        tps = [1.0] * pad_rows
        zero_key = jnp.zeros((2,), jnp.uint32)
        kps = [zero_key] * pad_rows
        slots = [pairs[0][1]] * pad_rows
        kds = []
        sampling = any(r.sampling for r, _ in pairs)
        for j, (req, slot_idx) in enumerate(pairs):
            n = len(req.ids)
            ids[pad_rows + j, :n] = req.ids
            lens.append(n)
            temps.append(req.temperature)
            tps.append(req.top_p)
            kp, kd = self._sampling_keys(req)
            kps.append(kp)
            kds.append(kd)
            slots.append(slot_idx)
        model = self.model
        try:
            toks, scratch = _prefill_batch_jit(
                model.params, jnp.asarray(ids),
                jnp.asarray(lens, jnp.int32),
                jnp.asarray(temps, jnp.float32),
                jnp.asarray(tps, jnp.float32), jnp.stack(kps),
                model_forward=self.forward, model_cfg=model.cfg,
                cache_dtype=model.cache_dtype, bucket=bucket,
                sampling=sampling)
            self.cache = _insert_batch_jit(
                self.cache, scratch, jnp.asarray(slots, jnp.int32),
                jnp.asarray(lens, jnp.int32))
            firsts = np.asarray(toks)
        except Exception as e:
            for req, _ in pairs:
                req.error = e
                self._finish(req)
            return
        self.counters["prefills"] += k
        self.counters["prefill_batches"] += 1
        for j, (req, slot_idx) in enumerate(pairs):
            self._activate_slot(req, slot_idx,
                                int(firsts[pad_rows + j]), kds[j])

    def _prefill_chunked(self, req: _Request, tbucket: int, temp, top_p,
                         kp):
        """Admit a long prompt as a sequence of ~prefill_chunk-token
        incremental-prefill pieces into one scratch cache, running a
        decode chunk for co-resident streams between pieces — the
        admission stall per live stream drops from one full-prompt
        prefill to one piece.  Piece boundaries never split an image
        span; each piece carries exactly its own images (features merge
        positionally within a forward)."""
        model = self.model
        ids, n = req.ids, len(req.ids)
        runs = self._image_runs(ids)
        pieces = _plan_pieces(n, runs, self.prefill_chunk)
        cache = KVCache.create(model.cfg.text_config, 1, tbucket,
                               dtype=model.cache_dtype)
        pix = (None if req.pixel_values is None
               else np.asarray(req.pixel_values))
        tok0 = None
        for pi, (p, q) in enumerate(pieces):
            last = pi == len(pieces) - 1
            # cap the piece bucket to the scratch room at offset p: a
            # bucket overflowing tbucket would clamp the KV write and
            # corrupt earlier positions
            cb = min(self._bucket_for(q - p), tbucket - p)
            piece = ids[p:q] + [self.pad_id] * (cb - (q - p))
            pp = None
            if pix is not None:
                lo = sum(1 for (_, e) in runs if e <= p)
                hi = sum(1 for (_, e) in runs if e <= q)
                if hi > lo:
                    pp = jnp.asarray(pix[lo:hi])
            tok0, cache = _prefill_piece_jit(
                model.params, cache, jnp.asarray([piece]), pp,
                jnp.asarray(p, jnp.int32), jnp.asarray(q - p, jnp.int32),
                temp, top_p, kp, model_forward=self.forward,
                model_cfg=model.cfg, tbucket=tbucket, cbucket=cb,
                sampling=req.sampling, emit=last)
            self.counters["prefill_pieces"] += 1
            if not last and any(s is not None for s in self.slots):
                self._decode_once()
        return tok0, cache

    def _admit(self):
        if self._hold_admission:
            return          # a hold_admission() block is accumulating
        any_live = any(s is not None for s in self.slots)
        picked = []
        for i in range(self.max_slots):
            if self.slots[i] is not None:
                continue
            if any_live and len(picked) >= self.max_admits_per_chunk:
                break           # live streams get a decode chunk first
            try:
                req = self.pending.get_nowait()
            except queue.Empty:
                break
            if req.cancelled:
                self._finish(req)
                continue
            picked.append((req, i))
        # group text-only admissions by prefill bucket: >=2 in the same
        # bucket run as ONE batched prefill + insert (not composable
        # with the prefix cache — per-row scratches aren't stored — or
        # with chunked prefill)
        singles, groups = [], {}
        for req, i in picked:
            if (req.pixel_values is None and req.media_fn is None
                    and not self.max_cached_prefixes
                    and not (self.prefill_chunk
                             and len(req.ids) > self.prefill_chunk)):
                groups.setdefault(
                    self._bucket_for(len(req.ids)), []).append((req, i))
            else:
                singles.append((req, i))
        for bucket, pairs in groups.items():
            if len(pairs) == 1:
                singles.append(pairs[0])
            else:
                self._admit_batch(pairs, bucket)
        for req, i in singles:
            self._admit_one(req, i)

    def _deliver(self, slot_idx: int, toks: List[int]):
        """Append generated tokens to the slot's request, retiring on
        EOS or budget exhaustion."""
        slot = self.slots[slot_idx]
        eos = self._eos_host
        for t in toks:
            t = int(t)
            if slot.generated >= slot.req.max_new:
                break
            if t in eos:
                self._retire(slot_idx)
                return
            slot.req.tokens.append(t)
            slot.generated += 1
            self.counters["tokens_out"] += 1
            if slot.req.stream_q is not None:
                slot.req.stream_q.put(t)
            if slot.generated >= slot.req.max_new:
                self._retire(slot_idx)
                return

    @staticmethod
    def _finish(req: _Request):
        req.done.set()
        if req.stream_q is not None:
            req.stream_q.put(None)

    def _retire(self, slot_idx: int):
        slot = self.slots[slot_idx]
        self.slots[slot_idx] = None
        self.live = self.live.at[slot_idx].set(False)
        self._finish(slot.req)

    def _loop(self):
        try:
            while not self._stop:
                self._admit()
                for i in range(self.max_slots):
                    s = self.slots[i]
                    if s is not None and s.req.cancelled:
                        self._retire(i)
                if not any(s is not None for s in self.slots):
                    self._wake.wait(timeout=0.5)
                    self._wake.clear()
                    continue
                self._decode_once()
        except BaseException as e:   # noqa: BLE001 — a dead scheduler
            # must FAIL every waiter, not hang them until timeout
            self._dead = e
            import traceback
            traceback.print_exc()
            self._fail_all(e)

    def _fail_all(self, e: BaseException):
        for i in range(self.max_slots):
            slot = self.slots[i]
            if slot is not None:
                slot.req.error = e
                self.slots[i] = None
                self._finish(slot.req)
        while True:
            try:
                req = self.pending.get_nowait()
            except queue.Empty:
                break
            req.error = e
            self._finish(req)

    def _decode_once(self):
        """One decode chunk for every live slot (also called between
        chunked-prefill pieces so an admission stalls co-residents for
        at most one piece)."""
        model = self.model
        # static program select: greedy-only populations dispatch
        # the program with no sampling ops at all
        sampling = any(s is not None and s.req.sampling
                       for s in self.slots)
        if self.spec_tokens:
            (out, counts, self.toks, live, self.remaining,
             self.keys, self.cache, self.bufs) = \
                _spec_decode_chunk_jit(
                    model.params, self.cache, self.bufs, self.toks,
                    self.live, self.remaining, self.eos_ids,
                    self.temps, self.top_ps, self.keys,
                    model_forward=self.forward, model_cfg=model.cfg,
                    chunk=self.chunk_tokens, k=self.spec_tokens,
                    ngram=self.spec_ngram, pad_id=self.pad_id,
                    sampling=sampling)
            out_np, counts_np, live_np = jax.device_get(
                (out, counts, live))           # ONE device sync / chunk
            self.live = live
            self.counters["decode_chunks"] += 1
            self.counters["chunk_slot_steps"] += self.chunk_tokens
            self.counters["spec_extra_tokens"] += int(
                (counts_np - (counts_np > 0)).sum())
            for i in range(self.max_slots):
                if self.slots[i] is None:
                    continue
                toks: List[int] = []
                for st in range(self.chunk_tokens):
                    toks.extend(
                        out_np[i, st, :counts_np[i, st]].tolist())
                self._deliver(i, toks)
                if self.slots[i] is not None and not live_np[i]:
                    self._retire(i)
            return
        (out, self.toks, live, self.remaining, self.keys,
         self.cache) = _decode_chunk_jit(
            model.params, self.cache, self.toks, self.live,
            self.remaining, self.eos_ids, self.temps, self.top_ps,
            self.keys, self.pos_off, model_forward=self.forward,
            model_cfg=model.cfg, chunk=self.chunk_tokens,
            pad_id=self.pad_id, sampling=sampling)
        out_np, live_np = jax.device_get((out, live))  # ONE fetch
        self.live = live
        self.counters["decode_chunks"] += 1
        self.counters["chunk_slot_steps"] += self.chunk_tokens
        for i in range(self.max_slots):
            if self.slots[i] is None:
                continue
            self._deliver(i, out_np[i].tolist())
            if self.slots[i] is not None and not live_np[i]:
                # device retired it (eos/budget inside the chunk)
                # before _deliver saw the stop condition
                self._retire(i)


# ---------------------------------------------------------------------------
# adapter facade for serving/server.py
# ---------------------------------------------------------------------------

def first_stop_index(text: str, stops) -> int:
    """Index of the earliest stop-sequence occurrence, -1 if none.
    Shared by the engine's streaming holdback and the server's
    serial-adapter post-truncation, so stop-matching semantics cannot
    diverge between the two paths."""
    cuts = [i for i in (text.find(s) for s in stops) if i >= 0]
    return min(cuts) if cuts else -1


def wrap_adapter_in_engine(adapter, engine_opts=None):
    """Rebuild an eval adapter as an engine-backed one so benchmark
    drivers can co-schedule examples (--use_engine): MantisLlava-style
    adapters get EngineAdapter, GenericChat family adapters (idefics2,
    idefics3, internvl, mfuyu, videollava, ...) get
    GenericEngineAdapter.  Returns the wrapped adapter; callers own
    `wrapped.engine` and should shutdown() it when done.

    Defaults the prefix cache OFF (overridable via engine_opts):
    benchmark questions rarely share a usable prefix, and with it off a
    burst of text-only examples admits as ONE batched prefill."""
    opts = dict(engine_opts or {})
    opts.setdefault("max_cached_prefixes", 0)
    inner = getattr(adapter, "model", None)
    if inner is not None and hasattr(inner, "pick_conversation"):
        return EngineAdapter(
            inner,
            max_new_tokens=getattr(adapter, "max_new_tokens", 512),
            **opts)
    if hasattr(adapter, "gen_forward"):
        return GenericEngineAdapter(adapter, **opts)
    raise ValueError(
        "use_engine requires a MantisLlava-style or GenericChat "
        f"family adapter (got {type(adapter).__name__})")


class EngineAdapter:
    """Adapter-protocol facade (messages -> str) over a shared engine.

    Thread-safe: any number of HTTP handler threads may call it
    concurrently; the engine batches their decodes on one cache.
    Prompt rendering matches MantisTPUAdapter exactly, so replies are
    token-identical to the serial adapter's greedy output.
    """

    support_multi_image = True
    # tells serving/server.py to skip its serialization lock
    concurrent_safe = True
    # stop sequences handled here (with early slot cancellation) rather
    # than by post-truncation in the server
    supports_stop = True

    def __init__(self, model, max_new_tokens: int = 512, **engine_kw):
        self.model = model
        self.max_new_tokens = max_new_tokens
        self.engine = ContinuousBatchingEngine(model, **engine_kw)

    def _render(self, messages):
        from mantis_tpu.benchmark.adapters.chat_models import (
            expand_video_messages)

        messages = expand_video_messages(messages)
        parts, images = [], []
        for m in messages:
            if m["type"] == "image":
                images.append(m["content"])
                parts.append("<image>")
            else:
                parts.append(m["content"])
        text = "".join(parts)
        conv, _ = self.model.pick_conversation()
        conv.messages = []
        conv.append_message(conv.roles[0], text)
        conv.append_message(conv.roles[1], "")
        return conv.get_prompt(), images

    def _encode(self, messages):
        """-> (ids, media, submit_kw) — submit_kw carries per-request
        engine options (media_fn / pos_offset for M-RoPE archs)."""
        prompt, images = self._render(messages)
        enc = self.model.processor(prompt, images or None,
                                   truncation=True, max_length=None)
        ids = [int(t) for t in np.asarray(enc["input_ids"][0])]
        return ids, enc.get("pixel_values"), {}

    _first_stop = staticmethod(first_stop_index)

    def _fit_budget(self, ids, max_new: int) -> int:
        """Clamp a decode budget to what the slot can hold past this
        prompt.  The serial adapters have no static ceiling (their cache
        is sized per request), so callers like the eval protocol ask for
        4096 and rely on EOS; only a prompt that itself doesn't fit is
        an error (submit_ids still raises for that)."""
        eng = self.engine
        room = eng.slot_ctx - len(ids) - 1 - eng.spec_tokens
        return max(min(max_new, room), 1)

    def __call__(self, messages, max_new_tokens: Optional[int] = None,
                 stop=None, **sampling) -> str:
        return self.complete(messages, max_new_tokens, stop=stop,
                             **sampling)["text"]

    def complete(self, messages, max_new_tokens: Optional[int] = None,
                 stop=None, **sampling) -> dict:
        """Reply plus protocol metadata: real token counts (OpenAI
        ``usage``) and ``finish_reason`` ("stop" for EOS/stop-sequence,
        "length" when the decode budget ran out)."""
        if stop:
            # route through the streaming loop: it cancels the slot at
            # the first stop-sequence hit instead of decoding to budget
            usage = {}
            text = "".join(self.stream(
                messages, max_new_tokens, stop=stop,
                _usage_out=usage, **sampling)).strip()
            return {"text": text, **usage}
        ids, pix, sub_kw = self._encode(messages)
        budget = self._fit_budget(
            ids, max_new_tokens or self.max_new_tokens)
        toks = self.engine.generate_sync(ids, pix, budget, **sub_kw,
                                         **sampling)
        # EOS never lands in req.tokens (_deliver retires on it), so a
        # reply shorter than its budget means EOS; budget-length means
        # the decode ran out
        finish = "stop" if len(toks) < budget else "length"
        return {
            "text": self.model.processor.tokenizer.decode(
                toks, skip_special_tokens=True).strip(),
            "prompt_tokens": len(ids),
            "completion_tokens": len(toks),
            "finish_reason": finish,
        }

    def stream(self, messages, max_new_tokens: Optional[int] = None,
               stop=None, _usage_out: Optional[dict] = None,
               **sampling):
        """Yield text deltas (SSE path).  Partial-codepoint decodes
        (dangling byte-level BPE, rendered as U+FFFD) are held back
        until the next token completes them, so the concatenated deltas
        equal the non-streaming decode of the same tokens.  ``stop``
        (str or list of str): hold back len(longest stop)-1 chars,
        truncate before the first occurrence, and CANCEL the slot so
        the engine stops spending decode steps on the request."""
        ids, pix, sub_kw = self._encode(messages)
        decode = self.model.processor.tokenizer.decode
        stops = [stop] if isinstance(stop, str) else list(stop or [])
        hold = max((len(s) for s in stops), default=1) - 1
        budget = self._fit_budget(
            ids, max_new_tokens or self.max_new_tokens)
        req = self.engine.submit_ids(ids, pix, budget, stream=True,
                                     **sub_kw, **sampling)
        try:
            yield from self._drain_deltas(req, budget, ids, stops, hold,
                                          decode, _usage_out)
        finally:
            # consumer abandoned the generator (client disconnect) or
            # drained it: either way stop spending decode chunks
            if not req.done.is_set():
                req.cancelled = True
                self.engine._wake.set()

    def _drain_deltas(self, req, budget, ids, stops, hold, decode,
                      _usage_out):
        def fill_usage(finish):
            if _usage_out is not None:
                _usage_out.update(
                    prompt_tokens=len(ids), completion_tokens=len(toks),
                    finish_reason=finish)

        toks, prev, text = [], "", ""
        while True:
            try:
                t = req.stream_q.get(timeout=600.0)
            except queue.Empty:
                raise TimeoutError("engine stream stalled") from None
            if t is None:
                break
            toks.append(t)
            text = decode(toks, skip_special_tokens=True)
            if text.endswith("�"):
                continue
            if stops:
                cut = self._first_stop(text, stops)
                if cut >= 0:
                    req.cancelled = True
                    self.engine._wake.set()
                    fill_usage("stop")
                    if cut > len(prev):
                        yield text[len(prev):cut]
                    return
                limit = len(text) - hold
            else:
                limit = len(text)
            if limit > len(prev):
                yield text[len(prev):limit]
                prev = text[:limit]
        if req.error is not None:
            raise req.error
        fill_usage("stop" if len(toks) < budget else "length")
        # flush the stop holdback on normal end-of-stream (a stop hit
        # in the very last tokens still truncates)
        if text.endswith("�"):
            return
        if stops:
            cut = self._first_stop(text, stops)
            if cut >= 0:
                text = text[:cut]
        if len(text) > len(prev):
            yield text[len(prev):]


class GenericEngineAdapter(EngineAdapter):
    """Continuous batching for ANY GenericChat family adapter
    (idefics2 / idefics3 / internvl / mfuyu / videollava /
    mllava_next ...), not just the flagship.

    The engine's device programs are already arch-agnostic: they call
    a ``model_forward`` static argument with the shared contract
    (input_ids / pixel_values / positions / segment_ids / kv_cache ->
    (logits, loss, cache)) over llama-style per-row cache lengths,
    which every in-repo text tower implements (models/llama.py,
    models/persimmon.py, intern_vl).  This facade supplies the chat
    adapter's ``gen_forward`` — wrapped so per-arch media extras
    (NaViT patch masks, fuyu image patches, ...) ride the engine's
    pixel_values slot as one pytree — plus its prompt rendering and
    terminators.

    qwen2_vl serves through the same machinery: text decode advances
    all three M-RoPE axes together, so its decode positions reduce to
    the engine's scalar per-row lengths plus a per-slot ``pos_offset``
    (the prompt's vision-span compression delta), and its bucket-shaped
    M-RoPE prefill tables ride a per-request ``media_fn`` (built by
    Qwen2VLChat.engine_encode).

    Exclusions (flagship-engine-only features):
    - prefix cache / chunked prefill need ``cache_attention=True``
      incremental prefill, which only the flagship forward implements;
    - speculative drafts need (k+1)-wide cached verify forwards.
    """

    def __init__(self, chat, max_new_tokens: Optional[int] = None,
                 **engine_kw):
        for opt in ("prefill_chunk", "spec_tokens"):
            if engine_kw.get(opt):
                raise ValueError(
                    f"{opt} requires the flagship mllava engine "
                    f"(cache_attention / chunk-verify forwards)")
        engine_kw.setdefault("max_cached_prefixes", 0)
        if engine_kw["max_cached_prefixes"]:
            raise ValueError(
                "the prefix cache requires the flagship mllava engine "
                "(cache_attention suffix prefill)")
        self.chat = chat

        def fwd(params, cfg, *, input_ids, pixel_values=None,
                positions=None, segment_ids=None, kv_cache=None):
            media = (pixel_values if isinstance(pixel_values, dict)
                     else {"pixel_values": pixel_values})
            return chat.gen_forward(
                params, cfg, input_ids=input_ids,
                pixel_values=media.get("pixel_values"),
                positions=positions, segment_ids=segment_ids,
                kv_cache=kv_cache,
                **{k: v for k, v in media.items()
                   if k != "pixel_values"})

        super().__init__(
            chat,
            max_new_tokens=(max_new_tokens
                            or getattr(chat, "max_new_tokens", 512)),
            forward=fwd, eos_ids=chat.terminators(), **engine_kw)

    def _encode(self, messages):
        if hasattr(self.chat, "engine_encode"):
            # arch provides engine-aware encoding (qwen2_vl: unpadded
            # ids + bucket-shaped media_fn + M-RoPE decode offset)
            return self.chat.engine_encode(messages)
        prompt, images = self.chat.build_prompt(messages)
        ids_arr, _mask, pix, extra = self.chat.prepare_inputs(
            prompt, images)
        ids = [int(t) for t in np.asarray(ids_arr)[0]]
        media = {k: v for k, v in {"pixel_values": pix, **extra}.items()
                 if v is not None}
        return ids, (media or None), {}
