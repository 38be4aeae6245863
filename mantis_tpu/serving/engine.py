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

Greedy only: each slot's tokens are bit-identical to its batch-1
greedy decode (asserted in tests/test_engine.py) because every row's
attention/matmul math is independent of co-resident slots.

The reference has no serving stack at all (its demo is an external HF
Space, reference .gitmodules:1-3); the protocol surface this feeds is
serving/server.py.
"""

from __future__ import annotations

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

@functools.partial(
    jax.jit, static_argnames=("model_forward", "model_cfg", "cache_dtype",
                              "bucket"))
def _prefill_jit(params, ids, pixel_values, true_len, *, model_forward,
                 model_cfg, cache_dtype, bucket):
    """Batch-1 prompt prefill into a fresh bucket-sized scratch cache.

    ids [1, bucket] (padded), true_len scalar.  Returns (first greedy
    token, scratch KVCache with per-position seg validity).
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
    tok0 = jnp.argmax(last.astype(jnp.float32), -1).astype(jnp.int32)
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
    static_argnames=("model_forward", "model_cfg", "chunk", "pad_id"),
    donate_argnames=("cache",))
def _decode_chunk_jit(params, cache: KVCache, toks, live, remaining,
                      eos_ids, *, model_forward, model_cfg, chunk,
                      pad_id):
    """``chunk`` fused greedy steps over every slot at once.

    toks [B]: each live slot's pending token (sampled but not yet
    KV-written).  Each step writes the pending tokens' KV at the
    per-row lengths, samples the next token for live rows, advances
    lengths for live rows only, and retires rows in-graph on EOS or
    exhausted budget.  Dead rows write seg=0 rows (masked, overwritten
    by the slot's next occupant).  Returns (out [B, chunk], new toks,
    live, remaining, cache).
    """
    def is_eos(t):
        return jnp.any(t[:, None] == eos_ids[None, :], axis=-1)

    def step(carry, _):
        cache, tok, live, remaining = carry
        seg = live.astype(jnp.int32)[:, None]
        logits, _, cache = model_forward(
            params, model_cfg, input_ids=tok[:, None],
            pixel_values=None, positions=cache.length[:, None] * seg,
            segment_ids=seg, kv_cache=cache)
        # forward advanced every row's length by 1; only live rows
        # actually wrote a valid (seg=1) position
        cache = dataclasses.replace(
            cache, length=cache.length - 1 + live.astype(jnp.int32))
        nxt = jnp.argmax(logits[:, -1].astype(jnp.float32),
                         -1).astype(jnp.int32)
        nxt = jnp.where(live, nxt, pad_id)
        remaining = remaining - live.astype(jnp.int32)
        live = live & ~is_eos(nxt) & (remaining > 0)
        return (cache, nxt, live, remaining), nxt

    (cache, tok, live, remaining), out = jax.lax.scan(
        step, (cache, toks, live, remaining), None, length=chunk)
    return out.T, tok, live, remaining, cache


# ---------------------------------------------------------------------------
# engine
# ---------------------------------------------------------------------------

class _Request:
    def __init__(self, ids: List[int], pixel_values, max_new: int):
        self.ids = ids
        self.pixel_values = pixel_values
        self.max_new = max_new
        self.tokens: List[int] = []
        self.error: Optional[Exception] = None
        self.done = threading.Event()


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
                 max_admits_per_chunk: int = 2):
        from mantis_tpu.models.mllava import model as mllava_model

        self.model = model
        self.forward = mllava_model.forward
        self.max_slots = max_slots
        self.slot_ctx = slot_ctx
        self.chunk_tokens = chunk_tokens
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
        self.counters = {"prefills": 0, "decode_chunks": 0,
                         "tokens_out": 0, "requests": 0,
                         "chunk_slot_steps": 0}
        _, terminators = model.pick_conversation()
        self.eos_ids = jnp.asarray(
            list(terminators) or [model.processor.tokenizer.eos_token_id],
            jnp.int32)
        self.pad_id = int(model.processor.tokenizer.pad_token_id or 0)

        cache = KVCache.create(model.cfg.text_config, max_slots,
                               slot_ctx, dtype=model.cache_dtype)
        self.cache = dataclasses.replace(
            cache, length=jnp.zeros((max_slots,), jnp.int32))
        self.toks = jnp.full((max_slots,), self.pad_id, jnp.int32)
        self.live = jnp.zeros((max_slots,), bool)
        self.remaining = jnp.zeros((max_slots,), jnp.int32)

        self.slots: List[Optional[_Slot]] = [None] * max_slots
        self.pending: "queue.Queue[_Request]" = queue.Queue()
        self._wake = threading.Event()
        self._stop = False
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------------
    def submit_ids(self, ids: List[int], pixel_values,
                   max_new: int) -> _Request:
        need = len(ids) + max_new + 1
        if need > self.slot_ctx:
            raise ValueError(
                f"prompt {len(ids)} + max_new {max_new} exceeds "
                f"slot_ctx {self.slot_ctx}")
        if len(ids) > max(self.prefill_buckets):
            raise ValueError(
                f"prompt {len(ids)} exceeds the largest prefill bucket "
                f"{max(self.prefill_buckets)}")
        req = _Request(list(ids), pixel_values, max_new)
        self.counters["requests"] += 1
        self.pending.put(req)
        self._wake.set()
        return req

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
                      timeout: float = 600.0) -> List[int]:
        req = self.submit_ids(ids, pixel_values, max_new)
        if not req.done.wait(timeout):
            raise TimeoutError("engine request timed out")
        if req.error is not None:
            raise req.error
        return req.tokens

    def shutdown(self):
        self._stop = True
        self._wake.set()
        self._thread.join(timeout=30)

    # ------------------------------------------------------------------
    def _bucket_for(self, n: int) -> int:
        for b in self.prefill_buckets:
            if n <= b:
                return b
        raise ValueError(f"prompt length {n} exceeds buckets")

    def _admit_one(self, req: _Request, slot_idx: int):
        model = self.model
        n = len(req.ids)
        bucket = self._bucket_for(n)
        padded = req.ids + [self.pad_id] * (bucket - n)
        pix = None
        if req.pixel_values is not None:
            pix = jnp.asarray(req.pixel_values)
        try:
            tok0, scratch = _prefill_jit(
                model.params, jnp.asarray([padded]), pix,
                jnp.asarray(n, jnp.int32),
                model_forward=self.forward, model_cfg=model.cfg,
                cache_dtype=model.cache_dtype, bucket=bucket)
        except Exception as e:
            req.error = e
            req.done.set()
            return
        self.counters["prefills"] += 1
        self.cache = _insert_slot_jit(
            self.cache, scratch, jnp.asarray(slot_idx, jnp.int32),
            jnp.asarray(n, jnp.int32))
        first = int(tok0)
        slot = _Slot(req)
        self.slots[slot_idx] = slot
        self._deliver(slot_idx, [first])
        if self.slots[slot_idx] is None:   # single-token reply (eos)
            return
        self.toks = self.toks.at[slot_idx].set(first)
        self.live = self.live.at[slot_idx].set(True)
        self.remaining = self.remaining.at[slot_idx].set(
            req.max_new - 1)

    def _admit(self):
        admitted = 0
        any_live = any(s is not None for s in self.slots)
        for i in range(self.max_slots):
            if self.slots[i] is not None:
                continue
            if any_live and admitted >= self.max_admits_per_chunk:
                return          # live streams get a decode chunk first
            try:
                req = self.pending.get_nowait()
            except queue.Empty:
                return
            self._admit_one(req, i)
            admitted += 1

    def _deliver(self, slot_idx: int, toks: List[int]):
        """Append generated tokens to the slot's request, retiring on
        EOS or budget exhaustion."""
        slot = self.slots[slot_idx]
        eos = set(int(t) for t in np.asarray(self.eos_ids))
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
            if slot.generated >= slot.req.max_new:
                self._retire(slot_idx)
                return

    def _retire(self, slot_idx: int):
        slot = self.slots[slot_idx]
        self.slots[slot_idx] = None
        self.live = self.live.at[slot_idx].set(False)
        slot.req.done.set()

    def _loop(self):
        model = self.model
        while not self._stop:
            self._admit()
            if not any(s is not None for s in self.slots):
                self._wake.wait(timeout=0.5)
                self._wake.clear()
                continue
            out, self.toks, live, self.remaining, self.cache = \
                _decode_chunk_jit(
                    model.params, self.cache, self.toks, self.live,
                    self.remaining, self.eos_ids,
                    model_forward=self.forward, model_cfg=model.cfg,
                    chunk=self.chunk_tokens, pad_id=self.pad_id)
            out_np = np.asarray(out)           # one device sync / chunk
            live_np = np.asarray(live)
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

    def __call__(self, messages,
                 max_new_tokens: Optional[int] = None) -> str:
        prompt, images = self._render(messages)
        enc = self.model.processor(prompt, images or None,
                                   truncation=True, max_length=None)
        ids = [int(t) for t in np.asarray(enc["input_ids"][0])]
        toks = self.engine.generate_sync(
            ids, enc.get("pixel_values"),
            max_new_tokens or self.max_new_tokens)
        return self.model.processor.tokenizer.decode(
            toks, skip_special_tokens=True).strip()
