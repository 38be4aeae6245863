"""Multi-turn chat with KV-cache reuse (incremental prefill).

The reference re-prefills the whole conversation every turn
(mantis/models/mllava/utils.py:10-97 rebuilds the full prompt and calls
``generate`` on it), so turn-N TTFT grows with the entire history.
``ChatSession`` keeps one live ``KVCache`` across turns and prefills
only the NEW tokens — the previous assistant reply plus the new user
turn — attending to the cached history through the decoder's
``cache_attention=True`` incremental-prefill mode (llama.forward).

Robust to template/tokenizer boundary effects: each turn tokenizes the
full rendered prompt and re-prefills from the first token that differs
from the cached sequence (llama.cpp-style longest-common-prefix), so a
template that rewrites history only costs a deeper re-prefill, never a
wrong answer.  Works with the int8 KV cache (model.cache_dtype).

    session = ChatSession(MantisLlava.from_pretrained(path))
    print(session.send("What is in <image>?", images=[img]))
    print(session.send("And compared to the first image?"))
"""
import dataclasses
import functools
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from mantis_tpu.generation.sampler import GenerationConfig, sample_token
from mantis_tpu.models.llama import KVCache


def _common_prefix(a: List[int], b: List[int]) -> int:
    n = min(len(a), len(b))
    for i in range(n):
        if a[i] != b[i]:
            return i
    return n


@functools.partial(
    jax.jit,
    static_argnames=("model_forward", "model_cfg"),
    donate_argnames=("cache",),
)
def _extend_jit(params, delta_ids, pixel_values, start, true_len, cache,
                *, model_forward, model_cfg):
    """Prefill a (padded) delta chunk against the live cache; returns
    the logits at the last true token and the advanced cache (length
    rewound past the pad rows — they are overwritten by the next
    write and causally masked meanwhile).  true_len is dynamic so one
    compiled program serves every turn of a given bucket size."""
    b, d = delta_ids.shape
    seg = (jnp.arange(d)[None, :] < true_len).astype(jnp.int32)
    positions = (start + jnp.arange(d))[None, :] * seg
    logits, _, cache = model_forward(
        params, model_cfg, input_ids=delta_ids,
        pixel_values=pixel_values, positions=positions,
        segment_ids=seg, kv_cache=cache, cache_attention=True)
    cache = dataclasses.replace(cache, length=start + true_len)
    last = jnp.take_along_axis(
        logits, jnp.reshape(true_len - 1, (1, 1, 1)), axis=1)[:, 0]
    return last, cache


@functools.partial(
    jax.jit,
    static_argnames=("model_forward", "model_cfg", "gen_cfg", "max_new"),
    donate_argnames=("cache",),
)
def _decode_jit(params, tok0, cache, rng, *, model_forward, model_cfg,
                gen_cfg, max_new):
    """Greedy/sampled decode continuing from the live cache.

    Intentionally parallel to sampler._generate_jit's loop (which
    creates its own cache and handles batched true_lens) — changes to
    eos/done semantics must be mirrored there."""
    eos = jnp.asarray(gen_cfg.eos_token_ids, jnp.int32).reshape(1, -1) \
        if gen_cfg.eos_token_ids else None

    def is_eos(tok):
        if eos is None:
            return jnp.zeros(tok.shape, bool)
        return jnp.any(tok[:, None] == eos, axis=-1)

    out = jnp.full((1, max_new), gen_cfg.pad_token_id, jnp.int32)
    out = out.at[:, 0].set(tok0)

    def cond(state):
        step, _, _, done, _, _ = state
        return (step < max_new) & ~jnp.all(done)

    def body(state):
        step, cache, out, done, tok, rng = state
        rng, rs = jax.random.split(rng)
        pos = (cache.length)[None, None]
        logits, _, cache = model_forward(
            params, model_cfg, input_ids=tok[:, None],
            pixel_values=None, positions=pos,
            segment_ids=jnp.ones((1, 1), jnp.int32), kv_cache=cache)
        nxt = sample_token(logits[:, -1], gen_cfg, rs).astype(jnp.int32)
        nxt = jnp.where(done, gen_cfg.pad_token_id, nxt)
        out = out.at[:, step].set(nxt)
        done = done | is_eos(nxt)
        return step + 1, cache, out, done, nxt, rng

    state = (jnp.asarray(1), cache, out, is_eos(tok0), tok0, rng)
    _, cache, out, _, _, _ = jax.lax.while_loop(cond, body, state)
    return out, cache


class ChatSession:
    """Stateful multi-turn chat over a MantisLlava-style model.

    The forward defaults to the flagship mllava one; another family
    can opt in by exposing ``model.forward_fn`` with the same contract
    (cfg/params/processor/pick_conversation + ``cache_attention``
    incremental prefill)."""

    def __init__(self, model, max_ctx: int = 8192,
                 max_new_tokens: int = 512, delta_bucket: int = 64,
                 rng: Optional[jax.Array] = None):
        self.model = model
        self.max_ctx = max_ctx
        self.max_new_tokens = max_new_tokens
        self.delta_bucket = delta_bucket
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.conv, self.terminators = model.pick_conversation()
        self.conv.messages = []
        self.tokens: List[int] = []
        self.images: List = []
        self.cache = None
        self.prefilled_tokens = 0   # turn-N TTFT observability

    def _forward(self):
        fwd = getattr(self.model, "forward_fn", None)
        if fwd is not None:
            return fwd
        from mantis_tpu.models.mllava import model as mllava_model

        return mllava_model.forward

    def reset(self):
        self.conv.messages = []
        self.tokens = []
        self.images = []
        self.cache = None

    def send(self, text: str, images: Optional[list] = None,
             max_new_tokens: Optional[int] = None) -> str:
        # a failed send (context overflow, bad media) must not corrupt
        # the session: roll the turn and its images back so a retry
        # starts clean (cache rewinds are retry-safe by construction)
        n_img0 = len(self.images)
        n_msg0 = len(self.conv.messages)
        try:
            return self._send(text, images, max_new_tokens)
        except Exception:
            del self.images[n_img0:]
            del self.conv.messages[n_msg0:]
            raise

    def _send(self, text: str, images: Optional[list],
              max_new_tokens: Optional[int]) -> str:
        model = self.model
        tok = model.processor.tokenizer
        images = list(images or [])
        self.images.extend(images)
        self.conv.append_message(self.conv.roles[0], text)
        self.conv.append_message(self.conv.roles[1], "")
        prompt = self.conv.get_prompt()

        # the processor re-runs over ALL conversation images each turn
        # (their pixel rows are sliced off below) — host-side cost is
        # O(total images)/turn, acceptable for interactive sessions;
        # the numbered "(image i:)" markers need the full list anyway
        enc = model.processor(prompt, self.images or None,
                              truncation=False)
        ids = [int(t) for t in np.asarray(enc["input_ids"][0])]
        pix = enc.get("pixel_values")

        p = _common_prefix(self.tokens, ids)
        # never split an image-token block between cache and delta
        img_tok = model.cfg.image_token_index
        while p > 0 and ids[p - 1] == img_tok and p < len(ids) \
                and ids[p] == img_tok:
            p -= 1
        if self.cache is None:
            self.cache = KVCache.create(
                model.cfg.text_config, 1, self.max_ctx,
                dtype=model.cache_dtype, pad_to=128)
            p = 0
        elif p < len(self.tokens):
            # template rewrote history: rewind the cache to the
            # divergence point and re-prefill from there
            self.cache = dataclasses.replace(
                self.cache, length=jnp.asarray(p, jnp.int32))
        delta = ids[p:]
        if not delta:
            raise ValueError("empty prompt delta")
        max_new = max_new_tokens or self.max_new_tokens
        db = self.delta_bucket
        pad_n = -len(delta) % db
        # speculative decode writes (n_draft+1)-token verify chunks:
        # reserve their headroom too, or the clamped cache write would
        # silently overwrite the newest valid rows near max_ctx
        spec = getattr(model, "speculative", 0)
        headroom = spec + 1 if spec > 0 else 0
        if len(ids) + pad_n + max_new + headroom > self.max_ctx:
            raise ValueError(
                f"context {len(ids)}+{pad_n}+{max_new}+{headroom} "
                f"exceeds max_ctx {self.max_ctx}; raise max_ctx or "
                f"reset()")

        # images whose token blocks lie inside the delta, in order:
        # every block before the common prefix is already cached.
        # Count by token volume (each image is exactly num_image_tokens
        # tokens) — run-boundary counting undercounts adjacent
        # <image><image> blocks.
        n_prev = sum(1 for t in ids[:p]
                     if t == img_tok) // model.cfg.num_image_tokens
        new_pix = None
        if pix is not None and n_prev < len(self.images):
            new_pix = jnp.asarray(np.asarray(pix)[n_prev:])

        padded = delta + [tok.pad_token_id or 0] * pad_n
        self.prefilled_tokens = len(delta)
        logits, self.cache = _extend_jit(
            model.params, jnp.asarray([padded]), new_pix,
            jnp.asarray(p, jnp.int32),
            jnp.asarray(len(delta), jnp.int32), self.cache,
            model_forward=self._forward(), model_cfg=model.cfg)

        gen_cfg = GenerationConfig(
            max_new_tokens=max_new, do_sample=False,
            eos_token_ids=self.terminators,
            pad_token_id=tok.pad_token_id or 0)
        self.rng, r0, rloop = jax.random.split(self.rng, 3)
        tok0 = sample_token(logits, gen_cfg, r0).astype(jnp.int32)
        if spec > 0:
            # the serving levers compose: O(delta) turn prefill + a
            # draft/verify decode sharing the same live cache
            from mantis_tpu.generation.speculative import (
                decode_from_cache_fused)

            row, _, self.cache, n_written = decode_from_cache_fused(
                model.params, model.cfg, self._forward(), self.cache,
                len(ids), ids, int(tok0[0]), gen_cfg, n_draft=spec)
        else:
            out, self.cache = _decode_jit(
                model.params, tok0, self.cache, rloop,
                model_forward=self._forward(), model_cfg=model.cfg,
                gen_cfg=gen_cfg, max_new=max_new)
            row = [int(t) for t in np.asarray(out[0])]
            n_written = None
        eos = set(gen_cfg.eos_token_ids or ())
        stop = next((i for i, t in enumerate(row) if t in eos), len(row))
        if n_written is None:
            # self.tokens must list exactly the tokens whose KV is IN
            # the cache: _decode_jit writes the kv of each INPUT token
            # before sampling the next, so the last sampled token (the
            # eos, or the final token when max_new is hit) is never
            # written — record only the written prefix and let the next
            # turn's delta re-prefill the rest (a silently skipped slot
            # would shift every later position by one).
            n_written = stop if stop < len(row) else len(row) - 1
        reply = tok.decode(row[:stop], skip_special_tokens=True).strip()
        self.conv.messages[-1][1] = reply
        self.tokens = ids + row[:n_written]
        return reply
