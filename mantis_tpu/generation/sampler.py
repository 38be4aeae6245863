"""Jitted generation: bucketed prefill + while_loop decode with KV cache.

Replaces the reference's HF ``model.generate`` path
(reference: mantis/models/mllava/utils.py:89-93, greedy
``max_new_tokens=4096, num_beams=1`` per mllm_tools/mllava_eval.py:51-55).
Everything runs under one ``jax.jit``: prompt lengths are bucketed to
multiples of 128 so recompiles are rare; the decode loop is a
``lax.while_loop`` with early exit once every row has emitted an EOS.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mantis_tpu.models import llama
from mantis_tpu.models.llama import KVCache


@dataclasses.dataclass(frozen=True)
class GenerationConfig:
    max_new_tokens: int = 256
    do_sample: bool = False
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = 0
    eos_token_ids: Tuple[int, ...] = ()
    pad_token_id: int = 0


def _bucket(n: int, mult: int = 128) -> int:
    return ((n + mult - 1) // mult) * mult


def sample_token(logits: jax.Array, gen_cfg: GenerationConfig,
                 rng: jax.Array) -> jax.Array:
    """logits [B, V] -> token [B]."""
    if not gen_cfg.do_sample:
        return jnp.argmax(logits, axis=-1)
    logits = logits / jnp.maximum(gen_cfg.temperature, 1e-6)
    if gen_cfg.top_k > 0:
        kth = jnp.sort(logits, axis=-1)[:, -gen_cfg.top_k][:, None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if gen_cfg.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cutoff_idx = jnp.sum(cum < gen_cfg.top_p, axis=-1)
        cutoff = jnp.take_along_axis(
            sorted_logits, cutoff_idx[:, None], axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(rng, logits, axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("model_forward", "model_cfg", "gen_cfg", "max_new",
                     "cache_dtype"),
)
def _generate_jit(
    params,
    input_ids,          # [B, S] right-padded
    pixel_values,       # [N, C, H, W] or None
    true_lens,          # [B]
    rng,
    extra,              # dict of arch-specific arrays (may be empty)
    *,
    model_forward: Callable,
    model_cfg,
    gen_cfg: GenerationConfig,
    max_new: int,
    cache_dtype,
):
    b, s = input_ids.shape
    text_cfg = getattr(model_cfg, "text_config", model_cfg)
    seg = (jnp.arange(s)[None, :] < true_lens[:, None]).astype(jnp.int32)
    positions = jnp.arange(s)[None, :] * seg  # pads get position 0

    cache = KVCache.create(text_cfg, b, s + max_new, dtype=cache_dtype,
                           pad_to=128)
    logits, _, cache = model_forward(
        params, model_cfg, input_ids=input_ids, pixel_values=pixel_values,
        positions=positions, segment_ids=seg, kv_cache=cache, **extra)
    last_logits = jnp.take_along_axis(
        logits, (true_lens - 1)[:, None, None], axis=1)[:, 0]

    eos = jnp.asarray(gen_cfg.eos_token_ids, jnp.int32).reshape(1, -1) \
        if gen_cfg.eos_token_ids else None

    def is_eos(tok):
        if eos is None:
            return jnp.zeros(tok.shape, bool)
        return jnp.any(tok[:, None] == eos, axis=-1)

    rng0, rng_loop = jax.random.split(rng)
    tok0 = sample_token(last_logits, gen_cfg, rng0)
    out = jnp.full((b, max_new), gen_cfg.pad_token_id, jnp.int32)
    out = out.at[:, 0].set(tok0.astype(jnp.int32))
    done0 = is_eos(tok0)

    def cond(state):
        step, _, _, done, _, _ = state
        return (step < max_new) & ~jnp.all(done)

    def body(state):
        step, cache, out, done, tok, rng = state
        rng, rng_s = jax.random.split(rng)
        pos = (true_lens + step - 1)[:, None]
        logits, _, cache = model_forward(
            params, model_cfg, input_ids=tok[:, None].astype(jnp.int32),
            pixel_values=None, positions=pos,
            segment_ids=jnp.ones((b, 1), jnp.int32), kv_cache=cache,
            **extra)
        nxt = sample_token(logits[:, -1], gen_cfg, rng_s)
        nxt = jnp.where(done, gen_cfg.pad_token_id, nxt).astype(jnp.int32)
        out = out.at[:, step].set(nxt)   # already pad-masked above
        done = done | is_eos(nxt)
        return step + 1, cache, out, done, nxt, rng

    state = (jnp.asarray(1), cache, out, done0, tok0.astype(jnp.int32),
             rng_loop)
    _, _, out, done, _, _ = jax.lax.while_loop(cond, body, state)
    return out


def generate(
    params,
    model_cfg,
    model_forward: Callable,
    input_ids: np.ndarray,
    pixel_values: Optional[np.ndarray] = None,
    attention_mask: Optional[np.ndarray] = None,
    gen_cfg: Optional[GenerationConfig] = None,
    rng: Optional[jax.Array] = None,
    cache_dtype=jnp.bfloat16,
    extra: Optional[dict] = None,
) -> np.ndarray:
    """Host-side wrapper: bucket-pad the prompt, run the jitted loop.

    extra: arch-specific arrays forwarded to EVERY model_forward call
    (prefill and decode) — NaViT patch masks, qwen2 grids/M-RoPE inputs,
    fuyu patches.  The adapter's forward wrapper decides what applies at
    which phase (prefill has seq>1, decode seq==1 — a static property).

    Returns new tokens [B, max_new_tokens] (pad-token filled after EOS).
    """
    gen_cfg = gen_cfg or GenerationConfig()
    input_ids = np.asarray(input_ids)
    b, s = input_ids.shape
    if attention_mask is None:
        attention_mask = np.ones((b, s), np.int64)
    true_lens = attention_mask.sum(axis=1).astype(np.int32)

    sb = _bucket(s)
    ids = np.full((b, sb), gen_cfg.pad_token_id, np.int32)
    ids[:, :s] = input_ids
    if rng is None:
        rng = jax.random.PRNGKey(0)

    pv = None if pixel_values is None else jnp.asarray(pixel_values)
    extra = {k: jnp.asarray(v) for k, v in (extra or {}).items()}
    out = _generate_jit(
        params, jnp.asarray(ids), pv, jnp.asarray(true_lens), rng, extra,
        model_forward=model_forward, model_cfg=model_cfg, gen_cfg=gen_cfg,
        max_new=gen_cfg.max_new_tokens, cache_dtype=cache_dtype)
    return np.asarray(out)


# ---------------------------------------------------------------------------
# Streaming generation (host-driven decode loop)
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("model_forward", "model_cfg", "gen_cfg",
                     "cache_dtype", "bucket", "max_new"),
)
def _prefill_jit(params, input_ids, pixel_values, true_lens, rng, *,
                 model_forward, model_cfg, gen_cfg, cache_dtype, bucket,
                 max_new):
    text_cfg = getattr(model_cfg, "text_config", model_cfg)
    b, s = input_ids.shape
    seg = (jnp.arange(s)[None, :] < true_lens[:, None]).astype(jnp.int32)
    positions = jnp.arange(s)[None, :] * seg
    cache = KVCache.create(text_cfg, b, s + max_new, dtype=cache_dtype,
                           pad_to=128)
    logits, _, cache = model_forward(
        params, model_cfg, input_ids=input_ids, pixel_values=pixel_values,
        positions=positions, segment_ids=seg, kv_cache=cache)
    last = jnp.take_along_axis(
        logits, (true_lens - 1)[:, None, None], axis=1)[:, 0]
    tok = sample_token(last, gen_cfg, rng)
    return tok.astype(jnp.int32), cache


@functools.partial(
    jax.jit, static_argnames=("model_forward", "model_cfg", "gen_cfg"),
    donate_argnames=("cache",),
)
def _decode_step_jit(params, tok, pos, cache, rng, *, model_forward,
                     model_cfg, gen_cfg):
    b = tok.shape[0]
    logits, _, cache = model_forward(
        params, model_cfg, input_ids=tok[:, None], pixel_values=None,
        positions=pos[:, None], segment_ids=jnp.ones((b, 1), jnp.int32),
        kv_cache=cache)
    nxt = sample_token(logits[:, -1], gen_cfg, rng)
    return nxt.astype(jnp.int32), cache


def generate_stream(
    params, model_cfg, model_forward, input_ids, pixel_values=None,
    attention_mask=None, gen_cfg: Optional[GenerationConfig] = None,
    rng=None, cache_dtype=jnp.bfloat16,
):
    """Yields one token id (python int) at a time for batch size 1.

    TPU equivalent of the reference streaming chat
    (reference: mantis/models/mllava/utils.py:100-186,
    TextIteratorStreamer)."""
    gen_cfg = gen_cfg or GenerationConfig()
    input_ids = np.asarray(input_ids)
    assert input_ids.shape[0] == 1, "streaming supports batch size 1"
    b, s = input_ids.shape
    if attention_mask is None:
        attention_mask = np.ones((b, s), np.int64)
    true_lens = attention_mask.sum(axis=1).astype(np.int32)
    sb = _bucket(s)
    ids = np.full((b, sb), gen_cfg.pad_token_id, np.int32)
    ids[:, :s] = input_ids
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    rng, r0 = jax.random.split(rng)
    pv = None if pixel_values is None else jnp.asarray(pixel_values)
    tok, cache = _prefill_jit(
        params, jnp.asarray(ids), pv, jnp.asarray(true_lens), r0,
        model_forward=model_forward, model_cfg=model_cfg, gen_cfg=gen_cfg,
        cache_dtype=cache_dtype, bucket=sb,
        max_new=gen_cfg.max_new_tokens)
    eos = set(gen_cfg.eos_token_ids)
    t = int(tok[0])
    if t in eos:
        return
    yield t
    pos = true_lens.astype(np.int32)
    for step in range(1, gen_cfg.max_new_tokens):
        rng, rs = jax.random.split(rng)
        tok, cache = _decode_step_jit(
            params, tok, jnp.asarray(pos + step - 1), cache, rs,
            model_forward=model_forward, model_cfg=model_cfg,
            gen_cfg=gen_cfg)
        t = int(tok[0])
        if t in eos:
            return
        yield t
