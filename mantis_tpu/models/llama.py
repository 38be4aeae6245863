"""LLaMA-family decoder in functional JAX (covers LLaMA-2/3 and Mistral).

TPU-native replacement for the reference's text backbone (the reference
delegates to HF ``transformers`` LLaMA, reference:
mantis/models/mllava/modeling_llava.py:258-260).  Design choices:

- Params are a plain pytree with **stacked layers** (leading layer axis) so
  the decoder runs as one ``lax.scan`` — fast compiles and uniform FSDP
  sharding rules.
- Prefill attention uses the Pallas flash-attention kernel with segment
  ids (packing + padding masks); decode reads a static-shape KV cache with
  an XLA dot-product attention (bandwidth-bound GEMV — no kernel needed).
- Weight layout is ``[in_features, out_features]`` (x @ W), i.e. HF
  checkpoint tensors are transposed on load (see mantis_tpu/io/hf_loader).
"""

from __future__ import annotations

import functools
import os as _os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from mantis_tpu.models.configs import LlamaConfig
from mantis_tpu.ops.flash_attention import flash_attention, mha_reference
from mantis_tpu.ops.remat import remat


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------

@struct.dataclass
class KVCache:
    """Static-shape per-layer KV cache.

    k, v: [num_layers, batch, max_len, num_kv_heads, head_dim]
    seg:  [batch, max_len] segment id of each cached position (0 = empty)
    length: scalar int32 — number of valid positions.

    ``create(dtype=jnp.int8)`` gives a quantized cache: k/v are int8
    with per-(token, head) symmetric scales (amax/127) in
    k_scale/v_scale [L, B, Hk, M] — head-major so both the XLA decode
    einsum and the fused Pallas kernel consume scale rows without a
    per-step [M, Hk] transpose.  The scales factor OUT of both
    attention dots (k's onto the logits, v's onto the probs), so the
    int8->bf16 operand convert fuses into the einsum exactly like
    weight-only quant_matmul — KV HBM reads halve and serving context
    capacity per chip roughly doubles.
    """

    k: jax.Array
    v: jax.Array
    seg: jax.Array
    length: jax.Array
    k_scale: Optional[jax.Array] = None
    v_scale: Optional[jax.Array] = None

    @classmethod
    def create(cls, cfg: LlamaConfig, batch: int, max_len: int,
               dtype=jnp.bfloat16, pad_to: int = 1) -> "KVCache":
        # pad_to=128 rounds the depth up so single-token decode stays
        # on the fused Pallas cache pass (ops/decode_attention.py
        # supports()); the pad slots are seg=0 and never attended
        max_len = -(-max_len // pad_to) * pad_to
        shape = (cfg.num_hidden_layers, batch, max_len,
                 cfg.num_key_value_heads, cfg.head_dim_)
        # distinct scale buffers: aliasing one array into both fields
        # breaks donation ("donate the same buffer twice")
        quant = dtype == jnp.int8
        sshape = (cfg.num_hidden_layers, batch,
                  cfg.num_key_value_heads, max_len)
        return cls(
            k=jnp.zeros(shape, dtype),
            v=jnp.zeros(shape, dtype),
            seg=jnp.zeros((batch, max_len), jnp.int32),
            length=jnp.zeros((), jnp.int32),
            k_scale=jnp.ones(sshape, jnp.float32) if quant else None,
            v_scale=jnp.ones(sshape, jnp.float32) if quant else None,
        )


def _quantize_kv(x):
    """[B, S, Hk, Dh] -> (int8 values, f32 per-(token, head) scales)."""
    xf = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(xf), axis=-1) / 127.0
    s = jnp.where(s == 0, 1.0, s)
    q = jnp.clip(jnp.round(xf / s[..., None]), -127, 127).astype(jnp.int8)
    return q, s


def write_kv(cache_l, scale_l, x, offset):
    """Write new k or v rows [B, S, Hk, Dh] into one layer's cache
    (quantizing when the cache is int8); returns (cache_l, scale_l).
    Scales land head-major ([B, Hk, M], see KVCache docstring).

    offset: scalar (all rows share one write position) or [B] — each
    batch row writes at its own position (continuous-batching decode,
    serving/engine.py: every slot has an independent sequence length).
    """
    per_row = getattr(offset, "ndim", 0) == 1
    if per_row:
        def upd(c, xi, o):
            return jax.lax.dynamic_update_slice(
                c, xi, (o,) + (0,) * (c.ndim - 1))
        row_dus = jax.vmap(upd)

        def upd_scale(c, si, o):   # c [Hk, M], si [Hk, S], o scalar
            return jax.lax.dynamic_update_slice(c, si, (0, o))
        row_dus_scale = jax.vmap(upd_scale)
    if cache_l.dtype == jnp.int8:
        q, s = _quantize_kv(x)
        s_hm = s.transpose(0, 2, 1)        # [B, Hk, S] head-major
        if per_row:
            return row_dus(cache_l, q, offset), \
                row_dus_scale(scale_l, s_hm, offset)
        cache_l = jax.lax.dynamic_update_slice(
            cache_l, q, (0, offset, 0, 0))
        scale_l = jax.lax.dynamic_update_slice(
            scale_l, s_hm, (0, 0, offset))
        return cache_l, scale_l
    if per_row:
        return row_dus(cache_l, x.astype(cache_l.dtype), offset), scale_l
    return jax.lax.dynamic_update_slice(
        cache_l, x.astype(cache_l.dtype), (0, offset, 0, 0)), scale_l


def _write_kv_layer(full, x, i, offset):
    """Write new rows [B, S, Hk, Dh] into layer ``i`` of the FULL
    stacked cache [L, B, M, Hk, Dh].

    The cache rides the layer scan as a CARRY (see forward): only the
    new tokens are written, in place — the xs->ys formulation copied
    the ENTIRE cache through fresh scan outputs every step (~0.4 GB
    per decoded token at flagship ctx 6k)."""
    x = x.astype(full.dtype)
    if getattr(offset, "ndim", 0) == 1:
        for bi in range(x.shape[0]):    # b is a small static batch
            full = jax.lax.dynamic_update_slice(
                full, x[bi:bi + 1][None], (i, bi, offset[bi], 0, 0))
        return full
    return jax.lax.dynamic_update_slice(
        full, x[None], (i, 0, offset, 0, 0))


def _write_scale_layer(full, s_hm, i, offset):
    """Scale twin of :func:`_write_kv_layer`: s_hm [B, Hk, S] into the
    head-major [L, B, Hk, M] scale buffer at layer ``i``."""
    s_hm = s_hm.astype(full.dtype)
    if getattr(offset, "ndim", 0) == 1:
        for bi in range(s_hm.shape[0]):
            full = jax.lax.dynamic_update_slice(
                full, s_hm[bi:bi + 1][None], (i, bi, 0, offset[bi]))
        return full
    return jax.lax.dynamic_update_slice(
        full, s_hm[None], (i, 0, 0, offset))


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init_params(cfg: LlamaConfig, key: jax.Array, dtype=jnp.float32):
    """Random-normal init (scale 0.02), mirroring HF defaults."""
    d, hq, hk, dh = (cfg.hidden_size, cfg.num_attention_heads,
                     cfg.num_key_value_heads, cfg.head_dim_)
    li, L = cfg.intermediate_size, cfg.num_hidden_layers
    keys = jax.random.split(key, 10)

    def norm(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * 0.02).astype(dtype)

    params = {
        "embed_tokens": norm(keys[0], (cfg.vocab_size, d)),
        "norm": jnp.ones((d,), dtype),
        "layers": {
            "input_layernorm": jnp.ones((L, d), dtype),
            "post_attention_layernorm": jnp.ones((L, d), dtype),
            "q_proj": norm(keys[1], (L, d, hq * dh)),
            "k_proj": norm(keys[2], (L, d, hk * dh)),
            "v_proj": norm(keys[3], (L, d, hk * dh)),
            "o_proj": norm(keys[4], (L, hq * dh, d)),
            "gate_proj": norm(keys[5], (L, d, li)),
            "up_proj": norm(keys[6], (L, d, li)),
            "down_proj": norm(keys[7], (L, li, d)),
        },
    }
    if cfg.attention_bias:
        params["layers"].update({
            "q_b": jnp.zeros((L, hq * dh), dtype),
            "k_b": jnp.zeros((L, hk * dh), dtype),
            "v_b": jnp.zeros((L, hk * dh), dtype),
        })
    if not cfg.tie_word_embeddings:
        params["lm_head"] = norm(keys[8], (d, cfg.vocab_size))
    return params


def unstack_layers(params):
    """Stacked layers dict {name: [L, ...]} -> list of L per-layer
    dicts {name: [...]}.  ``forward`` runs list-typed layers as an
    unrolled python loop (see the scan-vs-loop note there); everything
    else — init, checkpoints, sharding rules, HF load/export — stays in
    the stacked layout."""
    from mantis_tpu.ops.quant import QuantTensor

    def _slice(v, i):
        if isinstance(v, QuantTensor):   # int8/int4 serving trees
            return QuantTensor(q=v.q[i], scale=v.scale[i], bits=v.bits)
        return v[i]

    lay = params["layers"]
    if isinstance(lay, (list, tuple)):
        return params
    L = next(iter(jax.tree.leaves(
        lay, is_leaf=lambda x: isinstance(x, QuantTensor)))).shape[0]
    out = dict(params)
    out["layers"] = [
        {k: _slice(v, i) for k, v in lay.items()} for i in range(L)]
    return out


def stack_layers(params):
    """Inverse of unstack_layers (list -> stacked arrays)."""
    lay = params["layers"]
    if not isinstance(lay, (list, tuple)):
        return params
    out = dict(params)
    out["layers"] = {
        k: jnp.stack([lp[k] for lp in lay]) for k in lay[0]}
    return out


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------

def _mm(x: jax.Array, w) -> jax.Array:
    """Matmul that accepts int8/int4 QuantTensor weights (weight-only
    quantized serving: the dequant multiply fuses into the MXU input —
    TPU-native stand-in for the reference's bitsandbytes path,
    train_mllava.py:134-142)."""
    from mantis_tpu.ops.quant import QuantTensor, quant_matmul

    if isinstance(w, QuantTensor):
        return quant_matmul(x, w)
    return x @ w


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    return weight * xf.astype(dtype)


def rope_cos_sin(positions: jax.Array, head_dim: int, theta: float,
                 mrope_section=None) -> Tuple[jax.Array, jax.Array]:
    """HF-compatible rotary tables.

    Standard: positions [B, S] -> cos/sin [B, S, Dh].
    M-RoPE (Qwen2-VL): positions [3, B, S] (t/h/w); the Dh axis is split
    into 2x mrope_section chunks, chunk j taken from axis j % 3 —
    matching HF apply_multimodal_rotary_pos_emb."""
    inv_freq = 1.0 / (theta ** (
        jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [..., Dh]
    cos, sin = jnp.cos(emb), jnp.sin(emb)
    if positions.ndim == 3:
        assert mrope_section is not None, "3-D positions require mrope"
        secs = list(mrope_section) * 2
        splits_c = jnp.split(cos, np.cumsum(secs)[:-1].tolist(), axis=-1)
        splits_s = jnp.split(sin, np.cumsum(secs)[:-1].tolist(), axis=-1)
        cos = jnp.concatenate(
            [splits_c[j][j % 3] for j in range(len(secs))], axis=-1)
        sin = jnp.concatenate(
            [splits_s[j][j % 3] for j in range(len(secs))], axis=-1)
    return cos, sin


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: [B, S, H, Dh]; cos/sin: [B, S, Dh] (HF rotate_half convention)."""
    c = cos[:, :, None, :]
    s = sin[:, :, None, :]
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return (x.astype(jnp.float32) * c + rotated.astype(jnp.float32) * s
            ).astype(x.dtype)


def _decode_attention(q, k_cache, v_cache, kv_seg, q_seg, length, scale,
                      window=None, k_scale=None, v_scale=None):
    """Single/few-token attention against the KV cache.

    q: [B, Sq, Hq, Dh]; k_cache/v_cache: [B, M, Hk, Dh]; kv_seg: [B, M];
    q_seg: [B, Sq]; length: scalar or [B] — valid cache prefix per row
    (q positions are already written at [length - Sq, length)); the [B]
    form is the continuous-batching decode path (serving/engine.py).
    k_scale/v_scale [B, Hk, M] (head-major): per-(token, head) scales
    of an int8 cache; k's multiply the logits, v's fold into the probs
    — the int8->compute-dtype convert stays a fusable dot operand and
    the scale rows broadcast without a per-step transpose.
    """
    b, sq, hq, dh = q.shape
    _, m, hk, _ = k_cache.shape
    group = hq // hk
    qg = q.reshape(b, sq, hk, group, dh)
    k_in = k_cache if k_scale is None else k_cache.astype(q.dtype)
    logits = jnp.einsum(
        "bqhgd,bmhd->bhgqm", qg, k_in,
        preferred_element_type=jnp.float32) * scale
    if k_scale is not None:
        logits = logits * k_scale[:, :, None, None, :]
    pos = jnp.arange(m)
    if getattr(length, "ndim", 0) == 1:
        q_pos = length[:, None] - sq + jnp.arange(sq)[None, :]  # [B, Sq]
    else:
        q_pos = (length - sq + jnp.arange(sq))[None, :]         # [1, Sq]
    causal = pos[None, None, :] <= q_pos[:, :, None]       # [B|1, Sq, M]
    seg_ok = kv_seg[:, None, :] == q_seg[:, :, None]          # [B, Sq, M]
    mask = causal & seg_ok
    if window is not None:
        # Mistral SWA over the cache, measured in VALID positions:
        # bucketed prefill right-pads short rows with seg=0 slots,
        # which must not consume window budget (slot-index distance
        # would mask a short row's entire real prompt once its decode
        # slot sits > window past slot 0)
        valid = (kv_seg != 0).astype(jnp.int32)          # [B, M]
        vrank = jnp.cumsum(valid, axis=-1) - 1           # [B, M]
        qp = jnp.broadcast_to(q_pos, (b, sq))
        q_rank = jnp.take_along_axis(
            vrank, jnp.clip(qp, 0, m - 1).astype(jnp.int32), axis=-1)
        mask = mask & (q_rank[:, :, None] - vrank[:, None, :]
                       < window)
    logits = jnp.where(mask[:, None, None, :, :], logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    if v_scale is not None:
        probs = (probs * v_scale[:, :, None, None, :]).astype(q.dtype)
        v_in = v_cache.astype(q.dtype)
    else:
        probs = probs.astype(v_cache.dtype)
        v_in = v_cache
    out = jnp.einsum("bhgqm,bmhd->bqhgd", probs, v_in)
    return out.reshape(b, sq, hq, dh).astype(q.dtype)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def decoder_block(h, lp, *, cfg: LlamaConfig, cos, sin, segment_ids,
                  scale, attn_impl=None, context_attention=None,
                  mlp_chunk: Optional[int] = None):
    """One decoder layer on the training/prefill path (no KV cache).

    Shared by ``forward``'s layer scan and the pipeline-parallel stage
    body (parallel/pipeline.py) so the two paths cannot drift.
    h: [B, S, D]; lp: one layer's params (leading layer axis removed).
    """
    b, s, _ = h.shape
    hq, hk, dh = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim_)
    residual = h
    x = rms_norm(h, lp["input_layernorm"], cfg.rms_norm_eps)
    q = _mm(x, lp["q_proj"])
    k = _mm(x, lp["k_proj"])
    v = _mm(x, lp["v_proj"])
    if cfg.attention_bias:
        q = q + lp["q_b"]
        k = k + lp["k_b"]
        v = v + lp["v_b"]
    q = apply_rope(q.reshape(b, s, hq, dh), cos, sin)
    k = apply_rope(k.reshape(b, s, hk, dh), cos, sin)
    v = v.reshape(b, s, hk, dh)
    if context_attention is not None:
        attn = context_attention(q, k, v, segment_ids, scale)
    elif attn_impl == "xla":
        attn = mha_reference(
            q, k, v, causal=True, segment_ids=segment_ids,
            softmax_scale=scale, window_size=cfg.sliding_window)
    else:
        attn = flash_attention(
            q, k, v, causal=True, segment_ids=segment_ids,
            softmax_scale=scale, implementation=attn_impl,
            window_size=cfg.sliding_window)
    h = residual + _mm(attn.reshape(b, s, hq * dh), lp["o_proj"])
    residual = h
    x = rms_norm(h, lp["post_attention_layernorm"], cfg.rms_norm_eps)
    if mlp_chunk and mlp_chunk > 1 and s % mlp_chunk == 0:
        # sequence-CHUNKED MLP (exact: the MLP is position-independent).
        # The checkpointed body makes the scan save only each chunk's
        # input; a chunk's backward recomputes its gate/up locally, so
        # the layer-backward working set shrinks from four full
        # [b, s, intermediate] buffers (4 x 448 MB at flagship widths,
        # b2 s8192) to chunk-width ones — the knob that fits the
        # measured optimizer-in-backward full step on one 16 GB chip.
        # Cost: gate/up/down weights re-stream per chunk (~1 ms/layer/
        # chunk at 819 GB/s), ~1% of a flagship step.
        @functools.partial(
            jax.checkpoint,
            policy=jax.checkpoint_policies.nothing_saveable)
        def _mlp(x2):
            g2 = jax.nn.silu(_mm(x2, lp["gate_proj"])) * _mm(
                x2, lp["up_proj"])
            return _mm(g2, lp["down_proj"])

        xs = jnp.swapaxes(
            x.reshape(b, mlp_chunk, s // mlp_chunk, x.shape[-1]), 0, 1)
        out = jax.lax.map(_mlp, xs)
        return residual + jnp.swapaxes(out, 0, 1).reshape(
            b, s, x.shape[-1])
    gated = jax.nn.silu(_mm(x, lp["gate_proj"])) * _mm(x, lp["up_proj"])
    return residual + _mm(gated, lp["down_proj"])


def forward(
    params,
    cfg: LlamaConfig,
    *,
    input_ids: Optional[jax.Array] = None,
    inputs_embeds: Optional[jax.Array] = None,
    positions: Optional[jax.Array] = None,
    segment_ids: Optional[jax.Array] = None,
    kv_cache: Optional[KVCache] = None,
    use_remat: bool = False,
    attn_impl: Optional[str] = None,
    return_hidden: bool = False,
    context_attention=None,
    cache_attention: Optional[bool] = None,
    layer_update_hook=None,
    mlp_chunk: Optional[int] = None,
):
    """Run the decoder.

    Modes:
      - prefill / training: kv_cache is None -> flash attention over the
        sequence (causal + segment ids).  Returns (logits, None).
      - prefill-with-cache: kv_cache given and q_len > 1 -> same, but
        writes k/v into the cache starting at kv_cache.length.  NOTE:
        queries attend only within the new chunk — correct only when
        the cache was empty.
      - decode: kv_cache given and q_len small (<= 4) -> cache attention.
      - incremental prefill: ``cache_attention=True`` forces the cache
        path for ANY q_len — the chunk's queries attend to the whole
        cached history plus themselves (multi-turn KV reuse,
        generation/session.py).

    segment_ids doubles as the padding mask (0 = pad); defaults to all-1.
    """
    if inputs_embeds is None:
        inputs_embeds = params["embed_tokens"][input_ids]
    h = inputs_embeds
    b, s, d = h.shape
    if positions is None:
        # with a cache, default positions continue from the cache
        # offset (arange(s) would silently apply RoPE position 0 to
        # every decode step)
        start = (kv_cache.length if kv_cache is not None
                 else jnp.zeros((), jnp.int32))
        if getattr(start, "ndim", 0) == 1:
            positions = start[:, None] + jnp.arange(s)[None, :]
        else:
            positions = jnp.broadcast_to(
                start + jnp.arange(s)[None, :], (b, s))
        if cfg.mrope_section is not None:
            positions = jnp.broadcast_to(positions[None], (3, b, s))
    if segment_ids is None:
        segment_ids = jnp.ones((b, s), jnp.int32)

    cos, sin = rope_cos_sin(positions, cfg.head_dim_, cfg.rope_theta,
                            cfg.mrope_section)
    scale = cfg.head_dim_ ** -0.5
    hq, hk, dh = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim_)

    decode_mode = kv_cache is not None and (
        cache_attention if cache_attention is not None else s <= 4)
    offset = kv_cache.length if kv_cache is not None else None
    kv_seg_full = None
    if kv_cache is not None:
        if getattr(offset, "ndim", 0) == 1:
            # per-row lengths (continuous batching): each row's seg
            # chunk lands at its own offset
            kv_seg_full = jax.vmap(
                lambda row, seg_row, o:
                jax.lax.dynamic_update_slice(row, seg_row, (o,)))(
                kv_cache.seg, segment_ids, offset)
        else:
            kv_seg_full = jax.lax.dynamic_update_slice(
                kv_cache.seg, segment_ids, (0, offset))

    quant_cache = kv_cache is not None and kv_cache.k.dtype == jnp.int8

    def layer_fn(carry, scanned):
        h = carry if kv_cache is None else None
        k_scale_l = v_scale_l = None
        if kv_cache is not None:
            # cache path: the FULL stacked cache rides the carry and
            # only new tokens are written in place — scanning cache
            # layers as xs and emitting updated layers as ys copied
            # the whole cache (0.4 GB/token at flagship ctx 6k)
            # through fresh ys buffers every forward
            h, li, ck, cv, cks, cvs = carry
            lp = scanned
        else:
            h = decoder_block(
                h, scanned, cfg=cfg, cos=cos, sin=sin,
                segment_ids=segment_ids, scale=scale,
                attn_impl=attn_impl,
                context_attention=context_attention,
                mlp_chunk=mlp_chunk)
            return h, None
        residual = h
        x = rms_norm(h, lp["input_layernorm"], cfg.rms_norm_eps)
        q = _mm(x, lp["q_proj"])
        k = _mm(x, lp["k_proj"])
        v = _mm(x, lp["v_proj"])
        if cfg.attention_bias:
            q = q + lp["q_b"]
            k = k + lp["k_b"]
            v = v + lp["v_b"]
        q = q.reshape(b, s, hq, dh)
        k = k.reshape(b, s, hk, dh)
        v = v.reshape(b, s, hk, dh)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        if quant_cache:
            kq, ks_tok = _quantize_kv(k)
            vq, vs_tok = _quantize_kv(v)
            ck = _write_kv_layer(ck, kq, li, offset)
            cv = _write_kv_layer(cv, vq, li, offset)
            cks = _write_scale_layer(cks, ks_tok.transpose(0, 2, 1),
                                     li, offset)
            cvs = _write_scale_layer(cvs, vs_tok.transpose(0, 2, 1),
                                     li, offset)
        else:
            ck = _write_kv_layer(ck, k, li, offset)
            cv = _write_kv_layer(cv, v, li, offset)

        if decode_mode:
            # slice this layer's cache out of the carry; XLA fuses the
            # dynamic-slice into the attention reads
            k_cache_l = jax.lax.dynamic_index_in_dim(
                ck, li, 0, keepdims=False)
            v_cache_l = jax.lax.dynamic_index_in_dim(
                cv, li, 0, keepdims=False)
            if quant_cache:
                k_scale_l = jax.lax.dynamic_index_in_dim(
                    cks, li, 0, keepdims=False)
                v_scale_l = jax.lax.dynamic_index_in_dim(
                    cvs, li, 0, keepdims=False)
            # The fused Pallas decode kernel (ops/decode_attention.py)
            # is a MEASURED NEGATIVE on v5e and ships opt-in only
            # (MANTIS_DECODE_KERNEL=1): end-to-end with the carry-
            # resident cache it reaches 71.9 tok/s vs the XLA einsum's
            # 76.7 at flagship ctx 6k, and 346 vs 357 agg in 8-stream
            # serving — the per-layer pallas-call boundary costs more
            # than its flat-layout int8 MXU dots save (docs/PERF.md
            # decode-roofline section; kept wired for the record like
            # the int4 and W8A8-prefill findings).
            from mantis_tpu.ops import decode_attention as da

            lengths = offset + s
            if (s == 1 and cfg.sliding_window is None
                    and attn_impl != "xla"
                    and _os.environ.get("MANTIS_DECODE_KERNEL") == "1"
                    and da.supports(k_cache_l.shape[1])):
                attn = da.decode_attention(
                    q[:, 0], k_cache_l, v_cache_l, kv_seg_full,
                    segment_ids[:, 0],
                    jnp.broadcast_to(lengths, (b,)),
                    k_scale_l, v_scale_l, scale=scale)[:, None]
            else:
                attn = _decode_attention(
                    q, k_cache_l, v_cache_l, kv_seg_full, segment_ids,
                    lengths, scale, window=cfg.sliding_window,
                    k_scale=k_scale_l, v_scale=v_scale_l)
        elif context_attention is not None:
            # ring attention over the context mesh axis (sequence is
            # zigzag-ordered by the data layer)
            attn = context_attention(q, k, v, segment_ids, scale)
        else:
            if attn_impl == "xla":
                attn = mha_reference(
                    q, k, v, causal=True, segment_ids=segment_ids,
                    softmax_scale=scale,
                    window_size=cfg.sliding_window)
            else:
                attn = flash_attention(
                    q, k, v, causal=True, segment_ids=segment_ids,
                    softmax_scale=scale, implementation=attn_impl,
                    window_size=cfg.sliding_window)
        attn = attn.reshape(b, s, hq * dh)
        h = residual + _mm(attn, lp["o_proj"])

        residual = h
        x = rms_norm(h, lp["post_attention_layernorm"], cfg.rms_norm_eps)
        gated = jax.nn.silu(_mm(x, lp["gate_proj"])) * _mm(
            x, lp["up_proj"])
        h = residual + _mm(gated, lp["down_proj"])
        if kv_cache is not None:
            return (h, li + 1, ck, cv, cks, cvs), None
        return h, None

    layer_fn_raw = layer_fn
    if kv_cache is None:
        layer_fn = remat(layer_fn, use_remat)

    if kv_cache is not None:
        carry = (h, jnp.zeros((), jnp.int32), kv_cache.k, kv_cache.v,
                 kv_cache.k_scale, kv_cache.v_scale)
        if isinstance(params["layers"], (list, tuple)):
            # UNROLLED cache path: static layer indices let every
            # cache read/write be a static slice, and XLA can overlap
            # layer i+1's weight prefetch under layer i's compute —
            # a scan body is a while-loop iteration that HBM prefetch
            # cannot cross
            for li_static, lp in enumerate(params["layers"]):
                carry = (carry[0], li_static) + carry[2:]
                carry, _ = layer_fn(carry, lp)
            (h, _, ck, cv, cks, cvs) = carry
        else:
            (h, _, ck, cv, cks, cvs), _ = jax.lax.scan(
                layer_fn, carry, params["layers"])
        new_cache = KVCache(
            k=ck, v=cv, seg=kv_seg_full, length=offset + s,
            k_scale=cks, v_scale=cvs)
    elif isinstance(params["layers"], (list, tuple)):
        # UNROLLED layer loop over per-layer param trees (see
        # unstack_layers).  Functionally identical to the scan, but in
        # reverse-mode each layer's parameter gradient is produced at a
        # DISTINCT point of the backward pass — a scan over stacked
        # params accumulates d(params) into full-tree buffers that live
        # for the whole backward.  The optimizer-in-backward train step
        # (train/trainer.py) relies on this to consume+free each
        # layer's grad as it arrives, which is what lets a full
        # fwd+bwd+adamw program fit one 16 GB chip at flagship depth.
        lays = list(params["layers"])
        if layer_update_hook is not None:
            # optimizer-in-backward at LAYER granularity: layer dicts
            # hold (p, moments..., hyper) bundles; the hook wraps each
            # layer in a custom_vjp that recomputes the forward, updates
            # the layer's params inside its own backward, and gates the
            # activation cotangent on the updated params (train/
            # trainer.py make_layer_adamw8_hook).  Remat is implied.
            for lp in lays:
                h = layer_update_hook(layer_fn_raw, h, lp)
        elif use_remat == "pairs" and len(lays) % 2 == 0:
            # checkpoint PAIRS of layers: halves the saved layer-input
            # activations (128 MB/layer at flagship b2 s8192) for ~1.5x
            # in-pair recompute — the knob that buys the last GB for
            # the single-chip measured full-depth step
            def pair_fn(hh, lp2):
                hh, _ = layer_fn_raw(hh, lp2[0])
                hh, _ = layer_fn_raw(hh, lp2[1])
                return hh, None

            pair_fn = remat(pair_fn, "nothing")
            for i in range(0, len(lays), 2):
                h, _ = pair_fn(h, (lays[i], lays[i + 1]))
        else:
            for lp in lays:
                h, _ = layer_fn(h, lp)
        new_cache = None
    else:
        h, _ = jax.lax.scan(layer_fn, h, params["layers"])
        new_cache = None

    h = rms_norm(h, params["norm"], cfg.rms_norm_eps)
    if return_hidden:
        return h, new_cache
    if cfg.tie_word_embeddings:
        logits = h @ params["embed_tokens"].T
    else:
        logits = _mm(h, params["lm_head"])
    return logits, new_cache
