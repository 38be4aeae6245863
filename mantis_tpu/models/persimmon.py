"""Persimmon decoder (the MFuyu language model), functional JAX.

TPU-native replacement for the reference's vendored Persimmon
(reference: mantis/models/mfuyu/modeling_persimmon.py).  The reference's
optional CUDA fused kernels — flash_attn layer_norm for q/k-norm
(:50-51,454-456), fused sqrelu MLP (:58,212-214), fused rotary
(:66-70) — are all plain XLA-fused ops here.

Architecture vs LLaMA: LayerNorm (with bias) everywhere, fused QKV with
per-head interleaved layout, per-head QK layer-norm, PARTIAL rotary
(first ``rotary_ndims`` dims only), biased linears, relu^2 MLP, full MHA.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mantis_tpu.models.llama import KVCache
from mantis_tpu.models.vit import layer_norm
from mantis_tpu.ops.remat import remat
from mantis_tpu.ops.flash_attention import flash_attention, mha_reference


@dataclasses.dataclass(frozen=True)
class PersimmonConfig:
    vocab_size: int = 262144
    hidden_size: int = 4096
    intermediate_size: int = 16384
    num_hidden_layers: int = 36
    num_attention_heads: int = 64
    rope_theta: float = 25000.0
    partial_rotary_factor: float = 0.5
    qk_layernorm: bool = True
    layer_norm_eps: float = 1e-5
    hidden_act: str = "relu2"
    max_position_embeddings: int = 16384
    tie_word_embeddings: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    # KVCache.create compatibility (LlamaConfig interface)
    @property
    def num_key_value_heads(self) -> int:
        return self.num_attention_heads

    @property
    def head_dim_(self) -> int:
        return self.head_dim

    @property
    def rotary_ndims(self) -> int:
        return int(self.head_dim * self.partial_rotary_factor)

    @classmethod
    def from_hf_config(cls, cfg) -> "PersimmonConfig":
        get = (cfg.get if isinstance(cfg, dict)
               else lambda k, d=None: getattr(cfg, k, d))
        return cls(
            vocab_size=get("vocab_size"),
            hidden_size=get("hidden_size"),
            intermediate_size=get("intermediate_size"),
            num_hidden_layers=get("num_hidden_layers"),
            num_attention_heads=get("num_attention_heads"),
            rope_theta=get("rope_theta", 25000.0),
            partial_rotary_factor=get("partial_rotary_factor", 0.5),
            qk_layernorm=get("qk_layernorm", True),
            layer_norm_eps=get("layer_norm_eps", 1e-5),
            hidden_act=get("hidden_act", "relu2"),
            tie_word_embeddings=get("tie_word_embeddings", False),
        )


def relu2(x):
    r = jax.nn.relu(x)
    return r * r


def init_params(cfg: PersimmonConfig, key, dtype=jnp.float32):
    d, li, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    dh = cfg.head_dim
    ks = jax.random.split(key, 8)

    def norm(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * 0.02).astype(
            dtype)

    params = {
        "embed_tokens": norm(ks[0], (cfg.vocab_size, d)),
        "final_ln_scale": jnp.ones((d,), dtype),
        "final_ln_bias": jnp.zeros((d,), dtype),
        "lm_head": norm(ks[1], (d, cfg.vocab_size)),
        "layers": {
            "ln1_scale": jnp.ones((L, d), dtype),
            "ln1_bias": jnp.zeros((L, d), dtype),
            "ln2_scale": jnp.ones((L, d), dtype),
            "ln2_bias": jnp.zeros((L, d), dtype),
            "q_proj": norm(ks[2], (L, d, d)),
            "q_b": jnp.zeros((L, d), dtype),
            "k_proj": norm(ks[3], (L, d, d)),
            "k_b": jnp.zeros((L, d), dtype),
            "v_proj": norm(ks[4], (L, d, d)),
            "v_b": jnp.zeros((L, d), dtype),
            "dense": norm(ks[5], (L, d, d)),
            "dense_b": jnp.zeros((L, d), dtype),
            "h_to_4h": norm(ks[6], (L, d, li)),
            "h_to_4h_b": jnp.zeros((L, li), dtype),
            "4h_to_h": norm(ks[7], (L, li, d)),
            "4h_to_h_b": jnp.zeros((L, d), dtype),
        },
    }
    if cfg.qk_layernorm:
        params["layers"].update({
            "q_ln_scale": jnp.ones((L, dh), dtype),
            "q_ln_bias": jnp.zeros((L, dh), dtype),
            "k_ln_scale": jnp.ones((L, dh), dtype),
            "k_ln_bias": jnp.zeros((L, dh), dtype),
        })
    return params


def _partial_rope(x, cos, sin, rotary_ndims):
    """Rotate only the first rotary_ndims dims (HF rotate_half)."""
    xr = x[..., :rotary_ndims].astype(jnp.float32)
    xp = x[..., rotary_ndims:]
    half = rotary_ndims // 2
    x1, x2 = xr[..., :half], xr[..., half:]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    c = cos[:, :, None, :]
    s = sin[:, :, None, :]
    xr = (xr * c + rot * s).astype(x.dtype)
    return jnp.concatenate([xr, xp], axis=-1)


def forward(
    params,
    cfg: PersimmonConfig,
    *,
    input_ids: Optional[jax.Array] = None,
    inputs_embeds: Optional[jax.Array] = None,
    positions: Optional[jax.Array] = None,
    segment_ids: Optional[jax.Array] = None,
    kv_cache: Optional[KVCache] = None,
    attn_impl: Optional[str] = None,
    use_remat: bool = False,
    return_hidden: bool = False,
):
    from mantis_tpu.models import llama as llama_mod

    if inputs_embeds is None:
        inputs_embeds = params["embed_tokens"][input_ids]
    h = inputs_embeds
    b, s, d = h.shape
    H, dh = cfg.num_attention_heads, cfg.head_dim
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s))
    if segment_ids is None:
        segment_ids = jnp.ones((b, s), jnp.int32)

    rn = cfg.rotary_ndims
    inv_freq = 1.0 / (cfg.rope_theta ** (
        jnp.arange(0, rn, 2, dtype=jnp.float32) / rn))
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    cos, sin = jnp.cos(emb), jnp.sin(emb)
    scale = dh ** -0.5

    decode_mode = kv_cache is not None and s <= 4
    offset = kv_cache.length if kv_cache is not None else None
    kv_seg_full = None
    if kv_cache is not None:
        if getattr(offset, "ndim", 0) == 1:
            # per-row lengths (continuous batching, models/llama.py
            # semantics): each row's seg chunk lands at its own offset
            kv_seg_full = jax.vmap(
                lambda row, seg_row, o:
                jax.lax.dynamic_update_slice(row, seg_row, (o,)))(
                kv_cache.seg, segment_ids, offset)
        else:
            kv_seg_full = jax.lax.dynamic_update_slice(
                kv_cache.seg, segment_ids, (0, offset))

    quant_cache = kv_cache is not None and kv_cache.k.dtype == jnp.int8

    def layer_fn(carry, scanned):
        ks_l = vs_l = None
        lp = scanned
        if kv_cache is not None:
            # carry-resident cache (models/llama.py round-5 pattern):
            # new tokens written in place, no per-layer ys copies
            h, li, ck, cv, cks, cvs = carry
        else:
            h = carry
        residual = h
        x = layer_norm(h, lp["ln1_scale"], lp["ln1_bias"],
                       cfg.layer_norm_eps)
        _mm = llama_mod._mm   # QuantTensor-aware (int8/int4 serving)
        q = (_mm(x, lp["q_proj"]) + lp["q_b"]).reshape(b, s, H, dh)
        k = (_mm(x, lp["k_proj"]) + lp["k_b"]).reshape(b, s, H, dh)
        v = (_mm(x, lp["v_proj"]) + lp["v_b"]).reshape(b, s, H, dh)
        if cfg.qk_layernorm:
            q = layer_norm(q, lp["q_ln_scale"], lp["q_ln_bias"],
                           cfg.layer_norm_eps)
            k = layer_norm(k, lp["k_ln_scale"], lp["k_ln_bias"],
                           cfg.layer_norm_eps)
        q = _partial_rope(q, cos, sin, rn)
        k = _partial_rope(k, cos, sin, rn)

        if kv_cache is not None:
            if quant_cache:
                kq, ks_t = llama_mod._quantize_kv(k)
                vq, vs_t = llama_mod._quantize_kv(v)
                ck = llama_mod._write_kv_layer(ck, kq, li, offset)
                cv = llama_mod._write_kv_layer(cv, vq, li, offset)
                cks = llama_mod._write_scale_layer(
                    cks, ks_t.transpose(0, 2, 1), li, offset)
                cvs = llama_mod._write_scale_layer(
                    cvs, vs_t.transpose(0, 2, 1), li, offset)
            else:
                ck = llama_mod._write_kv_layer(ck, k, li, offset)
                cv = llama_mod._write_kv_layer(cv, v, li, offset)

        if decode_mode:
            kc = jax.lax.dynamic_index_in_dim(ck, li, 0,
                                              keepdims=False)
            vc = jax.lax.dynamic_index_in_dim(cv, li, 0,
                                              keepdims=False)
            if quant_cache:
                ks_l = jax.lax.dynamic_index_in_dim(
                    cks, li, 0, keepdims=False)
                vs_l = jax.lax.dynamic_index_in_dim(
                    cvs, li, 0, keepdims=False)
            attn = llama_mod._decode_attention(
                q, kc, vc, kv_seg_full, segment_ids, offset + s, scale,
                k_scale=ks_l, v_scale=vs_l)
        elif attn_impl == "xla":
            attn = mha_reference(q, k, v, causal=True,
                                 segment_ids=segment_ids,
                                 softmax_scale=scale)
        else:
            attn = flash_attention(q, k, v, causal=True,
                                   segment_ids=segment_ids,
                                   softmax_scale=scale,
                                   implementation=attn_impl)
        h = residual + (_mm(attn.reshape(b, s, d), lp["dense"])
                        + lp["dense_b"])

        residual = h
        x = layer_norm(h, lp["ln2_scale"], lp["ln2_bias"],
                       cfg.layer_norm_eps)
        x = relu2(_mm(x, lp["h_to_4h"]) + lp["h_to_4h_b"])
        h = residual + (_mm(x, lp["4h_to_h"]) + lp["4h_to_h_b"])
        if kv_cache is not None:
            return (h, li + 1, ck, cv, cks, cvs), None
        return h, None

    if kv_cache is not None:
        init = (h, jnp.zeros((), jnp.int32), kv_cache.k, kv_cache.v,
                kv_cache.k_scale, kv_cache.v_scale)
        (h, _, ck, cv, cks, cvs), _ = jax.lax.scan(
            layer_fn, init, params["layers"])
        new_cache = KVCache(k=ck, v=cv, seg=kv_seg_full,
                            length=offset + s,
                            k_scale=cks, v_scale=cvs)
    else:
        layer_fn = remat(layer_fn, use_remat)
        h, _ = jax.lax.scan(layer_fn, h, params["layers"])
        new_cache = None

    h = layer_norm(h, params["final_ln_scale"], params["final_ln_bias"],
                   cfg.layer_norm_eps)
    if return_hidden:
        return h, new_cache
    return llama_mod._mm(h, params["lm_head"]), new_cache
