"""InternVL-2.5 — InternViT + pixel-shuffle projector + LLaMA-family LM
with the Mantis gated cross-attention extension and context parallelism.

Reference: mantis/models/intern_vl_25_8b/ (5,958 LoC) — the long-context
path of the reference framework:
  - InternViT-300M: cls token + learned positions, pre-LN blocks with
    layer-scale (lambda_1/lambda_2);
  - pixel shuffle x0.5 -> 256 tokens/tile + ``mlp1`` projector
    (processing_internvl_chat.py:61-113 dynamic tiling feeds this);
  - inline mode: IMG_CONTEXT tokens spliced in-sequence;
  - cross-attention mode (Mantis): per-layer gated cross-attn branch
    over image kv with tanh gates initialized to ZERO (so an untrained
    branch is a no-op — the property our tests check;
    modeling_internlm2.py:1725-1729,1827), text length stays O(text);
  - ring attention context parallelism: the decoder's self-attention
    accepts the same ``context_attention`` hook as LLaMA; cross-attn
    uses plain ring over image kv (ops/ring_attention.ring_cross_attention).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from mantis_tpu.models import llama
from mantis_tpu.models.configs import LlamaConfig
from mantis_tpu.ops.remat import remat
from mantis_tpu.models.llama import KVCache, apply_rope, rms_norm, rope_cos_sin
from mantis_tpu.models.mllava.model import (
    cross_entropy_loss,
    merge_image_features,
)
from mantis_tpu.models.vit import layer_norm
from mantis_tpu.ops.flash_attention import flash_attention, mha_reference


@dataclasses.dataclass(frozen=True)
class InternViTConfig:
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    image_size: int = 448
    patch_size: int = 14
    layer_norm_eps: float = 1e-6
    layer_scale_init_value: float = 0.1
    use_qk_norm: bool = False
    attention_bias: bool = True

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def from_hf_config(cls, cfg) -> "InternViTConfig":
        get = (cfg.get if isinstance(cfg, dict)
               else lambda k, d=None: getattr(cfg, k, d))
        img = get("image_size", 448)
        if isinstance(img, (list, tuple)):
            img = img[0]
        patch = get("patch_size", 14)
        if isinstance(patch, (list, tuple)):
            patch = patch[0]
        return cls(
            hidden_size=get("hidden_size"),
            intermediate_size=get("intermediate_size"),
            num_hidden_layers=get("num_hidden_layers"),
            num_attention_heads=get("num_attention_heads"),
            image_size=img, patch_size=patch,
            layer_norm_eps=get("layer_norm_eps", 1e-6),
            layer_scale_init_value=get("layer_scale_init_value", 0.1),
            use_qk_norm=get("use_qk_norm",
                            get("qk_normalization", False)),
            attention_bias=get("attention_bias", True),
        )


@dataclasses.dataclass(frozen=True)
class InternVLConfig:
    vision_config: InternViTConfig = dataclasses.field(
        default_factory=InternViTConfig)
    text_config: LlamaConfig = dataclasses.field(
        default_factory=lambda: LlamaConfig(
            vocab_size=92553, hidden_size=4096, intermediate_size=14336,
            num_hidden_layers=32, num_attention_heads=32,
            num_key_value_heads=8, rope_theta=1e6, rms_norm_eps=1e-5))
    image_token_id: int = 92546      # IMG_CONTEXT
    downsample_ratio: float = 0.5
    projector_hidden_act: str = "gelu"
    ignore_index: int = -100
    enable_cross_attention: bool = False
    # shared-cross-attn inference: image-prefix tokens self-attend in
    # local groups of this size (reference local_attention_group_size)
    local_attention_group_size: Optional[int] = None

    @property
    def num_image_tokens(self) -> int:
        """Tokens per 448px tile after pixel shuffle (256)."""
        side = self.vision_config.image_size // self.vision_config.patch_size
        return int((side * self.downsample_ratio) ** 2)

    @classmethod
    def from_hf_config(cls, cfg) -> "InternVLConfig":
        get = (cfg.get if isinstance(cfg, dict)
               else lambda k, d=None: getattr(cfg, k, d))
        return cls(
            vision_config=InternViTConfig.from_hf_config(
                get("vision_config")),
            text_config=LlamaConfig.from_hf_config(get("text_config")),
            image_token_id=get("image_token_id", 92546),
            downsample_ratio=get("downsample_ratio", 0.5),
            projector_hidden_act=get("projector_hidden_act", "gelu"),
        )


# ---------------------------------------------------------------------------
# InternViT
# ---------------------------------------------------------------------------

def init_vision_params(cfg: InternViTConfig, key, dtype=jnp.float32):
    d, li, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    p = cfg.patch_size
    ks = jax.random.split(key, 10)

    def norm(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * 0.02).astype(
            dtype)

    params = {
        "cls_token": norm(ks[0], (d,)),
        "patch_embedding": norm(ks[1], (3 * p * p, d)),
        "patch_bias": jnp.zeros((d,), dtype),
        "position_embedding": norm(ks[2], (cfg.num_patches + 1, d)),
        "layers": {
            "ln1_scale": jnp.ones((L, d), dtype),
            "ln1_bias": jnp.zeros((L, d), dtype),
            "q": norm(ks[3], (L, d, d)), "q_b": jnp.zeros((L, d), dtype),
            "k": norm(ks[4], (L, d, d)), "k_b": jnp.zeros((L, d), dtype),
            "v": norm(ks[5], (L, d, d)), "v_b": jnp.zeros((L, d), dtype),
            "o": norm(ks[6], (L, d, d)), "o_b": jnp.zeros((L, d), dtype),
            "ln2_scale": jnp.ones((L, d), dtype),
            "ln2_bias": jnp.zeros((L, d), dtype),
            "fc1": norm(ks[7], (L, d, li)),
            "fc1_b": jnp.zeros((L, li), dtype),
            "fc2": norm(ks[8], (L, li, d)),
            "fc2_b": jnp.zeros((L, d), dtype),
            "lambda_1": jnp.full((L, d), cfg.layer_scale_init_value,
                                 dtype),
            "lambda_2": jnp.full((L, d), cfg.layer_scale_init_value,
                                 dtype),
        },
    }
    return params


def vision_forward(params, cfg: InternViTConfig, pixel_values,
                   attn_impl=None, use_remat: bool = False):
    """pixel_values [N, C, H, W] -> hidden [N, P+1, D] (cls first)."""
    if cfg.use_qk_norm:
        # InternViT-6B towers: silently skipping the q/k RMS norms
        # would produce garbage features
        raise NotImplementedError(
            "InternViT qk normalization (use_qk_norm/qk_normalization) "
            "is not implemented; only the 300M-class towers without it "
            "are supported")
    import einops

    p = cfg.patch_size
    patches = einops.rearrange(
        pixel_values, "n c (hh p1) (ww p2) -> n (hh ww) (c p1 p2)",
        p1=p, p2=p)
    x = patches.astype(params["patch_embedding"].dtype) @ params[
        "patch_embedding"] + params["patch_bias"]
    cls = jnp.broadcast_to(params["cls_token"][None, None, :],
                           (x.shape[0], 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["position_embedding"][None]

    n, s, d = x.shape
    H, dh = cfg.num_attention_heads, cfg.head_dim
    scale = dh ** -0.5

    def layer(h, lp):
        xx = layer_norm(h, lp["ln1_scale"], lp["ln1_bias"],
                        cfg.layer_norm_eps)
        q = (xx @ lp["q"] + lp["q_b"]).reshape(n, s, H, dh)
        k = (xx @ lp["k"] + lp["k_b"]).reshape(n, s, H, dh)
        v = (xx @ lp["v"] + lp["v_b"]).reshape(n, s, H, dh)
        if attn_impl == "xla":
            attn = mha_reference(q, k, v, causal=False,
                                 softmax_scale=scale)
        else:
            attn = flash_attention(q, k, v, causal=False,
                                   softmax_scale=scale,
                                   implementation=attn_impl)
        attn = attn.reshape(n, s, d) @ lp["o"] + lp["o_b"]
        h = h + lp["lambda_1"] * attn
        xx = layer_norm(h, lp["ln2_scale"], lp["ln2_bias"],
                        cfg.layer_norm_eps)
        mlp = jax.nn.gelu(xx @ lp["fc1"] + lp["fc1_b"],
                          approximate=False) @ lp["fc2"] + lp["fc2_b"]
        return h + lp["lambda_2"] * mlp, None

    layer = remat(layer, use_remat)
    x, _ = jax.lax.scan(layer, x, params["layers"])
    return x


def pixel_shuffle(x: jax.Array, scale: float = 0.5) -> jax.Array:
    """[N, W, H, C] -> [N, W*s, H*s, C/s^2] (HF InternVL semantics)."""
    n, w, h, c = x.shape
    x = x.reshape(n, w, int(h * scale), int(c / scale))
    x = x.transpose(0, 2, 1, 3)
    x = x.reshape(n, int(h * scale), int(w * scale),
                  int(c / (scale * scale)))
    return x.transpose(0, 2, 1, 3)


def init_params(cfg: InternVLConfig, key, dtype=jnp.float32):
    kv, kp, kl = jax.random.split(key, 3)
    dv = cfg.vision_config.hidden_size
    dt = cfg.text_config.hidden_size
    din = dv * int(1 / cfg.downsample_ratio) ** 2
    k1, k2 = jax.random.split(kp)

    def norm(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * 0.02).astype(
            dtype)

    params = {
        "vision_tower": init_vision_params(cfg.vision_config, kv, dtype),
        "projector": {
            "ln_scale": jnp.ones((din,), dtype),
            "ln_bias": jnp.zeros((din,), dtype),
            "linear_1": norm(k1, (din, dt)),
            "linear_1_b": jnp.zeros((dt,), dtype),
            "linear_2": norm(k2, (dt, dt)),
            "linear_2_b": jnp.zeros((dt,), dtype),
        },
        "language_model": llama.init_params(cfg.text_config, kl, dtype),
    }
    if cfg.enable_cross_attention:
        params["cross_attention"] = init_cross_attention_params(
            cfg.text_config, key, dtype)
    return params


def init_cross_attention_params(tcfg: LlamaConfig, key, dtype=jnp.float32):
    """Gated cross-attn branch per decoder layer; gates start at 0 so
    the branch is initially a no-op (the reference clones self-attn
    weights and zeroes the gates, train_intern_vl_25.py:302-318)."""
    d, hq, hk, dh = (tcfg.hidden_size, tcfg.num_attention_heads,
                     tcfg.num_key_value_heads, tcfg.head_dim_)
    L = tcfg.num_hidden_layers
    ks = jax.random.split(key, 4)

    def norm(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * 0.02).astype(
            dtype)

    return {
        "norm": jnp.ones((L, d), dtype),
        "q_proj": norm(ks[0], (L, d, hq * dh)),
        "k_proj": norm(ks[1], (L, d, hk * dh)),
        "v_proj": norm(ks[2], (L, d, hk * dh)),
        "o_proj": norm(ks[3], (L, hq * dh, d)),
        "attn_gate": jnp.zeros((L,), dtype),
    }


def encode_images(params, cfg: InternVLConfig, pixel_values,
                  attn_impl=None, use_remat=False):
    """[N_tiles, C, 448, 448] -> [N_tiles, 256, Dt]."""
    hidden = vision_forward(params["vision_tower"], cfg.vision_config,
                            pixel_values, attn_impl=attn_impl,
                            use_remat=use_remat)
    feats = hidden[:, 1:]  # drop cls
    n = feats.shape[0]
    side = cfg.vision_config.image_size // cfg.vision_config.patch_size
    feats = feats.reshape(n, side, side, -1)
    feats = pixel_shuffle(feats, cfg.downsample_ratio)
    feats = feats.reshape(n, -1, feats.shape[-1])
    pj = params["projector"]
    x = layer_norm(feats, pj["ln_scale"], pj["ln_bias"], 1e-5)
    x = x.astype(pj["linear_1"].dtype) @ pj["linear_1"] + pj["linear_1_b"]
    x = jax.nn.gelu(x, approximate=False)
    return x @ pj["linear_2"] + pj["linear_2_b"]


# ---------------------------------------------------------------------------
# Decoder with optional gated cross attention
# ---------------------------------------------------------------------------

def decoder_forward(
    params, cfg: InternVLConfig, inputs_embeds, *,
    positions=None, segment_ids=None,
    encoder_hidden=None, encoder_mask=None,
    kv_cache: Optional[KVCache] = None,
    attn_impl=None, use_remat=False, context_attention=None,
    cross_attention_fn=None,
    shared_xattn_prefix: Optional[int] = None,
):
    """LLaMA-style decoder; when ``encoder_hidden`` ([B, M, D]) is given
    and cross-attn params exist, each layer adds
    tanh(gate) * CrossAttn(norm(h), enc) after self-attention.

    shared_xattn_prefix: static length M of an image-token prefix for
    the SHARED cross-attention inference mode (reference
    modeling_internvl_chat.py:284-330 + modeling_internlm2.py:1828-1864):
    text queries (positions >= M) attend the full [image ++ text]
    sequence causally (causal_offset=M), while image-prefix tokens
    self-attend only inside local groups of
    ``cfg.local_attention_group_size`` — same layer weights, no
    separate branch, O(text * total + M * group) attention."""
    tcfg = cfg.text_config
    lm = params["language_model"]
    xattn = params.get("cross_attention")
    h = inputs_embeds
    b, s, d = h.shape
    if positions is None:
        # with a cache, continue from the cache offset (arange(s)
        # would restart RoPE at 0 every decode step — models/llama.py
        # semantics)
        start = (kv_cache.length if kv_cache is not None
                 else jnp.zeros((), jnp.int32))
        if getattr(start, "ndim", 0) == 1:
            positions = start[:, None] + jnp.arange(s)[None, :]
        else:
            positions = jnp.broadcast_to(
                start + jnp.arange(s)[None, :], (b, s))
    if segment_ids is None:
        segment_ids = jnp.ones((b, s), jnp.int32)
    cos, sin = rope_cos_sin(positions, tcfg.head_dim_, tcfg.rope_theta)
    scale = tcfg.head_dim_ ** -0.5
    hq, hk, dh = (tcfg.num_attention_heads, tcfg.num_key_value_heads,
                  tcfg.head_dim_)

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

    q_seg = jnp.ones((b, s), jnp.int32)
    img_group_ids = None
    if shared_xattn_prefix:
        gsz = cfg.local_attention_group_size or shared_xattn_prefix
        img_group_ids = jnp.broadcast_to(
            1 + jnp.arange(shared_xattn_prefix, dtype=jnp.int32) // gsz,
            (b, shared_xattn_prefix))

    quant_cache = kv_cache is not None and kv_cache.k.dtype == jnp.int8

    def layer_fn(carry, scanned):
        ks_l = vs_l = None
        if kv_cache is not None:
            # carry-resident cache (models/llama.py round-5 pattern):
            # new tokens written in place, no per-layer ys copies
            h, li, ck_full, cv_full, cks_full, cvs_full = carry
            if xattn is not None:
                lp, xp = scanned
            else:
                lp = scanned
        elif xattn is not None:
            h = carry
            lp, xp = scanned
        else:
            h = carry
            lp = scanned
        residual = h
        x = rms_norm(h, lp["input_layernorm"], tcfg.rms_norm_eps)
        _mm = llama._mm   # QuantTensor-aware (int8/int4 serving)
        q = _mm(x, lp["q_proj"]).reshape(b, s, hq, dh)
        k = _mm(x, lp["k_proj"]).reshape(b, s, hk, dh)
        v = _mm(x, lp["v_proj"]).reshape(b, s, hk, dh)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        if kv_cache is not None:
            if quant_cache:
                kq, ks_t = llama._quantize_kv(k)
                vq, vs_t = llama._quantize_kv(v)
                ck_full = llama._write_kv_layer(ck_full, kq, li, offset)
                cv_full = llama._write_kv_layer(cv_full, vq, li, offset)
                cks_full = llama._write_scale_layer(
                    cks_full, ks_t.transpose(0, 2, 1), li, offset)
                cvs_full = llama._write_scale_layer(
                    cvs_full, vs_t.transpose(0, 2, 1), li, offset)
            else:
                ck_full = llama._write_kv_layer(ck_full, k, li, offset)
                cv_full = llama._write_kv_layer(cv_full, v, li, offset)
        if decode_mode:
            kc = jax.lax.dynamic_index_in_dim(ck_full, li, 0,
                                              keepdims=False)
            vc = jax.lax.dynamic_index_in_dim(cv_full, li, 0,
                                              keepdims=False)
            if quant_cache:
                ks_l = jax.lax.dynamic_index_in_dim(
                    cks_full, li, 0, keepdims=False)
                vs_l = jax.lax.dynamic_index_in_dim(
                    cvs_full, li, 0, keepdims=False)
            attn = llama._decode_attention(
                q, kc, vc, kv_seg_full, segment_ids, offset + s, scale,
                k_scale=ks_l, v_scale=vs_l)
        elif shared_xattn_prefix:
            m_pre = shared_xattn_prefix
            # image prefix: local-group causal self-attention
            attn_img = flash_attention(
                q[:, :m_pre], k[:, :m_pre], v[:, :m_pre], causal=True,
                segment_ids=img_group_ids, softmax_scale=scale,
                implementation=attn_impl)
            # text: causal over [image ++ text] with the offset diagonal
            attn_txt = flash_attention(
                q[:, m_pre:], k, v, causal=True, causal_offset=m_pre,
                segment_ids=segment_ids[:, m_pre:],
                kv_segment_ids=segment_ids, softmax_scale=scale,
                implementation=attn_impl)
            attn = jnp.concatenate([attn_img, attn_txt], axis=1)
        elif context_attention is not None:
            attn = context_attention(q, k, v, segment_ids, scale)
        elif attn_impl == "xla":
            attn = mha_reference(q, k, v, causal=True,
                                 segment_ids=segment_ids,
                                 softmax_scale=scale)
        else:
            attn = flash_attention(q, k, v, causal=True,
                                   segment_ids=segment_ids,
                                   softmax_scale=scale,
                                   implementation=attn_impl)
        h = residual + _mm(attn.reshape(b, s, hq * dh), lp["o_proj"])

        if xattn is not None and encoder_hidden is not None:
            residual = h
            xq = rms_norm(h, xp["norm"], tcfg.rms_norm_eps)
            m = encoder_hidden.shape[1]
            cq = (xq @ xp["q_proj"]).reshape(b, s, hq, dh)
            ck = (encoder_hidden.astype(xq.dtype)
                  @ xp["k_proj"]).reshape(b, m, hk, dh)
            cv = (encoder_hidden.astype(xq.dtype)
                  @ xp["v_proj"]).reshape(b, m, hk, dh)
            if cross_attention_fn is not None:
                ca = cross_attention_fn(cq, ck, cv, q_seg, encoder_mask,
                                        scale)
            elif attn_impl == "xla":
                ca = mha_reference(cq, ck, cv, causal=False,
                                   segment_ids=q_seg,
                                   kv_segment_ids=encoder_mask,
                                   softmax_scale=scale)
            else:
                ca = flash_attention(cq, ck, cv, causal=False,
                                     segment_ids=q_seg,
                                     kv_segment_ids=encoder_mask,
                                     softmax_scale=scale,
                                     implementation=attn_impl)
            gate = jnp.tanh(xp["attn_gate"]).astype(h.dtype)
            h = residual + gate * (
                ca.reshape(b, s, hq * dh) @ xp["o_proj"])

        residual = h
        x = rms_norm(h, lp["post_attention_layernorm"], tcfg.rms_norm_eps)
        gated = jax.nn.silu(_mm(x, lp["gate_proj"])) \
            * _mm(x, lp["up_proj"])
        h = residual + _mm(gated, lp["down_proj"])
        if kv_cache is not None:
            return (h, li + 1, ck_full, cv_full, cks_full,
                    cvs_full), None
        return h, None

    scan_args = [lm["layers"]]
    if xattn is not None:
        scan_args.append(xattn)
    xs = tuple(scan_args) if len(scan_args) > 1 else scan_args[0]
    new_cache = None
    if kv_cache is not None:
        init = (h, jnp.zeros((), jnp.int32), kv_cache.k, kv_cache.v,
                kv_cache.k_scale, kv_cache.v_scale)
        (h, _, ck, cv, cks, cvs), _ = jax.lax.scan(layer_fn, init, xs)
        new_cache = KVCache(k=ck, v=cv, seg=kv_seg_full,
                            length=offset + s,
                            k_scale=cks, v_scale=cvs)
    else:
        layer_fn = remat(layer_fn, use_remat)
        h, _ = jax.lax.scan(layer_fn, h, xs)
    h = rms_norm(h, lm["norm"], tcfg.rms_norm_eps)
    logits = llama._mm(h, lm["lm_head"] if "lm_head" in lm
                       else lm["embed_tokens"].T)
    return logits, new_cache


def forward(
    params, cfg: InternVLConfig, *, input_ids,
    pixel_values=None, positions=None, segment_ids=None, labels=None,
    kv_cache=None, attn_impl=None, use_remat=False,
    context_attention=None, cross_attention_fn=None,
    encoder_mask=None, labels_preshifted: bool = False,
    shared_xattn_prefix: Optional[int] = None,
    vision_dp_mesh=None, vision_dp_axis: str = "context",
    image_feature_idx=None,
):
    """Inline mode: image features spliced at IMG_CONTEXT positions.
    Cross-attn mode (cfg.enable_cross_attention): features become
    encoder kv; text keeps only the placeholder-free prompt."""
    embeds = params["language_model"]["embed_tokens"][input_ids]
    encoder_hidden = None
    if pixel_values is not None and input_ids.shape[1] > 1:
        def _enc(pix):
            return encode_images(params, cfg, pix, attn_impl=attn_impl,
                                 use_remat=use_remat)
        if vision_dp_mesh is not None:
            from mantis_tpu.parallel.vision_dp import (
                make_context_vision_encoder)

            _enc = make_context_vision_encoder(
                _enc, vision_dp_mesh, vision_dp_axis)
        feats = _enc(pixel_values)
        if cfg.enable_cross_attention:
            encoder_hidden = feats.reshape(1, -1, feats.shape[-1])
            encoder_hidden = jnp.broadcast_to(
                encoder_hidden, (input_ids.shape[0],
                                 encoder_hidden.shape[1],
                                 encoder_hidden.shape[2]))
            if encoder_mask is None:
                encoder_mask = jnp.ones(
                    encoder_hidden.shape[:2], jnp.int32)
        else:
            # image_feature_idx: pre-zigzag position->feature map for
            # context parallelism (see mllava.merge_image_features)
            embeds = merge_image_features(
                embeds, input_ids, feats, cfg.image_token_id,
                feature_idx=image_feature_idx)

    logits, new_cache = decoder_forward(
        params, cfg, embeds, positions=positions,
        segment_ids=segment_ids, encoder_hidden=encoder_hidden,
        encoder_mask=encoder_mask, kv_cache=kv_cache,
        attn_impl=attn_impl, use_remat=use_remat,
        context_attention=context_attention,
        cross_attention_fn=cross_attention_fn,
        shared_xattn_prefix=shared_xattn_prefix)
    loss = None
    if labels is not None:
        mask = None if segment_ids is None else (segment_ids != 0)
        loss = cross_entropy_loss(logits, labels, mask, cfg.ignore_index,
                                  shift=not labels_preshifted)
    return logits, loss, new_cache
