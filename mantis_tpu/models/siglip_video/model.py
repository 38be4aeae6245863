"""SigLIP-Video — video-contrastive SigLIP with a temporal perceiver.

Reference: mantis/models/siglip_video/modeling_siglip_video.py:
  - per-frame SigLIP vision tower (:920);
  - temporal perceiver resampler regrouping frames into clips of
    ``max_temporal_clip_size`` and resampling each clip to latents
    (:639, clip regrouping :727-736);
  - SigLIP text tower;
  - sigmoid contrastive loss with learnable logit_scale/logit_bias.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from mantis_tpu.models import vit
from mantis_tpu.models.configs import VisionConfig
from mantis_tpu.models.vit import layer_norm


@dataclasses.dataclass(frozen=True)
class SiglipTextConfig:
    vocab_size: int = 32000
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 64
    layer_norm_eps: float = 1e-6

    @classmethod
    def from_hf_config(cls, cfg):
        get = (cfg.get if isinstance(cfg, dict)
               else lambda k, d=None: getattr(cfg, k, d))
        return cls(
            vocab_size=get("vocab_size"),
            hidden_size=get("hidden_size"),
            intermediate_size=get("intermediate_size"),
            num_hidden_layers=get("num_hidden_layers"),
            num_attention_heads=get("num_attention_heads"),
            max_position_embeddings=get("max_position_embeddings", 64),
            layer_norm_eps=get("layer_norm_eps", 1e-6),
        )


@dataclasses.dataclass(frozen=True)
class SiglipVideoConfig:
    vision_config: VisionConfig = dataclasses.field(
        default_factory=lambda: VisionConfig(
            tower_type="siglip", hidden_size=1152,
            intermediate_size=4304, num_hidden_layers=27,
            num_attention_heads=16, image_size=384, patch_size=14))
    text_config: SiglipTextConfig = dataclasses.field(
        default_factory=SiglipTextConfig)
    num_latents: int = 64
    perceiver_depth: int = 2
    max_temporal_clip_size: int = 8


def init_text_params(cfg: SiglipTextConfig, key, dtype=jnp.float32):
    d, li, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    ks = jax.random.split(key, 10)

    def norm(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * 0.02).astype(
            dtype)

    return {
        "token_embedding": norm(ks[0], (cfg.vocab_size, d)),
        "position_embedding": norm(
            ks[1], (cfg.max_position_embeddings, d)),
        "layers": {
            "ln1_scale": jnp.ones((L, d), dtype),
            "ln1_bias": jnp.zeros((L, d), dtype),
            "q": norm(ks[2], (L, d, d)), "q_b": jnp.zeros((L, d), dtype),
            "k": norm(ks[3], (L, d, d)), "k_b": jnp.zeros((L, d), dtype),
            "v": norm(ks[4], (L, d, d)), "v_b": jnp.zeros((L, d), dtype),
            "o": norm(ks[5], (L, d, d)), "o_b": jnp.zeros((L, d), dtype),
            "ln2_scale": jnp.ones((L, d), dtype),
            "ln2_bias": jnp.zeros((L, d), dtype),
            "fc1": norm(ks[6], (L, d, li)),
            "fc1_b": jnp.zeros((L, li), dtype),
            "fc2": norm(ks[7], (L, li, d)),
            "fc2_b": jnp.zeros((L, d), dtype),
        },
        "final_ln_scale": jnp.ones((d,), dtype),
        "final_ln_bias": jnp.zeros((d,), dtype),
        "head": norm(ks[8], (d, d)),
        "head_b": jnp.zeros((d,), dtype),
    }


def text_forward(params, cfg: SiglipTextConfig, input_ids):
    """SigLIP text tower: full (bidirectional) attention, LAST token
    pooled through the head (HF SiglipTextModel semantics)."""
    x = params["token_embedding"][input_ids]
    s = x.shape[1]
    x = x + params["position_embedding"][None, :s]

    class _C:
        tower_type = "siglip"
        num_attention_heads = cfg.num_attention_heads
        head_dim = cfg.hidden_size // cfg.num_attention_heads
        layer_norm_eps = cfg.layer_norm_eps
        num_hidden_layers = cfg.num_hidden_layers

    x = vit.encoder({"layers": params["layers"]}, _C, x, attn_impl="xla")
    x = layer_norm(x, params["final_ln_scale"], params["final_ln_bias"],
                   cfg.layer_norm_eps)
    pooled = x[:, -1]
    return pooled @ params["head"] + params["head_b"]


def init_params(cfg: SiglipVideoConfig, key, dtype=jnp.float32):
    kv, kt, kp = jax.random.split(key, 3)
    dv = cfg.vision_config.hidden_size
    n = cfg.num_latents
    depth = cfg.perceiver_depth
    ks = jax.random.split(kp, 8)

    def norm(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * 0.02).astype(
            dtype)

    return {
        "vision_tower": vit.init_params(cfg.vision_config, kv, dtype),
        "text_tower": init_text_params(cfg.text_config, kt, dtype),
        "temporal_perceiver": {
            "latents": norm(ks[0], (n, dv)),
            "frame_embs": norm(
                ks[1], (cfg.max_temporal_clip_size, dv)),
            "norm_scale": jnp.ones((dv,), dtype),
            "norm_bias": jnp.zeros((dv,), dtype),
            "layers": {
                "nm_scale": jnp.ones((depth, dv), dtype),
                "nm_bias": jnp.zeros((depth, dv), dtype),
                "nl_scale": jnp.ones((depth, dv), dtype),
                "nl_bias": jnp.zeros((depth, dv), dtype),
                "to_q": norm(ks[2], (depth, dv, dv)),
                "to_kv": norm(ks[3], (depth, dv, 2 * dv)),
                "to_out": norm(ks[4], (depth, dv, dv)),
                "ff_ln_scale": jnp.ones((depth, dv), dtype),
                "ff_ln_bias": jnp.zeros((depth, dv), dtype),
                "ff1": norm(ks[5], (depth, dv, dv * 4)),
                "ff2": norm(ks[6], (depth, dv * 4, dv)),
            },
        },
        # video->text projection to the text embedding dim
        "video_proj": norm(ks[7], (dv, cfg.text_config.hidden_size)),
        "logit_scale": jnp.asarray(jnp.log(10.0), dtype),
        "logit_bias": jnp.asarray(-10.0, dtype),
    }


def encode_video(params, cfg: SiglipVideoConfig, frames,
                 attn_impl=None):
    """frames [B, F, C, H, W] -> pooled video embedding [B, Dt].

    Frames are regrouped into clips of max_temporal_clip_size; the
    temporal perceiver resamples each clip to num_latents; latents are
    mean-pooled across clips/latents and projected."""
    b, f = frames.shape[:2]
    clip = min(cfg.max_temporal_clip_size, f)
    n_clips = f // clip
    frames = frames[:, :n_clips * clip]
    flat = frames.reshape(b * n_clips * clip, *frames.shape[2:])
    feats = vit.encode_images(
        params["vision_tower"], cfg.vision_config, flat,
        vision_feature_layer=-1,
        vision_feature_select_strategy="full", attn_impl=attn_impl)
    v = feats.shape[1]
    dv = feats.shape[-1]
    feats = feats.reshape(b, n_clips, clip, v, dv)

    pp = params["temporal_perceiver"]
    feats = feats + pp["frame_embs"][:clip][None, None, :, None, :]
    x = feats.reshape(b, n_clips, clip * v, dv)
    n = cfg.num_latents
    latents = jnp.broadcast_to(pp["latents"][None, None],
                               (b, n_clips, n, dv)).astype(x.dtype)

    def layer(lat, lp):
        xm = layer_norm(x, lp["nm_scale"], lp["nm_bias"], 1e-5)
        lq = layer_norm(lat, lp["nl_scale"], lp["nl_bias"], 1e-5)
        q = lq @ lp["to_q"]
        kv_in = jnp.concatenate([xm, lq], axis=2)
        kv = kv_in @ lp["to_kv"]
        k, vv = jnp.split(kv, 2, axis=-1)
        sim = jnp.einsum("bcnd,bcmd->bcnm", q, k,
                         preferred_element_type=jnp.float32) * dv ** -0.5
        attn = jax.nn.softmax(sim, axis=-1).astype(vv.dtype)
        lat = lat + jnp.einsum("bcnm,bcmd->bcnd", attn, vv) @ lp["to_out"]
        ff = layer_norm(lat, lp["ff_ln_scale"], lp["ff_ln_bias"], 1e-5)
        ff = jax.nn.gelu(ff @ lp["ff1"], approximate=False) @ lp["ff2"]
        return lat + ff, None

    latents, _ = jax.lax.scan(layer, latents,
                              params["temporal_perceiver"]["layers"])
    latents = layer_norm(latents, pp["norm_scale"], pp["norm_bias"],
                         1e-5)
    pooled = latents.mean(axis=(1, 2))
    return pooled @ params["video_proj"]


def sigmoid_contrastive_loss(video_emb, text_emb, logit_scale,
                             logit_bias):
    """SigLIP pairwise sigmoid loss: positives on the diagonal."""
    v = video_emb / jnp.linalg.norm(video_emb, axis=-1, keepdims=True)
    t = text_emb / jnp.linalg.norm(text_emb, axis=-1, keepdims=True)
    logits = v @ t.T * jnp.exp(logit_scale) + logit_bias
    n = logits.shape[0]
    z = 2 * jnp.eye(n) - 1.0  # +1 diag, -1 off-diag
    return -jnp.mean(jax.nn.log_sigmoid(z * logits))


def forward(params, cfg: SiglipVideoConfig, *, input_ids, frames,
            attn_impl=None):
    """-> (loss, video_emb, text_emb)."""
    vemb = encode_video(params, cfg, frames, attn_impl=attn_impl)
    temb = text_forward(params["text_tower"], cfg.text_config, input_ids)
    loss = sigmoid_contrastive_loss(
        vemb, temb, params["logit_scale"], params["logit_bias"])
    return loss, vemb, temb
