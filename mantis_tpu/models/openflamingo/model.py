"""OpenFlamingo — frozen LM + perceiver resampler + gated cross-attn
blocks injected every N layers.

Reference: mantis/models/openflamingo/ (flamingo.py:17-121 media
conditioning; helpers.py:25-133 PerceiverAttention/Resampler,
:136-300 MaskedCrossAttention/GatedCrossAttentionBlock;
factory.py:13 open_clip assembly; train_openflamingo.py:151
``cross_attn_every_n_layers=4``).

TPU mapping: the vision tower is our CLIP ViT; the media-location mask
("a text token attends the most recent preceding image", or all
previous with attend_previous) is computed as explicit media-time
comparisons; x-attn layers are scan-stacked like everything else.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from mantis_tpu.models import llama, vit
from mantis_tpu.models.configs import LlamaConfig, VisionConfig
from mantis_tpu.models.llama import rms_norm
from mantis_tpu.models.mllava.model import cross_entropy_loss
from mantis_tpu.models.vit import layer_norm


@dataclasses.dataclass(frozen=True)
class FlamingoConfig:
    vision_config: VisionConfig = dataclasses.field(
        default_factory=lambda: VisionConfig(tower_type="clip"))
    text_config: LlamaConfig = dataclasses.field(
        default_factory=LlamaConfig)
    cross_attn_every_n_layers: int = 4
    perceiver_depth: int = 6
    perceiver_num_latents: int = 64
    perceiver_heads: int = 8
    perceiver_head_dim: int = 64
    media_token_id: int = 32000      # <image>
    only_attend_immediate_media: bool = True
    ignore_index: int = -100

    @property
    def num_xattn_layers(self) -> int:
        return (self.text_config.num_hidden_layers
                // self.cross_attn_every_n_layers)


def init_params(cfg: FlamingoConfig, key, dtype=jnp.float32):
    kv, kp, kl, kx = jax.random.split(key, 4)
    dv = cfg.vision_config.hidden_size
    dt = cfg.text_config.hidden_size
    inner = cfg.perceiver_heads * cfg.perceiver_head_dim
    depth = cfg.perceiver_depth
    ks = jax.random.split(kp, 8)

    def norm(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * 0.02).astype(
            dtype)

    perceiver = {
        "latents": norm(ks[0], (cfg.perceiver_num_latents, dv)),
        "norm_scale": jnp.ones((dv,), dtype),
        "norm_bias": jnp.zeros((dv,), dtype),
        "layers": {
            "nm_scale": jnp.ones((depth, dv), dtype),
            "nm_bias": jnp.zeros((depth, dv), dtype),
            "nl_scale": jnp.ones((depth, dv), dtype),
            "nl_bias": jnp.zeros((depth, dv), dtype),
            "to_q": norm(ks[1], (depth, dv, inner)),
            "to_kv": norm(ks[2], (depth, dv, 2 * inner)),
            "to_out": norm(ks[3], (depth, inner, dv)),
            "ff_ln_scale": jnp.ones((depth, dv), dtype),
            "ff_ln_bias": jnp.zeros((depth, dv), dtype),
            "ff1": norm(ks[4], (depth, dv, dv * 4)),
            "ff2": norm(ks[5], (depth, dv * 4, dv)),
        },
    }
    nx = cfg.num_xattn_layers
    h, dh = cfg.perceiver_heads, cfg.perceiver_head_dim
    kxs = jax.random.split(kx, 6)
    xattn = {
        "attn_gate": jnp.zeros((nx,), dtype),
        "ff_gate": jnp.zeros((nx,), dtype),
        "nq_scale": jnp.ones((nx, dt), dtype),
        "nq_bias": jnp.zeros((nx, dt), dtype),
        "to_q": norm(kxs[0], (nx, dt, inner)),
        "to_kv": norm(kxs[1], (nx, dv, 2 * inner)),
        "to_out": norm(kxs[2], (nx, inner, dt)),
        "ff_ln_scale": jnp.ones((nx, dt), dtype),
        "ff_ln_bias": jnp.zeros((nx, dt), dtype),
        "ff1": norm(kxs[3], (nx, dt, dt * 4)),
        "ff2": norm(kxs[4], (nx, dt * 4, dt)),
    }
    return {
        "vision_tower": vit.init_params(cfg.vision_config, kv, dtype),
        "perceiver": perceiver,
        "xattn": xattn,
        "language_model": llama.init_params(cfg.text_config, kl, dtype),
    }


def perceiver_resample(params, cfg: FlamingoConfig, x):
    """x [B, T, v, Dv] (per-media patch features) -> [B, T, n, Dv]."""
    pp = params["perceiver"]
    b, t, v, d = x.shape
    n = cfg.perceiver_num_latents
    h, dh = cfg.perceiver_heads, cfg.perceiver_head_dim
    latents = jnp.broadcast_to(pp["latents"][None, None], (b, t, n, d)
                               ).astype(x.dtype)

    def layer(lat, lp):
        xm = layer_norm(x, lp["nm_scale"], lp["nm_bias"], 1e-5)
        lq = layer_norm(lat, lp["nl_scale"], lp["nl_bias"], 1e-5)
        q = (lq @ lp["to_q"]).reshape(b, t, n, h, dh)
        kv_in = jnp.concatenate([xm, lq], axis=2)
        kv = (kv_in @ lp["to_kv"]).reshape(b, t, v + n, 2, h, dh)
        k, vv = kv[..., 0, :, :], kv[..., 1, :, :]
        sim = jnp.einsum("btnhd,btmhd->bthnm", q, k,
                         preferred_element_type=jnp.float32) * dh ** -0.5
        attn = jax.nn.softmax(sim, axis=-1).astype(vv.dtype)
        out = jnp.einsum("bthnm,btmhd->btnhd", attn, vv)
        lat = lat + out.reshape(b, t, n, h * dh) @ lp["to_out"]
        ff = layer_norm(lat, lp["ff_ln_scale"], lp["ff_ln_bias"], 1e-5)
        ff = jax.nn.gelu(ff @ lp["ff1"], approximate=False) @ lp["ff2"]
        return lat + ff, None

    latents, _ = jax.lax.scan(layer, latents, pp["layers"])
    return layer_norm(latents, pp["norm_scale"], pp["norm_bias"], 1e-5)


def _media_mask(media_locations, t_media, n_latents, only_immediate):
    """[B, S] bool media-location flags -> [B, S, T*n] attention mask.

    text_time = count of media seen so far (inclusive); a text token
    attends media m iff media_time == text_time (immediate) or
    media_time <= text_time (attend previous)."""
    text_time = jnp.cumsum(media_locations.astype(jnp.int32), axis=1)
    media_time = jnp.arange(t_media)[None, None, :] + 1  # [1,1,T]
    if only_immediate:
        ok = media_time == text_time[:, :, None]
    else:
        ok = media_time <= text_time[:, :, None]
    return jnp.repeat(ok, n_latents, axis=-1)  # [B, S, T*n]


def forward(
    params, cfg: FlamingoConfig, *, input_ids,
    pixel_values=None,          # [B*T, C, H, W] media frames
    num_media: int = 1,
    positions=None, segment_ids=None, labels=None,
    attn_impl=None, use_remat=False,
):
    """Flamingo forward (no kv-cache mode; media kv cacheable later).

    Gated x-attn runs before every ``cross_attn_every_n_layers``-th LM
    layer, matching the reference injection pattern."""
    tcfg = cfg.text_config
    lm = params["language_model"]
    embeds = lm["embed_tokens"][input_ids]
    b, s, d = embeds.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s))
    if segment_ids is None:
        segment_ids = jnp.ones((b, s), jnp.int32)

    media_kv_mask = None
    media_latents = None
    if pixel_values is not None:
        feats = vit.encode_images(
            params["vision_tower"], cfg.vision_config, pixel_values,
            vision_feature_layer=-1,
            vision_feature_select_strategy="default",
            attn_impl=attn_impl, use_remat=use_remat)
        v = feats.shape[1]
        feats = feats.reshape(b, num_media, v, -1)
        media_latents = perceiver_resample(params, cfg, feats)
        media_locations = input_ids == cfg.media_token_id
        media_kv_mask = _media_mask(
            media_locations, num_media, cfg.perceiver_num_latents,
            cfg.only_attend_immediate_media)

    from mantis_tpu.models.llama import apply_rope, rope_cos_sin
    from mantis_tpu.ops.flash_attention import mha_reference, \
        flash_attention

    cos, sin = rope_cos_sin(positions, tcfg.head_dim_, tcfg.rope_theta)
    scale = tcfg.head_dim_ ** -0.5
    hq, hk, dh = (tcfg.num_attention_heads, tcfg.num_key_value_heads,
                  tcfg.head_dim_)
    ph, pdh = cfg.perceiver_heads, cfg.perceiver_head_dim
    every = cfg.cross_attn_every_n_layers

    def xattn_block(h, xp):
        residual = h
        xq = layer_norm(h, xp["nq_scale"], xp["nq_bias"], 1e-5)
        n_kv = media_latents.shape[1] * media_latents.shape[2]
        kv_in = media_latents.reshape(b, n_kv, -1)
        q = (xq @ xp["to_q"]).reshape(b, s, ph, pdh)
        kv = (kv_in.astype(xq.dtype) @ xp["to_kv"]).reshape(
            b, n_kv, 2, ph, pdh)
        k, v = kv[:, :, 0], kv[:, :, 1]
        sim = jnp.einsum("bshd,bmhd->bhsm", q, k,
                         preferred_element_type=jnp.float32) * pdh ** -0.5
        sim = jnp.where(media_kv_mask[:, None, :, :], sim, -1e30)
        attn = jax.nn.softmax(sim, axis=-1)
        # rows with no visible media produce garbage -> zero them
        any_media = jnp.any(media_kv_mask, axis=-1)  # [B, S]
        out = jnp.einsum("bhsm,bmhd->bshd", attn.astype(v.dtype), v)
        out = out.reshape(b, s, ph * pdh) @ xp["to_out"]
        out = jnp.where(any_media[..., None], out, 0.0)
        h = residual + jnp.tanh(xp["attn_gate"]).astype(h.dtype) * out
        residual = h
        ff = layer_norm(h, xp["ff_ln_scale"], xp["ff_ln_bias"], 1e-5)
        ff = jax.nn.gelu(ff @ xp["ff1"], approximate=False) @ xp["ff2"]
        return residual + jnp.tanh(xp["ff_gate"]).astype(h.dtype) * ff

    # Unrolled layer loop (x-attn params differ in shape from LM layers,
    # and the injection pattern is static).
    h = embeds
    L = tcfg.num_hidden_layers
    for i in range(L):
        if media_latents is not None and i % every == 0:
            xi = i // every
            if xi < cfg.num_xattn_layers:
                xp = jax.tree.map(lambda a: a[xi], params["xattn"])
                h = xattn_block(h, xp)
        lp = jax.tree.map(lambda a: a[i], lm["layers"])
        residual = h
        x = rms_norm(h, lp["input_layernorm"], tcfg.rms_norm_eps)
        q = apply_rope((x @ lp["q_proj"]).reshape(b, s, hq, dh), cos, sin)
        k = apply_rope((x @ lp["k_proj"]).reshape(b, s, hk, dh), cos, sin)
        v = (x @ lp["v_proj"]).reshape(b, s, hk, dh)
        if attn_impl == "xla":
            attn = mha_reference(q, k, v, causal=True,
                                 segment_ids=segment_ids,
                                 softmax_scale=scale)
        else:
            attn = flash_attention(q, k, v, causal=True,
                                   segment_ids=segment_ids,
                                   softmax_scale=scale,
                                   implementation=attn_impl)
        h = residual + attn.reshape(b, s, hq * dh) @ lp["o_proj"]
        residual = h
        x = rms_norm(h, lp["post_attention_layernorm"],
                     tcfg.rms_norm_eps)
        h = residual + (jax.nn.silu(x @ lp["gate_proj"])
                        * (x @ lp["up_proj"])) @ lp["down_proj"]

    h = rms_norm(h, lm["norm"], tcfg.rms_norm_eps)
    logits = h @ (lm["lm_head"] if "lm_head" in lm
                  else lm["embed_tokens"].T)
    loss = None
    if labels is not None:
        mask = segment_ids != 0
        loss = cross_entropy_loss(logits, labels, mask, cfg.ignore_index)
    return logits, loss, None
