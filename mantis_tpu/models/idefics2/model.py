"""Idefics2 — SigLIP-NaViT vision + perceiver resampler + Mistral LM.

TPU-native re-implementation of the reference's Idefics2 fork
(reference: mantis/models/idefics2/modeling_idefics2.py:1487-2115):
  - variable-aspect NaViT vision with per-patch attention mask and
    bucketized 2-D position ids (reference :1656-1658; HF
    Idefics2VisionEmbeddings) — here position ids and patch masks are
    computed HOST-SIDE by the processor so the device graph stays
    static;
  - 64-latent perceiver resampler (q = latents, kv = [context; latents],
    RMS-normed, GQA);
  - ``inputs_merger`` scatter at <image> positions (reference
    :1545-1566) via the same static cumsum-gather as MLlava;
  - ``Idefics2ForSequenceClassification`` head (reference :2017-2115).

The reference's eval-time vision micro-batching (:1662-1676) and
all-zero-image dropping (:1638-1639) are CUDA memory workarounds that a
batched XLA graph does not need.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mantis_tpu.models import llama, vit
from mantis_tpu.models.configs import LlamaConfig, VisionConfig
from mantis_tpu.models.llama import KVCache
from mantis_tpu.models.mllava.model import (
    cross_entropy_loss,
    merge_image_features,
)
from mantis_tpu.ops.flash_attention import flash_attention, mha_reference


@dataclasses.dataclass(frozen=True)
class PerceiverConfig:
    hidden_size: int = 4096        # operates at TEXT hidden size
    resampler_n_latents: int = 64
    resampler_depth: int = 3
    resampler_n_heads: int = 16
    resampler_head_dim: int = 96
    num_key_value_heads: int = 4
    rms_norm_eps: float = 1e-6


@dataclasses.dataclass(frozen=True)
class Idefics2Config:
    vision_config: VisionConfig = dataclasses.field(
        default_factory=lambda: VisionConfig(
            tower_type="siglip", hidden_size=1152, intermediate_size=4304,
            num_hidden_layers=27, num_attention_heads=16, image_size=980,
            patch_size=14, layer_norm_eps=1e-6))
    perceiver_config: PerceiverConfig = dataclasses.field(
        default_factory=PerceiverConfig)
    text_config: LlamaConfig = dataclasses.field(
        default_factory=lambda: LlamaConfig(
            vocab_size=32003, hidden_size=4096, intermediate_size=14336,
            num_hidden_layers=32, num_attention_heads=32,
            num_key_value_heads=8, rope_theta=10000.0, rms_norm_eps=1e-5))
    image_token_id: int = 32001
    ignore_index: int = -100
    num_labels: int = 2

    @property
    def num_image_tokens(self) -> int:
        return self.perceiver_config.resampler_n_latents

    @classmethod
    def from_hf_config(cls, cfg) -> "Idefics2Config":
        get = (cfg.get if isinstance(cfg, dict)
               else lambda k, d=None: getattr(cfg, k, d))
        pc = get("perceiver_config")
        pget = (pc.get if isinstance(pc, dict)
                else lambda k, d=None: getattr(pc, k, d))
        tc = get("text_config")
        tget = (tc.get if isinstance(tc, dict)
                else lambda k, d=None: getattr(tc, k, d))
        return cls(
            vision_config=VisionConfig.from_hf_config(
                get("vision_config"), tower_type="siglip"),
            perceiver_config=PerceiverConfig(
                hidden_size=tget("hidden_size"),
                resampler_n_latents=pget("resampler_n_latents", 64),
                resampler_depth=pget("resampler_depth", 3),
                resampler_n_heads=pget("resampler_n_heads", 16),
                resampler_head_dim=pget("resampler_head_dim", 96),
                num_key_value_heads=pget("num_key_value_heads", 4),
                rms_norm_eps=pget("rms_norm_eps", 1e-6),
            ),
            text_config=LlamaConfig.from_hf_config(tc),
            image_token_id=get("image_token_id", 32001),
        )


# ---------------------------------------------------------------------------
# NaViT position ids (host-side; mirrors HF bucketize semantics)
# ---------------------------------------------------------------------------

def navit_position_ids(nb_patches_h: int, nb_patches_w: int,
                       num_patches_per_side: int) -> np.ndarray:
    """Bucketized fractional-coordinate position ids for one image."""
    boundaries = np.arange(
        1 / num_patches_per_side, 1.0, 1 / num_patches_per_side)
    frac_h = np.arange(nb_patches_h) / nb_patches_h * (1 - 1e-6)
    frac_w = np.arange(nb_patches_w) / nb_patches_w * (1 - 1e-6)
    bh = np.searchsorted(boundaries, frac_h, side="right")
    bw = np.searchsorted(boundaries, frac_w, side="right")
    return (bh[:, None] * num_patches_per_side + bw[None, :]).reshape(-1)


def build_patch_grid(true_h: int, true_w: int, cfg: VisionConfig,
                     canvas_h: Optional[int] = None,
                     canvas_w: Optional[int] = None,
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """(patch_mask [P], position_ids [P]) for an image padded into a
    canvas (valid region top-left).

    The canvas defaults to the full square ``cfg.image_size``; a
    smaller canvas (HF pads to the batch max, not the config max —
    processing_idefics2 pixel_attention_mask) shrinks P while the
    position-id BUCKETS still come from ``cfg.image_size``
    (num_patches_per_side in HF's vision embeddings)."""
    side = cfg.image_size // cfg.patch_size
    gh = (canvas_h or cfg.image_size) // cfg.patch_size
    gw = (canvas_w or cfg.image_size) // cfg.patch_size
    nh = min(max(true_h // cfg.patch_size, 1), gh)
    nw = min(max(true_w // cfg.patch_size, 1), gw)
    mask = np.zeros((gh, gw), np.int32)
    mask[:nh, :nw] = 1
    pos = np.zeros((gh, gw), np.int64)
    pos[:nh, :nw] = navit_position_ids(nh, nw, side).reshape(nh, nw)
    return mask.reshape(-1), pos.reshape(-1)


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------

def init_params(cfg: Idefics2Config, key: jax.Array, dtype=jnp.float32):
    kv, kp, kl, kc = jax.random.split(key, 4)
    vcfg, pcfg, tcfg = (cfg.vision_config, cfg.perceiver_config,
                        cfg.text_config)

    def norm(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * 0.02).astype(
            dtype)

    dp = pcfg.hidden_size
    dh, hq, hk = (pcfg.resampler_head_dim, pcfg.resampler_n_heads,
                  pcfg.num_key_value_heads)
    depth = pcfg.resampler_depth
    ks = jax.random.split(kp, 12)
    perceiver = {
        "latents": jnp.ones((pcfg.resampler_n_latents, dp), dtype),
        "norm": jnp.ones((dp,), dtype),
        "layers": {
            "input_latents_norm": jnp.ones((depth, dp), dtype),
            "input_context_norm": jnp.ones((depth, dp), dtype),
            "q_proj": norm(ks[0], (depth, dp, hq * dh)),
            "k_proj": norm(ks[1], (depth, dp, hk * dh)),
            "v_proj": norm(ks[2], (depth, dp, hk * dh)),
            "o_proj": norm(ks[3], (depth, hq * dh, dp)),
            "post_attention_layernorm": jnp.ones((depth, dp), dtype),
            "mlp_gate": norm(ks[4], (depth, dp, dp * 4)),
            "mlp_up": norm(ks[5], (depth, dp, dp * 4)),
            "mlp_down": norm(ks[6], (depth, dp * 4, dp)),
        },
    }
    kc1, kc2, kc3 = jax.random.split(kc, 3)
    return {
        "vision_tower": vit.init_params(vcfg, kv, dtype),
        "connector": {
            "mp_gate": norm(kc1, (vcfg.hidden_size,
                                  tcfg.intermediate_size)),
            "mp_up": norm(kc2, (vcfg.hidden_size,
                                tcfg.intermediate_size)),
            "mp_down": norm(kc3, (tcfg.intermediate_size,
                                  tcfg.hidden_size)),
            "perceiver": perceiver,
        },
        "language_model": llama.init_params(tcfg, kl, dtype),
    }


def init_classification_params(cfg: Idefics2Config, key: jax.Array,
                               dtype=jnp.float32):
    params = init_params(cfg, key, dtype)
    params["score"] = (jax.random.normal(
        key, (cfg.text_config.hidden_size, cfg.num_labels),
        jnp.float32) * 0.02).astype(dtype)
    return params


# ---------------------------------------------------------------------------
# Vision + connector
# ---------------------------------------------------------------------------

def vision_forward(params, cfg: Idefics2Config, pixel_values,
                   patch_mask, patch_position_ids,
                   attn_impl: Optional[str] = None,
                   use_remat: bool = False):
    """pixel_values [N, C, H, W]; patch_mask/pos [N, P] -> [N, P, Dv]."""
    vcfg = cfg.vision_config
    vp = params["vision_tower"]
    x = vit.embed_patches_only(vp, vcfg, pixel_values)
    x = x + vp["position_embedding"][patch_position_ids]
    seg = patch_mask.astype(jnp.int32)
    x = vit.encoder(vp, vcfg, x, segment_ids=seg, attn_impl=attn_impl,
                    use_remat=use_remat)
    x = vit.layer_norm(x, vp["post_ln_scale"], vp["post_ln_bias"],
                       vcfg.layer_norm_eps)
    return x


def _silu_mlp(x, gate, up, down):
    return (jax.nn.silu(x @ gate) * (x @ up)) @ down


def perceiver_resampler(params, pcfg: PerceiverConfig, context,
                        context_mask, attn_impl=None):
    """context [N, P, Dt]; context_mask [N, P] -> [N, n_latents, Dt]."""
    pp = params
    n, P, d = context.shape
    L = pcfg.resampler_n_latents
    hq, hk, dh = (pcfg.resampler_n_heads, pcfg.num_key_value_heads,
                  pcfg.resampler_head_dim)
    latents = jnp.broadcast_to(pp["latents"][None], (n, L, d)).astype(
        context.dtype)
    # kv mask: [context valid; latents always valid]
    kv_seg = jnp.concatenate(
        [context_mask.astype(jnp.int32),
         jnp.ones((n, L), jnp.int32)], axis=1)
    q_seg = jnp.ones((n, L), jnp.int32)
    scale = dh ** -0.5

    def layer(latents, lp):
        residual = latents
        lat = llama.rms_norm(latents, lp["input_latents_norm"],
                             pcfg.rms_norm_eps)
        ctx = llama.rms_norm(context, lp["input_context_norm"],
                             pcfg.rms_norm_eps)
        kv_in = jnp.concatenate([ctx, lat], axis=1)
        q = (lat @ lp["q_proj"]).reshape(n, L, hq, dh)
        k = (kv_in @ lp["k_proj"]).reshape(n, P + L, hk, dh)
        v = (kv_in @ lp["v_proj"]).reshape(n, P + L, hk, dh)
        if attn_impl == "xla":
            attn = mha_reference(q, k, v, causal=False, segment_ids=q_seg,
                                 kv_segment_ids=kv_seg,
                                 softmax_scale=scale)
        else:
            attn = flash_attention(q, k, v, causal=False,
                                   segment_ids=q_seg,
                                   kv_segment_ids=kv_seg,
                                   softmax_scale=scale,
                                   implementation=attn_impl)
        latents = residual + attn.reshape(n, L, hq * dh) @ lp["o_proj"]
        residual = latents
        x = llama.rms_norm(latents, lp["post_attention_layernorm"],
                           pcfg.rms_norm_eps)
        return residual + _silu_mlp(x, lp["mlp_gate"], lp["mlp_up"],
                                    lp["mlp_down"]), None

    latents, _ = jax.lax.scan(layer, latents, pp["layers"])
    return llama.rms_norm(latents, pp["norm"], pcfg.rms_norm_eps)


def connector(params, cfg: Idefics2Config, image_hidden, patch_mask,
              attn_impl=None):
    cp = params["connector"]
    x = _silu_mlp(image_hidden.astype(cp["mp_gate"].dtype),
                  cp["mp_gate"], cp["mp_up"], cp["mp_down"])
    return perceiver_resampler(cp["perceiver"], cfg.perceiver_config, x,
                               patch_mask, attn_impl=attn_impl)


def encode_images(params, cfg: Idefics2Config, pixel_values, patch_mask,
                  patch_position_ids, attn_impl=None, use_remat=False):
    hidden = vision_forward(params, cfg, pixel_values, patch_mask,
                            patch_position_ids, attn_impl=attn_impl,
                            use_remat=use_remat)
    return connector(params, cfg, hidden, patch_mask, attn_impl=attn_impl)


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------

def forward(
    params,
    cfg: Idefics2Config,
    *,
    input_ids: jax.Array,
    pixel_values: Optional[jax.Array] = None,
    patch_mask: Optional[jax.Array] = None,
    patch_position_ids: Optional[jax.Array] = None,
    positions: Optional[jax.Array] = None,
    segment_ids: Optional[jax.Array] = None,
    labels: Optional[jax.Array] = None,
    kv_cache: Optional[KVCache] = None,
    attn_impl: Optional[str] = None,
    use_remat: bool = False,
    context_attention=None,
    labels_preshifted: bool = False,
):
    embeds = params["language_model"]["embed_tokens"][input_ids]
    if pixel_values is not None and input_ids.shape[1] > 1:
        if patch_mask is None:
            n = pixel_values.shape[0]
            P = cfg.vision_config.num_patches
            patch_mask = jnp.ones((n, P), jnp.int32)
            side = cfg.vision_config.image_size // cfg.vision_config.patch_size
            pos = navit_position_ids(side, side, side)
            patch_position_ids = jnp.broadcast_to(
                jnp.asarray(pos)[None], (n, P))
        image_features = encode_images(
            params, cfg, pixel_values, patch_mask, patch_position_ids,
            attn_impl=attn_impl, use_remat=use_remat)
        embeds = merge_image_features(
            embeds, input_ids, image_features, cfg.image_token_id)

    logits, new_cache = llama.forward(
        params["language_model"], cfg.text_config,
        inputs_embeds=embeds, positions=positions,
        segment_ids=segment_ids, kv_cache=kv_cache,
        attn_impl=attn_impl, use_remat=use_remat,
        context_attention=context_attention)
    loss = None
    if labels is not None:
        mask = None if segment_ids is None else (segment_ids != 0)
        loss = cross_entropy_loss(logits, labels, mask, cfg.ignore_index,
                                  shift=not labels_preshifted)
    return logits, loss, new_cache


def forward_classification(
    params, cfg: Idefics2Config, *, input_ids, pixel_values=None,
    patch_mask=None, patch_position_ids=None, segment_ids=None,
    attn_impl=None, use_remat=False,
):
    """Sequence classification: pool the last non-pad token's hidden
    state -> score head (reference: modeling_idefics2.py:2017-2115)."""
    embeds = params["language_model"]["embed_tokens"][input_ids]
    if pixel_values is not None:
        feats = encode_images(params, cfg, pixel_values, patch_mask,
                              patch_position_ids, attn_impl=attn_impl,
                              use_remat=use_remat)
        embeds = merge_image_features(embeds, input_ids, feats,
                                      cfg.image_token_id)
    b, s, _ = embeds.shape
    if segment_ids is None:
        segment_ids = jnp.ones((b, s), jnp.int32)
    hidden, _ = llama.forward(
        params["language_model"], cfg.text_config, inputs_embeds=embeds,
        segment_ids=segment_ids, attn_impl=attn_impl,
        use_remat=use_remat, return_hidden=True)
    last = jnp.sum(segment_ids != 0, axis=1) - 1
    pooled = jnp.take_along_axis(
        hidden, last[:, None, None], axis=1)[:, 0]
    return pooled @ params["score"]
