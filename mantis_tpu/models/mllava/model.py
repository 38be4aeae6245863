"""MLlava: vision tower + MLP projector + LLaMA decoder.

TPU-native equivalent of the reference flagship model
(reference: mantis/models/mllava/modeling_llava.py:251-605,
``LlavaForConditionalGeneration``).  Key behavioral mapping:

- The reference's dynamic scatter-merge ``_merge_input_ids_with_image_
  features`` (modeling_llava.py:293-360) expands each single ``<image>``
  token into N patch embeddings at runtime, which is shape-dynamic.  Here
  the processor pre-expands ``<image>`` into N copies of the image token
  id (static shapes), and the model splices patch embeddings over those
  positions with a cumsum-ordered gather — numerically identical final
  sequences.
- Eval-time vision micro-batching (modeling_llava.py:437-441) is
  unnecessary on TPU: the ViT runs as one batched XLA computation.
- The masked-shift CE loss matches modeling_llava.py:523-537.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mantis_tpu.models import llama, vit
from mantis_tpu.models.configs import LlavaConfig
from mantis_tpu.models.llama import KVCache


def init_params(cfg: LlavaConfig, key: jax.Array, dtype=jnp.float32):
    kv, kp, kl = jax.random.split(key, 3)
    dv, dt = cfg.vision_config.hidden_size, cfg.text_config.hidden_size

    def norm(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * 0.02).astype(dtype)

    k1, k2 = jax.random.split(kp)
    return {
        "vision_tower": vit.init_params(cfg.vision_config, kv, dtype),
        "multi_modal_projector": {
            "linear_1": norm(k1, (dv, dt)),
            "linear_1_b": jnp.zeros((dt,), dtype),
            "linear_2": norm(k2, (dt, dt)),
            "linear_2_b": jnp.zeros((dt,), dtype),
        },
        "language_model": llama.init_params(cfg.text_config, kl, dtype),
    }


def init_mllava_xattn_params(cfg: LlavaConfig, key,
                             dtype=jnp.float32):
    """Extra params for the MLlava cross-image variant (reference:
    modeling_llava.py:606-712 ``MLlavaForConditionalGeneration``):
    per-image type embeddings (type_vocab_size=144) + a second
    CLIP-encoder stack run over the tapped image features before the
    projector.  The reference flags this as a debug/ablation path (it
    re-inits the stack from clip-vit at load, train_mllava.py:207-210);
    flagship releases use the plain model."""
    from mantis_tpu.models import vit as vit_lib

    k1, k2 = jax.random.split(key)
    enc = vit_lib.init_params(cfg.vision_config, k2, dtype)
    return {
        "image_type_embeddings": (jax.random.normal(
            k1, (cfg.type_vocab_size, cfg.vision_config.hidden_size),
            jnp.float32) * 0.02).astype(dtype),
        "vision_xatten_layers": enc["layers"],
    }


def apply_cross_image_layers(xattn_params, cfg: LlavaConfig,
                             feats: jax.Array) -> jax.Array:
    """feats [N_images, P, Dv] + type embedding per image, then the
    extra encoder stack (per-image attention; cross-image mixing enters
    through the shared type embeddings, exactly like the reference)."""
    from mantis_tpu.models import vit as vit_lib

    n = feats.shape[0]
    type_emb = xattn_params["image_type_embeddings"][
        jnp.arange(n) % cfg.type_vocab_size]
    feats = feats + type_emb[:, None, :].astype(feats.dtype)
    return vit_lib.encoder(
        {"layers": xattn_params["vision_xatten_layers"]},
        cfg.vision_config, feats)


def project_image_features(params, cfg: LlavaConfig, feats: jax.Array
                           ) -> jax.Array:
    """2-layer MLP projector (reference: modeling_llava.py:157-170)."""
    p = params["multi_modal_projector"]
    x = feats.astype(p["linear_1"].dtype) @ p["linear_1"] + p["linear_1_b"]
    x = jax.nn.gelu(x, approximate=False)
    return x @ p["linear_2"] + p["linear_2_b"]


def encode_images(params, cfg: LlavaConfig, pixel_values: jax.Array,
                  *, attn_impl: Optional[str] = None,
                  use_remat: bool = False) -> jax.Array:
    """pixel_values [N, C, H, W] -> projected features [N, P, Dt]."""
    feats = vit.encode_images(
        params["vision_tower"], cfg.vision_config, pixel_values,
        vision_feature_layer=cfg.vision_feature_layer,
        vision_feature_select_strategy=cfg.vision_feature_select_strategy,
        attn_impl=attn_impl, use_remat=use_remat)
    if "mllava_xattn" in params:  # cross-image variant
        feats = apply_cross_image_layers(
            params["mllava_xattn"], cfg, feats)
    return project_image_features(params, cfg, feats)


def merge_image_features(
    inputs_embeds: jax.Array,
    input_ids: jax.Array,
    image_features: jax.Array,
    image_token_index: int,
    feature_idx: Optional[jax.Array] = None,
) -> jax.Array:
    """Splice patch embeddings over (pre-expanded) image-token positions.

    inputs_embeds: [B, S, D]; image_features: [N, P, D].  The i-th image
    token position (row-major over the batch) receives the i-th row of the
    flattened image features — the same ordering as the reference's
    cumsum-based scatter (modeling_llava.py:309-353).

    feature_idx: optional [B, S] int map position -> flat feature row,
    REQUIRED whenever the sequence axis has been permuted after
    tokenization (context-parallel zigzag reorder): a cumsum over the
    permuted order would pair image tokens with the wrong image.  The
    Collator computes it on the original order and permutes it alongside
    input_ids.
    """
    b, s, d = inputs_embeds.shape
    flat = image_features.reshape(-1, d).astype(inputs_embeds.dtype)
    is_img = (input_ids == image_token_index).reshape(-1)
    if feature_idx is None:
        idx = jnp.cumsum(is_img) - 1
    else:
        idx = feature_idx.reshape(-1)
    idx = jnp.clip(idx, 0, flat.shape[0] - 1)
    gathered = flat[idx].reshape(b, s, d)
    return jnp.where(is_img.reshape(b, s)[..., None], gathered,
                     inputs_embeds)


def cross_entropy_loss(logits: jax.Array, labels: jax.Array,
                       attention_mask: Optional[jax.Array] = None,
                       ignore_index: int = -100,
                       shift: bool = True) -> jax.Array:
    """Masked shifted CE (reference: modeling_llava.py:523-537).

    shift=False is the context-parallel path: labels were pre-shifted
    globally BEFORE zigzag reordering (a local shift would cross chunk
    boundaries incorrectly)."""
    if shift:
        shift_logits = logits[:, :-1].astype(jnp.float32)
        shift_labels = labels[:, 1:]
        mask_sl = attention_mask[:, 1:] if attention_mask is not None \
            else None
    else:
        shift_logits = logits.astype(jnp.float32)
        shift_labels = labels
        mask_sl = attention_mask
    valid = shift_labels != ignore_index
    if mask_sl is not None:
        valid = valid & (mask_sl != 0)
    safe_labels = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    token_ll = jnp.take_along_axis(
        logp, safe_labels[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(jnp.sum(valid), 1)
    return -jnp.sum(jnp.where(valid, token_ll, 0.0)) / denom


def forward(
    params,
    cfg: LlavaConfig,
    *,
    input_ids: jax.Array,
    pixel_values: Optional[jax.Array] = None,
    positions: Optional[jax.Array] = None,
    segment_ids: Optional[jax.Array] = None,
    labels: Optional[jax.Array] = None,
    kv_cache: Optional[KVCache] = None,
    attn_impl: Optional[str] = None,
    use_remat: bool = False,
    context_attention=None,
    labels_preshifted: bool = False,
    image_feature_idx: Optional[jax.Array] = None,
    vision_dp_mesh=None,
    vision_dp_axis: str = "context",
    loss_chunk_size: Optional[int] = None,
    cache_attention: Optional[bool] = None,
    layer_update_hook=None,
    mlp_chunk: Optional[int] = None,
) -> Tuple[Optional[jax.Array], Optional[jax.Array], Optional[KVCache]]:
    """Full forward.  Returns (logits, loss or None, new_cache or None).

    For decode steps pass pixel_values=None (images live in the cache).
    segment_ids doubles as the padding/packing mask (0 = pad).
    """
    embeds = params["language_model"]["embed_tokens"][input_ids]
    if pixel_values is not None and pixel_values.shape[0] == 0:
        pixel_values = None   # 0-image batch: clean text-only forward
    if pixel_values is not None and input_ids.shape[1] > 1:
        def _enc(pix):
            return encode_images(params, cfg, pix, attn_impl=attn_impl,
                                 use_remat=use_remat)
        if vision_dp_mesh is not None:
            # shard the image batch across the ring/context group
            # (reference: modeling_internvl_chat.py:200-228)
            from mantis_tpu.parallel.vision_dp import (
                make_context_vision_encoder)

            _enc = make_context_vision_encoder(
                _enc, vision_dp_mesh, vision_dp_axis)
        image_features = _enc(pixel_values)
        embeds = merge_image_features(
            embeds, input_ids, image_features, cfg.image_token_index,
            feature_idx=image_feature_idx)

    if labels is not None and loss_chunk_size:
        # liger-equivalent chunked CE: skip materializing [B, S, V]
        # logits entirely (ops/chunked_ce.py); logits return is None.
        from mantis_tpu.ops.chunked_ce import chunked_cross_entropy

        hidden, new_cache = llama.forward(
            params["language_model"], cfg.text_config,
            inputs_embeds=embeds, positions=positions,
            segment_ids=segment_ids, kv_cache=kv_cache,
            attn_impl=attn_impl, use_remat=use_remat,
            context_attention=context_attention, return_hidden=True,
            layer_update_hook=layer_update_hook, mlp_chunk=mlp_chunk)
        lm = params["language_model"]
        w = (lm["lm_head"] if "lm_head" in lm
             else lm["embed_tokens"].T)
        if labels_preshifted:
            aligned = labels
        else:
            aligned = jnp.concatenate(
                [labels[:, 1:],
                 jnp.full((labels.shape[0], 1), cfg.ignore_index,
                          labels.dtype)], axis=1)
        valid = aligned != cfg.ignore_index
        if segment_ids is not None:
            valid = valid & (segment_ids != 0)
        loss = chunked_cross_entropy(hidden, w, aligned, valid,
                                     loss_chunk_size)
        return None, loss, new_cache

    logits, new_cache = llama.forward(
        params["language_model"], cfg.text_config,
        inputs_embeds=embeds, positions=positions, segment_ids=segment_ids,
        kv_cache=kv_cache, attn_impl=attn_impl, use_remat=use_remat,
        context_attention=context_attention,
        cache_attention=cache_attention,
        layer_update_hook=layer_update_hook, mlp_chunk=mlp_chunk)

    loss = None
    if labels is not None:
        mask = None if segment_ids is None else (segment_ids != 0)
        loss = cross_entropy_loss(logits, labels, mask, cfg.ignore_index,
                                  shift=not labels_preshifted)
    return logits, loss, new_cache
