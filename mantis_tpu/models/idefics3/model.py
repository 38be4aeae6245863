"""Idefics3 — NaViT vision + pixel-shuffle connector + LLaMA-3 LM.

Reference: mantis/models/idefics3/ (vendored pre-release HF port,
modeling_idefics3.py:1024 ``Idefics3ForConditionalGeneration``,
:642 ``Idefics3Connector``).  Shares the Idefics2 NaViT vision tower
machinery (host-computed patch masks/position ids) and replaces the
perceiver with a pixel-shuffle (scale 2) + single linear projection;
the LM is LLaMA-3.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from mantis_tpu.models import llama
from mantis_tpu.models.configs import LlamaConfig, VisionConfig
from mantis_tpu.models.idefics2.model import (
    build_patch_grid,
    navit_position_ids,
    vision_forward as _navit_vision_forward,
)
from mantis_tpu.models.llama import KVCache
from mantis_tpu.models.mllava.model import (
    cross_entropy_loss,
    merge_image_features,
)


@dataclasses.dataclass(frozen=True)
class Idefics3Config:
    vision_config: VisionConfig = dataclasses.field(
        default_factory=lambda: VisionConfig(
            tower_type="siglip", hidden_size=1152, intermediate_size=4304,
            num_hidden_layers=27, num_attention_heads=16, image_size=364,
            patch_size=14, layer_norm_eps=1e-6))
    text_config: LlamaConfig = dataclasses.field(
        default_factory=lambda: LlamaConfig(
            vocab_size=128259, hidden_size=4096,
            intermediate_size=14336, num_hidden_layers=32,
            num_attention_heads=32, num_key_value_heads=8,
            rope_theta=500000.0))
    scale_factor: int = 2
    image_token_id: int = 128257
    ignore_index: int = -100

    @property
    def num_image_tokens(self) -> int:
        side = self.vision_config.image_size // self.vision_config.patch_size
        return (side // self.scale_factor) ** 2

    @classmethod
    def from_hf_config(cls, cfg) -> "Idefics3Config":
        get = (cfg.get if isinstance(cfg, dict)
               else lambda k, d=None: getattr(cfg, k, d))
        return cls(
            vision_config=VisionConfig.from_hf_config(
                get("vision_config"), tower_type="siglip"),
            text_config=LlamaConfig.from_hf_config(get("text_config")),
            scale_factor=get("scale_factor", 2),
            image_token_id=get("image_token_id", 128257),
        )


def init_params(cfg: Idefics3Config, key, dtype=jnp.float32):
    from mantis_tpu.models import vit

    kv, kc, kl = jax.random.split(key, 3)
    din = cfg.vision_config.hidden_size * cfg.scale_factor ** 2
    return {
        "vision_tower": vit.init_params(cfg.vision_config, kv, dtype),
        "connector": {
            "proj": (jax.random.normal(
                kc, (din, cfg.text_config.hidden_size), jnp.float32)
                * 0.02).astype(dtype),
        },
        "language_model": llama.init_params(cfg.text_config, kl, dtype),
    }


def pixel_shuffle_idefics3(x: jax.Array, scale: int = 2) -> jax.Array:
    """[N, seq, D] (square grid) -> [N, seq/s^2, D*s^2] (HF semantics)."""
    n, seq, d = x.shape
    side = int(seq ** 0.5)
    x = x.reshape(n, side, side, d)
    x = x.reshape(n, side, side // scale, d * scale)
    x = x.transpose(0, 2, 1, 3)
    x = x.reshape(n, side // scale, side // scale, d * scale * scale)
    x = x.transpose(0, 2, 1, 3)
    return x.reshape(n, seq // (scale * scale), d * scale * scale)


def encode_images(params, cfg: Idefics3Config, pixel_values, patch_mask,
                  patch_position_ids, attn_impl=None, use_remat=False):
    class _C:
        vision_config = cfg.vision_config

    hidden = _navit_vision_forward(
        params, _C, pixel_values, patch_mask, patch_position_ids,
        attn_impl=attn_impl, use_remat=use_remat)
    feats = pixel_shuffle_idefics3(hidden, cfg.scale_factor)
    return feats @ params["connector"]["proj"]


def forward(
    params, cfg: Idefics3Config, *, input_ids,
    pixel_values=None, patch_mask=None, patch_position_ids=None,
    positions=None, segment_ids=None, labels=None,
    kv_cache: Optional[KVCache] = None, attn_impl=None,
    use_remat=False,
):
    embeds = params["language_model"]["embed_tokens"][input_ids]
    if pixel_values is not None and input_ids.shape[1] > 1:
        if patch_mask is None:
            n = pixel_values.shape[0]
            P = cfg.vision_config.num_patches
            side = cfg.vision_config.image_size // cfg.vision_config.patch_size
            patch_mask = jnp.ones((n, P), jnp.int32)
            pos = navit_position_ids(side, side, side)
            patch_position_ids = jnp.broadcast_to(
                jnp.asarray(pos)[None], (n, P))
        feats = encode_images(params, cfg, pixel_values, patch_mask,
                              patch_position_ids, attn_impl=attn_impl,
                              use_remat=use_remat)
        embeds = merge_image_features(embeds, input_ids, feats,
                                      cfg.image_token_id)
    logits, new_cache = llama.forward(
        params["language_model"], cfg.text_config, inputs_embeds=embeds,
        positions=positions, segment_ids=segment_ids, kv_cache=kv_cache,
        attn_impl=attn_impl, use_remat=use_remat)
    loss = None
    if labels is not None:
        mask = None if segment_ids is None else (segment_ids != 0)
        loss = cross_entropy_loss(logits, labels, mask, cfg.ignore_index)
    return logits, loss, new_cache
