"""Video-LLaVA: twin CLIP towers (image + video) + shared MLP projector
+ LLaMA/Vicuna decoder.

TPU-native equivalent of the reference's Video-LLaVA training target
(reference: mantis/train/train_videollava.py loads HF
``VideoLlavaForConditionalGeneration`` from
``LanguageBind/Video-LLaVA-7B-hf`` with ``use_video_encoder=True``).
Behavioral mapping against the HF model it wraps:

- ``get_image_features``: image tower, feature layer -2, strategy
  "default" drops the CLS token, then the shared 2-layer MLP projector.
- ``get_video_features``: the video tower runs per frame over
  ``pixel_values_videos [Nv, F, C, H, W]``; NO select strategy is
  applied (the CLS token is KEPT per frame — an HF quirk we reproduce),
  then the same projector.  Flattened frame-major ordering fills the
  ``<video>`` placeholder run.
- Both feature sets are scattered over their placeholder token runs;
  here the processor/dataset pre-expands placeholders to static shapes
  and the model splices with a cumsum-ordered gather (same machinery as
  mllava, see mantis_tpu/models/mllava/model.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from mantis_tpu.models import llama, vit
from mantis_tpu.models.configs import LlamaConfig, VisionConfig
from mantis_tpu.models.llama import KVCache
from mantis_tpu.models.mllava.model import (cross_entropy_loss,
                                            merge_image_features)


@dataclasses.dataclass(frozen=True)
class VideoLlavaConfig:
    """Mirrors HF ``VideoLlavaConfig`` (configuration_video_llava.py)."""

    vision_config: VisionConfig = dataclasses.field(
        default_factory=lambda: VisionConfig(
            tower_type="clip", hidden_size=1024, intermediate_size=4096,
            num_hidden_layers=24, num_attention_heads=16,
            image_size=224, patch_size=14))
    text_config: LlamaConfig = dataclasses.field(
        default_factory=lambda: LlamaConfig(
            vocab_size=32064, hidden_size=4096, intermediate_size=11008,
            num_hidden_layers=32, num_attention_heads=32,
            num_key_value_heads=32, rope_theta=10000.0))
    image_token_index: int = 32000
    video_token_index: int = 32001
    ignore_index: int = -100
    vision_feature_layer: int = -2
    vision_feature_select_strategy: str = "default"
    num_frames: int = 8
    pad_token_id: Optional[int] = None

    @property
    def num_image_tokens(self) -> int:
        n = self.vision_config.num_positions
        if self.vision_feature_select_strategy == "default":
            n -= 1
        return n

    @property
    def num_video_tokens_per_frame(self) -> int:
        # HF get_video_features applies no select strategy: CLS kept.
        return self.vision_config.num_positions

    @property
    def num_video_tokens(self) -> int:
        return self.num_frames * self.num_video_tokens_per_frame

    @classmethod
    def from_hf_config(cls, cfg: Any) -> "VideoLlavaConfig":
        get = (cfg.get if isinstance(cfg, dict)
               else lambda k, d=None: getattr(cfg, k, d))
        vis, txt = get("vision_config"), get("text_config")
        return cls(
            vision_config=VisionConfig.from_hf_config(
                vis, tower_type="clip"),
            text_config=LlamaConfig.from_hf_config(txt),
            image_token_index=get("image_token_index", 32000),
            video_token_index=get("video_token_index", 32001),
            vision_feature_layer=get("vision_feature_layer", -2),
            vision_feature_select_strategy=get(
                "vision_feature_select_strategy", "default"),
            num_frames=get("num_frames", 8),
            pad_token_id=get("pad_token_id", None),
        )


def init_params(cfg: VideoLlavaConfig, key: jax.Array,
                dtype=jnp.float32):
    ki, kv, kp, kl = jax.random.split(key, 4)
    dv = cfg.vision_config.hidden_size
    dt = cfg.text_config.hidden_size

    def norm(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * 0.02
                ).astype(dtype)

    k1, k2 = jax.random.split(kp)
    return {
        "image_tower": vit.init_params(cfg.vision_config, ki, dtype),
        "video_tower": vit.init_params(cfg.vision_config, kv, dtype),
        "multi_modal_projector": {
            "linear_1": norm(k1, (dv, dt)),
            "linear_1_b": jnp.zeros((dt,), dtype),
            "linear_2": norm(k2, (dt, dt)),
            "linear_2_b": jnp.zeros((dt,), dtype),
        },
        "language_model": llama.init_params(cfg.text_config, kl, dtype),
    }


def _project(params, feats: jax.Array) -> jax.Array:
    p = params["multi_modal_projector"]
    x = feats.astype(p["linear_1"].dtype) @ p["linear_1"] + p["linear_1_b"]
    x = jax.nn.gelu(x, approximate=False)
    return x @ p["linear_2"] + p["linear_2_b"]


def encode_images(params, cfg: VideoLlavaConfig, pixel_values: jax.Array,
                  *, attn_impl: Optional[str] = None,
                  use_remat: bool = False) -> jax.Array:
    """[N, C, H, W] -> [N, P, Dt] (CLS dropped under "default")."""
    feats = vit.encode_images(
        params["image_tower"], cfg.vision_config, pixel_values,
        vision_feature_layer=cfg.vision_feature_layer,
        vision_feature_select_strategy=cfg.vision_feature_select_strategy,
        attn_impl=attn_impl, use_remat=use_remat)
    return _project(params, feats)


def encode_videos(params, cfg: VideoLlavaConfig,
                  pixel_values_videos: jax.Array,
                  *, attn_impl: Optional[str] = None,
                  use_remat: bool = False) -> jax.Array:
    """[Nv, F, C, H, W] -> [Nv, F*P1, Dt] with P1 = positions (CLS
    kept), matching HF get_video_features."""
    nv, f, c, h, w = pixel_values_videos.shape
    flat = pixel_values_videos.reshape(nv * f, c, h, w)
    feats = vit.encode_images(
        params["video_tower"], cfg.vision_config, flat,
        vision_feature_layer=cfg.vision_feature_layer,
        vision_feature_select_strategy="full",  # CLS kept (HF parity)
        attn_impl=attn_impl, use_remat=use_remat)
    proj = _project(params, feats)  # [Nv*F, P1, Dt]
    return proj.reshape(nv, f * proj.shape[1], proj.shape[2])


def forward(
    params,
    cfg: VideoLlavaConfig,
    *,
    input_ids: jax.Array,
    pixel_values: Optional[jax.Array] = None,
    pixel_values_videos: Optional[jax.Array] = None,
    positions: Optional[jax.Array] = None,
    segment_ids: Optional[jax.Array] = None,
    labels: Optional[jax.Array] = None,
    kv_cache: Optional[KVCache] = None,
    attn_impl: Optional[str] = None,
    use_remat: bool = False,
    labels_preshifted: bool = False,
    image_feature_idx: Optional[jax.Array] = None,
) -> Tuple[Optional[jax.Array], Optional[jax.Array], Optional[KVCache]]:
    """Returns (logits, loss or None, new_cache or None).

    Decode steps pass pixel_values(_videos)=None (media in the cache).
    """
    embeds = params["language_model"]["embed_tokens"][input_ids]
    if input_ids.shape[1] > 1:
        if pixel_values is not None:
            feats = encode_images(params, cfg, pixel_values,
                                  attn_impl=attn_impl,
                                  use_remat=use_remat)
            embeds = merge_image_features(
                embeds, input_ids, feats, cfg.image_token_index,
                feature_idx=image_feature_idx)
        if pixel_values_videos is not None:
            vfeats = encode_videos(params, cfg, pixel_values_videos,
                                   attn_impl=attn_impl,
                                   use_remat=use_remat)
            embeds = merge_image_features(
                embeds, input_ids, vfeats, cfg.video_token_index)

    logits, new_cache = llama.forward(
        params["language_model"], cfg.text_config,
        inputs_embeds=embeds, positions=positions,
        segment_ids=segment_ids, kv_cache=kv_cache,
        attn_impl=attn_impl, use_remat=use_remat)

    loss = None
    if labels is not None:
        mask = None if segment_ids is None else (segment_ids != 0)
        loss = cross_entropy_loss(logits, labels, mask,
                                  cfg.ignore_index,
                                  shift=not labels_preshifted)
    return logits, loss, new_cache
