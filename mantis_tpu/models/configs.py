"""Model configuration dataclasses.

Replaces the reference's HF ``PretrainedConfig`` hierarchy
(reference: mantis/models/mllava/configuration_llava.py:86-102) with plain
dataclasses; ``from_hf_config`` constructors map HF json configs onto them
so checkpoints interoperate.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    """LLaMA-family decoder config (covers LLaMA-2/3, Mistral)."""

    vocab_size: int = 128256
    hidden_size: int = 4096
    intermediate_size: int = 14336
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    head_dim: Optional[int] = None
    rms_norm_eps: float = 1e-5
    rope_theta: float = 500000.0
    max_position_embeddings: int = 8192
    tie_word_embeddings: bool = False
    attention_bias: bool = False
    mlp_bias: bool = False
    # M-RoPE (Qwen2-VL): per-axis rotary sections summing to head_dim/2;
    # None = standard 1-D rope.
    mrope_section: 'Optional[tuple]' = None
    # Mistral sliding-window attention (reference Idefics2 inherits it
    # via attn_implementation, modeling_idefics2.py:1498); None = full.
    sliding_window: Optional[int] = None

    @property
    def head_dim_(self) -> int:
        return self.head_dim or self.hidden_size // self.num_attention_heads

    @classmethod
    def from_hf_config(cls, cfg: Any) -> "LlamaConfig":
        get = (cfg.get if isinstance(cfg, dict)
               else lambda k, d=None: getattr(cfg, k, d))
        return cls(
            vocab_size=get("vocab_size"),
            hidden_size=get("hidden_size"),
            intermediate_size=get("intermediate_size"),
            num_hidden_layers=get("num_hidden_layers"),
            num_attention_heads=get("num_attention_heads"),
            num_key_value_heads=get("num_key_value_heads",
                                    get("num_attention_heads")),
            head_dim=get("head_dim", None),
            rms_norm_eps=get("rms_norm_eps", 1e-5),
            rope_theta=get("rope_theta", 10000.0),
            max_position_embeddings=get("max_position_embeddings", 8192),
            tie_word_embeddings=get("tie_word_embeddings", False),
            attention_bias=get("attention_bias", False),
            mlp_bias=get("mlp_bias", False),
            sliding_window=get("sliding_window", None),
            mrope_section=tuple(get("rope_scaling")["mrope_section"])
            if isinstance(get("rope_scaling"), dict)
            and "mrope_section" in get("rope_scaling") else None,
        )


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    """CLIP/SigLIP vision tower config.

    ``tower_type`` selects the architectural family:
      'clip'   — class embedding + pre-layernorm, quick_gelu
      'siglip' — no class token, conv bias, gelu_pytorch_tanh
    """

    tower_type: str = "clip"
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    image_size: int = 336
    patch_size: int = 14
    layer_norm_eps: float = 1e-5
    num_channels: int = 3

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def num_positions(self) -> int:
        return self.num_patches + (1 if self.tower_type == "clip" else 0)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def from_hf_config(cls, cfg: Any, tower_type: Optional[str] = None
                       ) -> "VisionConfig":
        get = (cfg.get if isinstance(cfg, dict)
               else lambda k, d=None: getattr(cfg, k, d))
        if tower_type is None:
            mt = get("model_type", "clip_vision_model")
            tower_type = "siglip" if "siglip" in mt else "clip"
        return cls(
            tower_type=tower_type,
            hidden_size=get("hidden_size"),
            intermediate_size=get("intermediate_size"),
            num_hidden_layers=get("num_hidden_layers"),
            num_attention_heads=get("num_attention_heads"),
            image_size=get("image_size"),
            patch_size=get("patch_size"),
            layer_norm_eps=get("layer_norm_eps", 1e-6),
            num_channels=get("num_channels", 3),
        )


@dataclasses.dataclass(frozen=True)
class LlavaConfig:
    """MLlava (vision tower + MLP projector + LLaMA decoder).

    Mirrors the reference's LlavaConfig fields
    (reference: mantis/models/mllava/configuration_llava.py:86-102).
    """

    vision_config: VisionConfig = dataclasses.field(
        default_factory=VisionConfig)
    text_config: LlamaConfig = dataclasses.field(default_factory=LlamaConfig)
    image_token_index: int = 32000
    ignore_index: int = -100
    # MLlava cross-image variant (reference modeling_llava.py:618-621)
    type_vocab_size: int = 144
    vision_feature_layer: int = -2
    vision_feature_select_strategy: str = "default"
    projector_hidden_act: str = "gelu"
    pad_token_id: Optional[int] = None

    @property
    def num_image_tokens(self) -> int:
        """Patch tokens contributed per image after feature selection."""
        n = self.vision_config.num_positions
        if self.vision_feature_select_strategy == "default":
            # index 0 dropped unconditionally, matching the reference
            # (modeling_llava.py:444-445) — even for SigLIP.
            n -= 1
        return n

    @classmethod
    def from_hf_config(cls, cfg: Any) -> "LlavaConfig":
        get = (cfg.get if isinstance(cfg, dict)
               else lambda k, d=None: getattr(cfg, k, d))
        return cls(
            vision_config=VisionConfig.from_hf_config(get("vision_config")),
            text_config=LlamaConfig.from_hf_config(get("text_config")),
            image_token_index=get("image_token_index", 32000),
            ignore_index=get("ignore_index", -100),
            vision_feature_layer=get("vision_feature_layer", -2),
            vision_feature_select_strategy=get(
                "vision_feature_select_strategy", "default"),
            projector_hidden_act=get("projector_hidden_act", "gelu"),
            pad_token_id=get("pad_token_id", None),
        )
