"""Export mantis_tpu params back to HuggingFace checkpoint format.

Covers the reference's final-save + hub-upload workflow
(reference: mantis/train/train_mllava.py:330-345 ``trainer.save_model``;
mantis/train/upload_checkpoint.py) minus the network push: the output
directory is a standard HF Llava checkpoint loadable by
``transformers.LlavaForConditionalGeneration.from_pretrained``.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import numpy as np

from mantis_tpu.models.configs import LlavaConfig


def _t(x) -> np.ndarray:
    return np.asarray(x).T


def _n(x) -> np.ndarray:
    return np.asarray(x)


def llama_state_dict(params, prefix: str = "model.",
                     lm_head_key: str = "lm_head.weight") -> Dict:
    sd = {}
    sd[prefix + "embed_tokens.weight"] = _n(params["embed_tokens"])
    sd[prefix + "norm.weight"] = _n(params["norm"])
    layers = params["layers"]
    L = layers["q_proj"].shape[0]
    names = [
        ("input_layernorm.weight", "input_layernorm", False),
        ("post_attention_layernorm.weight", "post_attention_layernorm",
         False),
        ("self_attn.q_proj.weight", "q_proj", True),
        ("self_attn.k_proj.weight", "k_proj", True),
        ("self_attn.v_proj.weight", "v_proj", True),
        ("self_attn.o_proj.weight", "o_proj", True),
        ("mlp.gate_proj.weight", "gate_proj", True),
        ("mlp.up_proj.weight", "up_proj", True),
        ("mlp.down_proj.weight", "down_proj", True),
    ]
    for i in range(L):
        for hf_name, ours, transpose in names:
            w = np.asarray(layers[ours][i])
            sd[f"{prefix}layers.{i}.{hf_name}"] = w.T if transpose else w
    if "lm_head" in params:
        sd[lm_head_key] = _t(params["lm_head"])
    return sd


def vit_state_dict(params, cfg, prefix: str = "vision_model.") -> Dict:
    sd = {}
    p = cfg.patch_size
    d = cfg.hidden_size
    patch = np.asarray(params["patch_embedding"]).T.reshape(
        d, cfg.num_channels, p, p)
    sd[prefix + "embeddings.patch_embedding.weight"] = patch
    sd[prefix + "embeddings.position_embedding.weight"] = _n(
        params["position_embedding"])
    if cfg.tower_type == "clip":
        sd[prefix + "embeddings.class_embedding"] = _n(
            params["class_embedding"])
        sd[prefix + "pre_layrnorm.weight"] = _n(params["pre_ln_scale"])
        sd[prefix + "pre_layrnorm.bias"] = _n(params["pre_ln_bias"])
    else:
        sd[prefix + "embeddings.patch_embedding.bias"] = _n(
            params["patch_bias"])
    sd[prefix + "post_layernorm.weight"] = _n(params["post_ln_scale"])
    sd[prefix + "post_layernorm.bias"] = _n(params["post_ln_bias"])
    layers = params["layers"]
    L = layers["q"].shape[0]
    names = [
        ("layer_norm1.weight", "ln1_scale", False),
        ("layer_norm1.bias", "ln1_bias", False),
        ("self_attn.q_proj.weight", "q", True),
        ("self_attn.q_proj.bias", "q_b", False),
        ("self_attn.k_proj.weight", "k", True),
        ("self_attn.k_proj.bias", "k_b", False),
        ("self_attn.v_proj.weight", "v", True),
        ("self_attn.v_proj.bias", "v_b", False),
        ("self_attn.out_proj.weight", "o", True),
        ("self_attn.out_proj.bias", "o_b", False),
        ("layer_norm2.weight", "ln2_scale", False),
        ("layer_norm2.bias", "ln2_bias", False),
        ("mlp.fc1.weight", "fc1", True),
        ("mlp.fc1.bias", "fc1_b", False),
        ("mlp.fc2.weight", "fc2", True),
        ("mlp.fc2.bias", "fc2_b", False),
    ]
    for i in range(L):
        for hf_name, ours, transpose in names:
            w = np.asarray(layers[ours][i])
            sd[f"{prefix}encoder.layers.{i}.{hf_name}"] = (
                w.T if transpose else w)
    return sd


def llava_state_dict(params, cfg: LlavaConfig) -> Dict:
    sd = {}
    sd.update(vit_state_dict(params["vision_tower"], cfg.vision_config,
                             prefix="vision_tower.vision_model."))
    mp = params["multi_modal_projector"]
    sd["multi_modal_projector.linear_1.weight"] = _t(mp["linear_1"])
    sd["multi_modal_projector.linear_1.bias"] = _n(mp["linear_1_b"])
    sd["multi_modal_projector.linear_2.weight"] = _t(mp["linear_2"])
    sd["multi_modal_projector.linear_2.bias"] = _n(mp["linear_2_b"])
    sd.update(llama_state_dict(
        params["language_model"], prefix="language_model.model.",
        lm_head_key="language_model.lm_head.weight"))
    return sd


def llava_hf_config(cfg: LlavaConfig) -> Dict:
    v, t = cfg.vision_config, cfg.text_config
    return {
        "architectures": ["LlavaForConditionalGeneration"],
        "model_type": "llava",
        "image_token_index": cfg.image_token_index,
        "ignore_index": cfg.ignore_index,
        "vision_feature_layer": cfg.vision_feature_layer,
        "vision_feature_select_strategy":
            cfg.vision_feature_select_strategy,
        "projector_hidden_act": cfg.projector_hidden_act,
        "pad_token_id": cfg.pad_token_id,
        "vision_config": {
            "model_type": ("siglip_vision_model"
                           if v.tower_type == "siglip"
                           else "clip_vision_model"),
            "hidden_size": v.hidden_size,
            "intermediate_size": v.intermediate_size,
            "num_hidden_layers": v.num_hidden_layers,
            "num_attention_heads": v.num_attention_heads,
            "image_size": v.image_size,
            "patch_size": v.patch_size,
            "layer_norm_eps": v.layer_norm_eps,
            "num_channels": v.num_channels,
        },
        "text_config": {
            "model_type": "llama",
            "vocab_size": t.vocab_size,
            "hidden_size": t.hidden_size,
            "intermediate_size": t.intermediate_size,
            "num_hidden_layers": t.num_hidden_layers,
            "num_attention_heads": t.num_attention_heads,
            "num_key_value_heads": t.num_key_value_heads,
            "rms_norm_eps": t.rms_norm_eps,
            "rope_theta": t.rope_theta,
            "max_position_embeddings": t.max_position_embeddings,
            "tie_word_embeddings": t.tie_word_embeddings,
        },
    }


def save_llava(params, cfg: LlavaConfig, output_dir: str,
               processor=None, dtype=np.float32) -> str:
    """Write an HF-layout checkpoint dir (safetensors + config.json)."""
    from safetensors.numpy import save_file

    os.makedirs(output_dir, exist_ok=True)
    sd = llava_state_dict(params, cfg)
    sd = {k: np.ascontiguousarray(v.astype(dtype)) for k, v in sd.items()}
    save_file(sd, os.path.join(output_dir, "model.safetensors"))
    with open(os.path.join(output_dir, "config.json"), "w") as f:
        json.dump(llava_hf_config(cfg), f, indent=2)
    if processor is not None and hasattr(processor, "tokenizer"):
        processor.tokenizer.save_pretrained(output_dir)
    return output_dir
