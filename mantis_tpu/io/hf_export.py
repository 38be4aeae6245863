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

import jax

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


# ---------------------------------------------------------------------------
# Per-arch exporters (inverse of io/hf_loader mappings).  Key layouts
# target the transformers version baked into this image (4.57: fuyu and
# qwen2_vl use the "model.language_model."/"model.visual." layout).
# ---------------------------------------------------------------------------

def _llama_bias_state_dict(params, prefix):
    sd = {}
    layers = params["layers"]
    if "q_b" not in layers:
        return sd
    L = layers["q_b"].shape[0]
    for i in range(L):
        for hf, ours in (("q_proj", "q_b"), ("k_proj", "k_b"),
                         ("v_proj", "v_b")):
            sd[f"{prefix}layers.{i}.self_attn.{hf}.bias"] = _n(
                layers[ours][i])
    return sd


def persimmon_state_dict(params, cfg, prefix="model.",
                         lm_head_key="lm_head.weight"):
    """Inverse of persimmon_params_from_hf: re-fuse q/k/v into the HF
    per-head-interleaved query_key_value layout."""
    sd = {}
    sd[prefix + "embed_tokens.weight"] = _n(params["embed_tokens"])
    sd[prefix + "final_layernorm.weight"] = _n(params["final_ln_scale"])
    sd[prefix + "final_layernorm.bias"] = _n(params["final_ln_bias"])
    sd[lm_head_key] = _t(params["lm_head"])
    layers = params["layers"]
    L = layers["q_proj"].shape[0]
    H, dh, D = cfg.num_attention_heads, cfg.head_dim, cfg.hidden_size
    plain = [
        ("input_layernorm.weight", "ln1_scale"),
        ("input_layernorm.bias", "ln1_bias"),
        ("post_attention_layernorm.weight", "ln2_scale"),
        ("post_attention_layernorm.bias", "ln2_bias"),
        ("self_attn.dense.bias", "dense_b"),
        ("mlp.dense_h_to_4h.bias", "h_to_4h_b"),
        ("mlp.dense_4h_to_h.bias", "4h_to_h_b"),
    ]
    trans = [
        ("self_attn.dense.weight", "dense"),
        ("mlp.dense_h_to_4h.weight", "h_to_4h"),
        ("mlp.dense_4h_to_h.weight", "4h_to_h"),
    ]
    if cfg.qk_layernorm:
        plain += [("self_attn.q_layernorm.weight", "q_ln_scale"),
                  ("self_attn.q_layernorm.bias", "q_ln_bias"),
                  ("self_attn.k_layernorm.weight", "k_ln_scale"),
                  ("self_attn.k_layernorm.bias", "k_ln_bias")]
    for i in range(L):
        lt = f"{prefix}layers.{i}."
        for hf, ours in plain:
            sd[lt + hf] = _n(layers[ours][i])
        for hf, ours in trans:
            sd[lt + hf] = _t(layers[ours][i])
        q = _t(layers["q_proj"][i]).reshape(H, dh, D)
        k = _t(layers["k_proj"][i]).reshape(H, dh, D)
        v = _t(layers["v_proj"][i]).reshape(H, dh, D)
        w = np.stack([q, k, v], axis=1).reshape(H * 3 * dh, D)
        qb = _n(layers["q_b"][i]).reshape(H, dh)
        kb = _n(layers["k_b"][i]).reshape(H, dh)
        vb = _n(layers["v_b"][i]).reshape(H, dh)
        b = np.stack([qb, kb, vb], axis=1).reshape(H * 3 * dh)
        sd[lt + "self_attn.query_key_value.weight"] = w
        sd[lt + "self_attn.query_key_value.bias"] = b
    return sd


def idefics2_state_dict(params, cfg):
    sd = vit_state_dict(params["vision_tower"], cfg.vision_config,
                        prefix="model.vision_model.")
    c = params["connector"]
    mp = "model.connector.modality_projection."
    sd[mp + "gate_proj.weight"] = _t(c["mp_gate"])
    sd[mp + "up_proj.weight"] = _t(c["mp_up"])
    sd[mp + "down_proj.weight"] = _t(c["mp_down"])
    pr = "model.connector.perceiver_resampler."
    p = c["perceiver"]
    sd[pr + "latents"] = _n(p["latents"])
    sd[pr + "norm.weight"] = _n(p["norm"])
    pl = p["layers"]
    depth = pl["q_proj"].shape[0]
    names = [
        ("input_latents_norm.weight", "input_latents_norm", False),
        ("input_context_norm.weight", "input_context_norm", False),
        ("self_attn.q_proj.weight", "q_proj", True),
        ("self_attn.k_proj.weight", "k_proj", True),
        ("self_attn.v_proj.weight", "v_proj", True),
        ("self_attn.o_proj.weight", "o_proj", True),
        ("post_attention_layernorm.weight", "post_attention_layernorm",
         False),
        ("mlp.gate_proj.weight", "mlp_gate", True),
        ("mlp.up_proj.weight", "mlp_up", True),
        ("mlp.down_proj.weight", "mlp_down", True),
    ]
    for i in range(depth):
        for hf, ours, tr in names:
            w = np.asarray(pl[ours][i])
            sd[f"{pr}layers.{i}.{hf}"] = w.T if tr else w
    sd.update(llama_state_dict(
        params["language_model"], prefix="model.text_model.",
        lm_head_key="lm_head.weight"))
    if "score" in params:
        sd["score.weight"] = _t(params["score"])
    return sd


def idefics2_hf_config(cfg):
    v, t, p = cfg.vision_config, cfg.text_config, cfg.perceiver_config
    return {
        "architectures": ["Idefics2ForConditionalGeneration"],
        "model_type": "idefics2",
        "image_token_id": cfg.image_token_id,
        "tie_word_embeddings": t.tie_word_embeddings,
        "vision_config": {
            "hidden_size": v.hidden_size,
            "intermediate_size": v.intermediate_size,
            "num_hidden_layers": v.num_hidden_layers,
            "num_attention_heads": v.num_attention_heads,
            "image_size": v.image_size,
            "patch_size": v.patch_size,
            "layer_norm_eps": v.layer_norm_eps,
        },
        "perceiver_config": {
            "resampler_n_latents": p.resampler_n_latents,
            "resampler_depth": p.resampler_depth,
            "resampler_n_heads": p.resampler_n_heads,
            "resampler_head_dim": p.resampler_head_dim,
            "num_key_value_heads": p.num_key_value_heads,
            "rms_norm_eps": p.rms_norm_eps,
        },
        "text_config": {
            "model_type": "mistral",
            "vocab_size": t.vocab_size,
            "hidden_size": t.hidden_size,
            "intermediate_size": t.intermediate_size,
            "num_hidden_layers": t.num_hidden_layers,
            "num_attention_heads": t.num_attention_heads,
            "num_key_value_heads": t.num_key_value_heads,
            "rms_norm_eps": t.rms_norm_eps,
            "rope_theta": t.rope_theta,
            "sliding_window": t.sliding_window,
            "tie_word_embeddings": t.tie_word_embeddings,
        },
    }


def idefics3_state_dict(params, cfg):
    sd = vit_state_dict(params["vision_tower"], cfg.vision_config,
                        prefix="model.vision_model.")
    sd["model.connector.modality_projection.proj.weight"] = _t(
        params["connector"]["proj"])
    sd.update(llama_state_dict(
        params["language_model"], prefix="model.text_model.",
        lm_head_key="lm_head.weight"))
    return sd


def idefics3_hf_config(cfg):
    v, t = cfg.vision_config, cfg.text_config
    return {
        "architectures": ["Idefics3ForConditionalGeneration"],
        "model_type": "idefics3",
        "image_token_id": cfg.image_token_id,
        "scale_factor": cfg.scale_factor,
        "tie_word_embeddings": t.tie_word_embeddings,
        "vision_config": {
            "hidden_size": v.hidden_size,
            "intermediate_size": v.intermediate_size,
            "num_hidden_layers": v.num_hidden_layers,
            "num_attention_heads": v.num_attention_heads,
            "image_size": v.image_size,
            "patch_size": v.patch_size,
            "layer_norm_eps": v.layer_norm_eps,
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
            "tie_word_embeddings": t.tie_word_embeddings,
        },
    }


def qwen2_vl_state_dict(params, cfg):
    v = params["visual"]
    vcfg = cfg.vision_config
    vp = "model.visual."
    sd = {}
    E = np.asarray(v["patch_embed"]).shape[1]
    sd[vp + "patch_embed.proj.weight"] = _t(v["patch_embed"]).reshape(
        E, vcfg.in_channels, vcfg.temporal_patch_size, vcfg.patch_size,
        vcfg.patch_size)
    blocks = v["blocks"]
    L = blocks["qkv"].shape[0]
    names = [
        ("norm1.weight", "ln1_scale", False),
        ("norm1.bias", "ln1_bias", False),
        ("attn.qkv.weight", "qkv", True),
        ("attn.qkv.bias", "qkv_b", False),
        ("attn.proj.weight", "proj", True),
        ("attn.proj.bias", "proj_b", False),
        ("norm2.weight", "ln2_scale", False),
        ("norm2.bias", "ln2_bias", False),
        ("mlp.fc1.weight", "fc1", True),
        ("mlp.fc1.bias", "fc1_b", False),
        ("mlp.fc2.weight", "fc2", True),
        ("mlp.fc2.bias", "fc2_b", False),
    ]
    for i in range(L):
        for hf, ours, tr in names:
            w = np.asarray(blocks[ours][i])
            sd[f"{vp}blocks.{i}.{hf}"] = w.T if tr else w
    m = v["merger"]
    sd[vp + "merger.ln_q.weight"] = _n(m["ln_q_scale"])
    sd[vp + "merger.ln_q.bias"] = _n(m["ln_q_bias"])
    sd[vp + "merger.mlp.0.weight"] = _t(m["mlp0"])
    sd[vp + "merger.mlp.0.bias"] = _n(m["mlp0_b"])
    sd[vp + "merger.mlp.2.weight"] = _t(m["mlp2"])
    sd[vp + "merger.mlp.2.bias"] = _n(m["mlp2_b"])
    sd.update(llama_state_dict(
        params["language_model"], prefix="model.language_model.",
        lm_head_key="lm_head.weight"))
    sd.update(_llama_bias_state_dict(params["language_model"],
                                     "model.language_model."))
    if "score" in params:
        sd["score.weight"] = _t(params["score"])
    return sd


def qwen2_vl_hf_config(cfg):
    v, t = cfg.vision_config, cfg.text_config
    return {
        "architectures": ["Qwen2VLForConditionalGeneration"],
        "model_type": "qwen2_vl",
        "image_token_id": cfg.image_token_id,
        "video_token_id": cfg.video_token_id,
        "vision_start_token_id": cfg.vision_start_token_id,
        "tie_word_embeddings": t.tie_word_embeddings,
        "vision_config": {
            "depth": v.depth,
            "embed_dim": v.embed_dim,
            "num_heads": v.num_heads,
            "in_channels": v.in_channels,
            "patch_size": v.patch_size,
            "temporal_patch_size": v.temporal_patch_size,
            "spatial_merge_size": v.spatial_merge_size,
            "mlp_ratio": v.mlp_ratio,
            "hidden_size": v.hidden_size,
        },
        "text_config": {
            "model_type": "qwen2_vl_text",
            "vocab_size": t.vocab_size,
            "hidden_size": t.hidden_size,
            "intermediate_size": t.intermediate_size,
            "num_hidden_layers": t.num_hidden_layers,
            "num_attention_heads": t.num_attention_heads,
            "num_key_value_heads": t.num_key_value_heads,
            "rms_norm_eps": t.rms_norm_eps,
            "rope_theta": t.rope_theta,
            "attention_bias": t.attention_bias,
            "tie_word_embeddings": t.tie_word_embeddings,
            "rope_scaling": {
                "type": "mrope",
                "mrope_section": list(t.mrope_section or ()),
            },
        },
    }


def mfuyu_state_dict(params, cfg):
    sd = {
        "model.vision_embed_tokens.weight": _t(
            params["vision_embed_tokens"]),
        "model.vision_embed_tokens.bias": _n(params["vision_embed_bias"]),
    }
    sd.update(persimmon_state_dict(
        params["language_model"], cfg.text_config,
        prefix="model.language_model.", lm_head_key="lm_head.weight"))
    return sd


def mfuyu_hf_config(cfg):
    t = cfg.text_config
    return {
        "architectures": ["FuyuForCausalLM"],
        "model_type": "fuyu",
        "patch_size": cfg.patch_size,
        "num_channels": cfg.num_channels,
        "hidden_size": t.hidden_size,  # FuyuConfig sizes the patch proj
        "tie_word_embeddings": t.tie_word_embeddings,
        "text_config": {
            "model_type": "persimmon",
            "vocab_size": t.vocab_size,
            "hidden_size": t.hidden_size,
            "intermediate_size": t.intermediate_size,
            "num_hidden_layers": t.num_hidden_layers,
            "num_attention_heads": t.num_attention_heads,
            "rope_theta": t.rope_theta,
            "partial_rotary_factor": t.partial_rotary_factor,
            "qk_layernorm": t.qk_layernorm,
            "layer_norm_eps": t.layer_norm_eps,
            "hidden_act": t.hidden_act,
            "max_position_embeddings": t.max_position_embeddings,
            "tie_word_embeddings": t.tie_word_embeddings,
        },
    }


def internvl_state_dict(params, cfg):
    v = params["vision_tower"]
    vcfg = cfg.vision_config
    vp = "model.vision_tower."
    sd = {}
    E = vcfg.hidden_size
    sd[vp + "embeddings.patch_embeddings.projection.weight"] = _t(
        v["patch_embedding"]).reshape(E, 3, vcfg.patch_size,
                                      vcfg.patch_size)
    sd[vp + "embeddings.patch_embeddings.projection.bias"] = _n(
        v["patch_bias"])
    sd[vp + "embeddings.cls_token"] = _n(v["cls_token"]).reshape(1, 1, E)
    pos = _n(v["position_embedding"])
    sd[vp + "embeddings.position_embeddings"] = pos.reshape(
        1, *pos.shape)
    layers = v["layers"]
    L = layers["q"].shape[0]
    names = [
        ("layernorm_before.weight", "ln1_scale", False),
        ("layernorm_before.bias", "ln1_bias", False),
        ("attention.q_proj.weight", "q", True),
        ("attention.q_proj.bias", "q_b", False),
        ("attention.k_proj.weight", "k", True),
        ("attention.k_proj.bias", "k_b", False),
        ("attention.v_proj.weight", "v", True),
        ("attention.v_proj.bias", "v_b", False),
        ("attention.projection_layer.weight", "o", True),
        ("attention.projection_layer.bias", "o_b", False),
        ("layernorm_after.weight", "ln2_scale", False),
        ("layernorm_after.bias", "ln2_bias", False),
        ("mlp.fc1.weight", "fc1", True),
        ("mlp.fc1.bias", "fc1_b", False),
        ("mlp.fc2.weight", "fc2", True),
        ("mlp.fc2.bias", "fc2_b", False),
        ("lambda_1", "lambda_1", False),
        ("lambda_2", "lambda_2", False),
    ]
    for i in range(L):
        for hf, ours, tr in names:
            w = np.asarray(layers[ours][i])
            sd[f"{vp}encoder.layer.{i}.{hf}"] = w.T if tr else w
    p = params["projector"]
    mp = "model.multi_modal_projector."
    sd[mp + "layer_norm.weight"] = _n(p["ln_scale"])
    sd[mp + "layer_norm.bias"] = _n(p["ln_bias"])
    sd[mp + "linear_1.weight"] = _t(p["linear_1"])
    sd[mp + "linear_1.bias"] = _n(p["linear_1_b"])
    sd[mp + "linear_2.weight"] = _t(p["linear_2"])
    sd[mp + "linear_2.bias"] = _n(p["linear_2_b"])
    sd.update(llama_state_dict(
        params["language_model"], prefix="model.language_model.",
        lm_head_key="lm_head.weight"))
    # Qwen2.5-based InternVL text backbones carry q/k/v biases
    sd.update(_llama_bias_state_dict(params["language_model"],
                                     "model.language_model."))
    return sd


def internvl_hf_config(cfg):
    v, t = cfg.vision_config, cfg.text_config
    return {
        "architectures": ["InternVLForConditionalGeneration"],
        "model_type": "internvl",
        "image_token_id": cfg.image_token_id,
        "downsample_ratio": cfg.downsample_ratio,
        "projector_hidden_act": cfg.projector_hidden_act,
        "tie_word_embeddings": t.tie_word_embeddings,
        "vision_config": {
            "model_type": "internvl_vision",
            "hidden_size": v.hidden_size,
            "intermediate_size": v.intermediate_size,
            "num_hidden_layers": v.num_hidden_layers,
            "num_attention_heads": v.num_attention_heads,
            "image_size": [v.image_size, v.image_size],
            "patch_size": [v.patch_size, v.patch_size],
            "layer_norm_eps": v.layer_norm_eps,
            "layer_scale_init_value": v.layer_scale_init_value,
            "use_qk_norm": v.use_qk_norm,
            "attention_bias": v.attention_bias,
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
            "attention_bias": t.attention_bias,
            "tie_word_embeddings": t.tie_word_embeddings,
        },
    }


def llava_next_state_dict(params, cfg) -> Dict:
    sd = llava_state_dict(params, cfg)
    sd["image_newline"] = _n(params["image_newline"])
    return sd


def llava_next_hf_config(cfg) -> Dict:
    d = llava_hf_config(cfg)
    d["architectures"] = ["LlavaNextForConditionalGeneration"]
    d["model_type"] = "llava_next"
    d["image_grid_pinpoints"] = [list(p)
                                 for p in cfg.image_grid_pinpoints]
    return d


def videollava_state_dict(params, cfg) -> Dict:
    """Inverse of hf_loader.videollava_params_from_hf (legacy layout,
    which transformers' checkpoint-conversion mapping auto-renames)."""
    sd = {}
    sd.update(vit_state_dict(params["image_tower"], cfg.vision_config,
                             prefix="image_tower.vision_model."))
    sd.update(vit_state_dict(params["video_tower"], cfg.vision_config,
                             prefix="video_tower.vision_model."))
    mp = params["multi_modal_projector"]
    sd["multi_modal_projector.linear_1.weight"] = _t(mp["linear_1"])
    sd["multi_modal_projector.linear_1.bias"] = _n(mp["linear_1_b"])
    sd["multi_modal_projector.linear_2.weight"] = _t(mp["linear_2"])
    sd["multi_modal_projector.linear_2.bias"] = _n(mp["linear_2_b"])
    sd.update(llama_state_dict(
        params["language_model"], prefix="language_model.model.",
        lm_head_key="language_model.lm_head.weight"))
    return sd


def videollava_hf_config(cfg) -> Dict:
    v, t = cfg.vision_config, cfg.text_config
    return {
        "architectures": ["VideoLlavaForConditionalGeneration"],
        "model_type": "video_llava",
        "image_token_index": cfg.image_token_index,
        "video_token_index": cfg.video_token_index,
        "ignore_index": cfg.ignore_index,
        "vision_feature_layer": cfg.vision_feature_layer,
        "vision_feature_select_strategy":
            cfg.vision_feature_select_strategy,
        "num_frames": cfg.num_frames,
        "pad_token_id": cfg.pad_token_id,
        "vision_config": {
            "model_type": "clip_vision_model",
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


_EXPORTERS = {
    "mllava": (llava_state_dict, llava_hf_config),
    "mllava_next": (llava_next_state_dict, llava_next_hf_config),
    "videollava": (videollava_state_dict, videollava_hf_config),
    "idefics2": (idefics2_state_dict, idefics2_hf_config),
    "idefics3": (idefics3_state_dict, idefics3_hf_config),
    "qwen2_vl": (qwen2_vl_state_dict, qwen2_vl_hf_config),
    "mfuyu": (mfuyu_state_dict, mfuyu_hf_config),
    "internvl": (internvl_state_dict, internvl_hf_config),
}


def _assert_dense(params):
    from mantis_tpu.ops.quant import QuantTensor

    for leaf in jax.tree.leaves(
            params, is_leaf=lambda x: isinstance(x, QuantTensor)):
        if isinstance(leaf, QuantTensor):
            raise ValueError(
                "cannot export quantize-loaded params to HF layout; "
                "reload the checkpoint without quantize= (or "
                "ops.quant.dequantize_tree them) first")


def save_checkpoint(arch: str, params, cfg, output_dir: str,
                    processor=None, dtype=np.float32) -> str:
    """Write an HF-layout checkpoint for any supported architecture.

    Inverse of io/hf_loader.load_checkpoint; output loads with
    ``transformers.<Arch>.from_pretrained`` (reference models are all
    HF-checkpoint-native, e.g. mantis/models/idefics3/
    convert_idefics3_weights_to_hf.py).
    """
    from safetensors.numpy import save_file

    _assert_dense(params)
    state_fn, cfg_fn = _EXPORTERS[arch]
    os.makedirs(output_dir, exist_ok=True)
    sd = state_fn(params, cfg)
    sd = {k: np.ascontiguousarray(np.asarray(v).astype(dtype))
          for k, v in sd.items()}
    save_file(sd, os.path.join(output_dir, "model.safetensors"))
    with open(os.path.join(output_dir, "config.json"), "w") as f:
        json.dump(cfg_fn(cfg), f, indent=2)
    if processor is not None and hasattr(processor, "tokenizer"):
        processor.tokenizer.save_pretrained(output_dir)
    return output_dir
