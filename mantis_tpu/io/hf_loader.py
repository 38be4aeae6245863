"""HuggingFace checkpoint interop: torch/safetensors -> mantis_tpu pytrees.

The reference loads all models via ``from_pretrained`` on HF checkpoints;
this module maps those checkpoints (e.g. TIGER-Lab/Mantis-8B-siglip-llama3)
onto our stacked-layer JAX param trees.  Linear weights are transposed to
``[in, out]`` (we compute x @ W); per-layer tensors are stacked along a
leading layer axis for ``lax.scan``.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Optional

import jax.numpy as jnp
import numpy as np

from mantis_tpu.models.configs import LlamaConfig, LlavaConfig, VisionConfig


def _to_numpy(t) -> np.ndarray:
    """torch.Tensor / np.ndarray -> np.ndarray (bf16 via float32)."""
    if isinstance(t, np.ndarray):
        return t
    try:
        import torch

        if isinstance(t, torch.Tensor):
            t = t.detach()
            if t.dtype == torch.bfloat16:
                t = t.float()
            return t.cpu().numpy()
    except ImportError:
        pass
    return np.asarray(t)


class TensorSource:
    """Uniform access over a state dict or a safetensors directory."""

    def __init__(self, getter: Callable[[str], np.ndarray], keys):
        self.get = getter
        self.keys = set(keys)
        self.close = lambda: None   # overridden by safetensors sources

    @classmethod
    def from_state_dict(cls, sd: Dict) -> "TensorSource":
        return cls(lambda k: _to_numpy(sd[k]), sd.keys())

    @classmethod
    def from_safetensors_dir(cls, path: str) -> "TensorSource":
        from safetensors import safe_open

        index_file = os.path.join(path, "model.safetensors.index.json")
        shard_of = {}
        if os.path.exists(index_file):
            with open(index_file) as f:
                index = json.load(f)
            shard_of = index["weight_map"]
        else:
            single = os.path.join(path, "model.safetensors")
            with safe_open(single, framework="numpy") as f:
                for k in f.keys():
                    shard_of[k] = "model.safetensors"
        handles: Dict[str, object] = {}

        def getter(key: str) -> np.ndarray:
            shard = shard_of[key]
            if shard not in handles:
                handles[shard] = safe_open(
                    os.path.join(path, shard), framework="numpy")
            t = handles[shard].get_tensor(key)
            if t.dtype == np.dtype("V2"):  # raw bf16 view fallback
                import ml_dtypes

                t = t.view(ml_dtypes.bfloat16)
            return t

        src = cls(getter, shard_of.keys())
        # drop the cached safe_open handles (and their fds) once the
        # mapping is done — eval sweeps load many checkpoints per
        # process
        src.close = handles.clear
        return src


def _stack(src: TensorSource, tmpl: str, n: int, transpose: bool,
           dtype) -> jnp.ndarray:
    arrs = []
    for i in range(n):
        a = src.get(tmpl.format(i=i))
        if transpose:
            a = a.T
        arrs.append(np.asarray(a))
    return jnp.asarray(np.stack(arrs), dtype=dtype)


def _maybe_quantize(w, quantize_bits, group_size=128):
    """On-load weight-only quantization: the stacked bf16 tensor is a
    transient (freed after this call), so device peak memory stays at
    int8-total + one stack — an 8B checkpoint quantizes onto a 16 GB
    chip that its bf16 form does not fit."""
    if not quantize_bits:
        return w
    from mantis_tpu.ops.quant import quantize

    din = w.shape[-2]
    gs = group_size if din % group_size == 0 else din
    return quantize(w, bits=quantize_bits, group_size=gs)


def llama_params_from_hf(src: TensorSource, cfg: LlamaConfig,
                         prefix: str = "model.",
                         lm_head_key: Optional[str] = "lm_head.weight",
                         dtype=jnp.float32, quantize_bits=None):
    """quantize_bits (8 or 4): group-wise weight-only quantization of
    the LM linears + lm_head at load time (the measured serving
    config, docs/PERF.md — same policy as ops.quant.quantize_tree plus
    the head; embeddings and norms stay in ``dtype``)."""
    L = cfg.num_hidden_layers
    p = prefix

    def get(k, transpose=False):
        a = src.get(p + k)
        return jnp.asarray(a.T if transpose else a, dtype=dtype)

    def qstack(tmpl):
        return _maybe_quantize(
            _stack(src, lt + tmpl, L, True, dtype), quantize_bits)

    lt = p + "layers.{i}."
    params = {
        "embed_tokens": get("embed_tokens.weight"),
        "norm": get("norm.weight"),
        "layers": {
            "input_layernorm": _stack(
                src, lt + "input_layernorm.weight", L, False, dtype),
            "post_attention_layernorm": _stack(
                src, lt + "post_attention_layernorm.weight", L, False, dtype),
            "q_proj": qstack("self_attn.q_proj.weight"),
            "k_proj": qstack("self_attn.k_proj.weight"),
            "v_proj": qstack("self_attn.v_proj.weight"),
            "o_proj": qstack("self_attn.o_proj.weight"),
            "gate_proj": qstack("mlp.gate_proj.weight"),
            "up_proj": qstack("mlp.up_proj.weight"),
            "down_proj": qstack("mlp.down_proj.weight"),
        },
    }
    if cfg.attention_bias:
        params["layers"].update({
            "q_b": _stack(src, lt + "self_attn.q_proj.bias", L, False,
                          dtype),
            "k_b": _stack(src, lt + "self_attn.k_proj.bias", L, False,
                          dtype),
            "v_b": _stack(src, lt + "self_attn.v_proj.bias", L, False,
                          dtype),
        })
    if not cfg.tie_word_embeddings and lm_head_key is not None:
        if lm_head_key in src.keys:
            head = jnp.asarray(src.get(lm_head_key).T, dtype=dtype)
        else:  # tied in checkpoint
            head = params["embed_tokens"].T
        params["lm_head"] = _maybe_quantize(head, quantize_bits)
    return params


def vit_params_from_hf(src: TensorSource, cfg: VisionConfig,
                       prefix: str = "vision_model.", dtype=jnp.float32):
    L = cfg.num_hidden_layers
    p = prefix

    def get(k, transpose=False):
        a = src.get(p + k)
        return jnp.asarray(a.T if transpose else a, dtype=dtype)

    patch_w = src.get(p + "embeddings.patch_embedding.weight")  # [D,C,p,p]
    patch_w = patch_w.reshape(patch_w.shape[0], -1).T  # [C*p*p, D]

    lt = p + "encoder.layers.{i}."
    params = {
        "patch_embedding": jnp.asarray(patch_w, dtype=dtype),
        "position_embedding": get("embeddings.position_embedding.weight"),
        "layers": {
            "ln1_scale": _stack(src, lt + "layer_norm1.weight", L, False,
                                dtype),
            "ln1_bias": _stack(src, lt + "layer_norm1.bias", L, False, dtype),
            "q": _stack(src, lt + "self_attn.q_proj.weight", L, True, dtype),
            "q_b": _stack(src, lt + "self_attn.q_proj.bias", L, False, dtype),
            "k": _stack(src, lt + "self_attn.k_proj.weight", L, True, dtype),
            "k_b": _stack(src, lt + "self_attn.k_proj.bias", L, False, dtype),
            "v": _stack(src, lt + "self_attn.v_proj.weight", L, True, dtype),
            "v_b": _stack(src, lt + "self_attn.v_proj.bias", L, False, dtype),
            "o": _stack(src, lt + "self_attn.out_proj.weight", L, True,
                        dtype),
            "o_b": _stack(src, lt + "self_attn.out_proj.bias", L, False,
                          dtype),
            "ln2_scale": _stack(src, lt + "layer_norm2.weight", L, False,
                                dtype),
            "ln2_bias": _stack(src, lt + "layer_norm2.bias", L, False, dtype),
            "fc1": _stack(src, lt + "mlp.fc1.weight", L, True, dtype),
            "fc1_b": _stack(src, lt + "mlp.fc1.bias", L, False, dtype),
            "fc2": _stack(src, lt + "mlp.fc2.weight", L, True, dtype),
            "fc2_b": _stack(src, lt + "mlp.fc2.bias", L, False, dtype),
        },
        "post_ln_scale": get("post_layernorm.weight"),
        "post_ln_bias": get("post_layernorm.bias"),
    }
    if cfg.tower_type == "clip":
        params["class_embedding"] = get("embeddings.class_embedding")
        # HF CLIP carries the historical "pre_layrnorm" typo.
        pre = ("pre_layrnorm" if (p + "pre_layrnorm.weight") in src.keys
               else "pre_layernorm")
        params["pre_ln_scale"] = get(pre + ".weight")
        params["pre_ln_bias"] = get(pre + ".bias")
    else:
        params["patch_bias"] = jnp.asarray(
            src.get(p + "embeddings.patch_embedding.bias"), dtype=dtype)
    return params


def llava_params_from_hf(src: TensorSource, cfg: LlavaConfig,
                         dtype=jnp.float32, quantize_bits=None):
    """Map a Mantis/LLaVA HF checkpoint onto our MLlava param tree.

    Handles both legacy key layout (``language_model.model.*``,
    ``vision_tower.vision_model.*``) and the post-4.52 flattened layout
    (``model.language_model.*``).
    """
    if any(k.startswith("language_model.model.") for k in src.keys):
        lm_prefix, lm_head = "language_model.model.", "language_model.lm_head.weight"
        vt_prefix = "vision_tower.vision_model."
        mp_prefix = "multi_modal_projector."
    else:
        lm_prefix, lm_head = "model.language_model.", "lm_head.weight"
        vt_prefix = "model.vision_tower.vision_model."
        mp_prefix = "model.multi_modal_projector."

    def get(k, transpose=False):
        a = src.get(k)
        return jnp.asarray(a.T if transpose else a, dtype=dtype)

    return {
        "vision_tower": vit_params_from_hf(
            src, cfg.vision_config, prefix=vt_prefix, dtype=dtype),
        "multi_modal_projector": {
            "linear_1": get(mp_prefix + "linear_1.weight", True),
            "linear_1_b": get(mp_prefix + "linear_1.bias"),
            "linear_2": get(mp_prefix + "linear_2.weight", True),
            "linear_2_b": get(mp_prefix + "linear_2.bias"),
        },
        "language_model": llama_params_from_hf(
            src, cfg.text_config, prefix=lm_prefix, lm_head_key=lm_head,
            dtype=dtype, quantize_bits=quantize_bits),
    }


def load_llava(checkpoint_dir: str, dtype=jnp.bfloat16,
               quantize_bits=None):
    """Load config + params from a local HF checkpoint directory.

    quantize_bits=8 quantizes the LM linears + head at load (one stack
    at a time), so an 8B-class checkpoint fits a 16 GB chip its bf16
    form does not — the standard single-v5e serving path."""
    with open(os.path.join(checkpoint_dir, "config.json")) as f:
        hf_cfg = json.load(f)
    cfg = LlavaConfig.from_hf_config(hf_cfg)
    src = TensorSource.from_safetensors_dir(checkpoint_dir)
    try:
        params = llava_params_from_hf(src, cfg, dtype=dtype,
                                      quantize_bits=quantize_bits)
    finally:
        src.close()
    return cfg, params


def idefics2_params_from_hf(src: TensorSource, cfg, dtype=jnp.float32,
                            quantize_bits=None):
    """Map an HF Idefics2 checkpoint (reference fork or upstream) onto
    our param tree.  cfg: mantis_tpu.models.idefics2.model.Idefics2Config.
    """
    pcfg = cfg.perceiver_config
    depth = pcfg.resampler_depth

    def get(k, transpose=False):
        a = src.get(k)
        return jnp.asarray(a.T if transpose else a, dtype=dtype)

    pr = "model.connector.perceiver_resampler."
    lt = pr + "layers.{i}."
    perceiver = {
        "latents": get(pr + "latents"),
        "norm": get(pr + "norm.weight"),
        "layers": {
            "input_latents_norm": _stack(
                src, lt + "input_latents_norm.weight", depth, False, dtype),
            "input_context_norm": _stack(
                src, lt + "input_context_norm.weight", depth, False, dtype),
            "q_proj": _stack(
                src, lt + "self_attn.q_proj.weight", depth, True, dtype),
            "k_proj": _stack(
                src, lt + "self_attn.k_proj.weight", depth, True, dtype),
            "v_proj": _stack(
                src, lt + "self_attn.v_proj.weight", depth, True, dtype),
            "o_proj": _stack(
                src, lt + "self_attn.o_proj.weight", depth, True, dtype),
            "post_attention_layernorm": _stack(
                src, lt + "post_attention_layernorm.weight", depth, False,
                dtype),
            "mlp_gate": _stack(
                src, lt + "mlp.gate_proj.weight", depth, True, dtype),
            "mlp_up": _stack(
                src, lt + "mlp.up_proj.weight", depth, True, dtype),
            "mlp_down": _stack(
                src, lt + "mlp.down_proj.weight", depth, True, dtype),
        },
    }
    mp = "model.connector.modality_projection."
    params = {
        "vision_tower": vit_params_from_hf(
            src, cfg.vision_config, prefix="model.vision_model.",
            dtype=dtype),
        "connector": {
            "mp_gate": get(mp + "gate_proj.weight", True),
            "mp_up": get(mp + "up_proj.weight", True),
            "mp_down": get(mp + "down_proj.weight", True),
            "perceiver": perceiver,
        },
        "language_model": llama_params_from_hf(
            src, cfg.text_config, prefix="model.text_model.",
            lm_head_key="lm_head.weight", dtype=dtype,
            quantize_bits=quantize_bits),
    }
    if "score.weight" in src.keys:
        params["score"] = get("score.weight", True)
    return params


def qwen2_vl_params_from_hf(src: TensorSource, cfg, dtype=jnp.float32,
                            quantize_bits=None):
    """Map an HF Qwen2-VL checkpoint onto our param tree.
    cfg: mantis_tpu.models.qwen2_vl.model.Qwen2VLConfig."""
    vcfg = cfg.vision_config
    L = vcfg.depth

    # key layout differs across transformers versions
    if any(k.startswith("model.visual.") for k in src.keys):
        vp, lp, head = ("model.visual.", "model.language_model.",
                        "lm_head.weight")
    else:
        vp, lp, head = "visual.", "model.", "lm_head.weight"

    def get(k, transpose=False):
        a = src.get(k)
        return jnp.asarray(a.T if transpose else a, dtype=dtype)

    patch_w = src.get(vp + "patch_embed.proj.weight")  # [E, C, T, P, P]
    patch_w = patch_w.reshape(patch_w.shape[0], -1).T

    bt = vp + "blocks.{i}."
    visual = {
        "patch_embed": jnp.asarray(patch_w, dtype=dtype),
        "blocks": {
            "ln1_scale": _stack(src, bt + "norm1.weight", L, False, dtype),
            "ln1_bias": _stack(src, bt + "norm1.bias", L, False, dtype),
            "qkv": _stack(src, bt + "attn.qkv.weight", L, True, dtype),
            "qkv_b": _stack(src, bt + "attn.qkv.bias", L, False, dtype),
            "proj": _stack(src, bt + "attn.proj.weight", L, True, dtype),
            "proj_b": _stack(src, bt + "attn.proj.bias", L, False, dtype),
            "ln2_scale": _stack(src, bt + "norm2.weight", L, False, dtype),
            "ln2_bias": _stack(src, bt + "norm2.bias", L, False, dtype),
            "fc1": _stack(src, bt + "mlp.fc1.weight", L, True, dtype),
            "fc1_b": _stack(src, bt + "mlp.fc1.bias", L, False, dtype),
            "fc2": _stack(src, bt + "mlp.fc2.weight", L, True, dtype),
            "fc2_b": _stack(src, bt + "mlp.fc2.bias", L, False, dtype),
        },
        "merger": {
            "ln_q_scale": get(vp + "merger.ln_q.weight"),
            "ln_q_bias": get(vp + "merger.ln_q.bias"),
            "mlp0": get(vp + "merger.mlp.0.weight", True),
            "mlp0_b": get(vp + "merger.mlp.0.bias"),
            "mlp2": get(vp + "merger.mlp.2.weight", True),
            "mlp2_b": get(vp + "merger.mlp.2.bias"),
        },
    }
    params = {
        "visual": visual,
        "language_model": llama_params_from_hf(
            src, cfg.text_config, prefix=lp, lm_head_key=head,
            dtype=dtype, quantize_bits=quantize_bits),
    }
    if "score.weight" in src.keys:
        params["score"] = get("score.weight", True)
    return params


def persimmon_params_from_hf(src: TensorSource, cfg,
                             prefix: str = "model.",
                             lm_head_key: str = "lm_head.weight",
                             dtype=jnp.float32, quantize_bits=None):
    """Persimmon with fused per-head-interleaved QKV de-fused into
    q/k/v (HF layout: weight.view(H, 3, dh, D))."""
    L = cfg.num_hidden_layers
    H, dh, D = cfg.num_attention_heads, cfg.head_dim, cfg.hidden_size
    p = prefix
    lt = p + "layers.{i}."

    def get(k, transpose=False):
        a = src.get(p + k)
        return jnp.asarray(a.T if transpose else a, dtype=dtype)

    qs, ks, vs, qbs, kbs, vbs = [], [], [], [], [], []
    for i in range(L):
        w = src.get(lt.format(i=i) + "self_attn.query_key_value.weight")
        b = src.get(lt.format(i=i) + "self_attn.query_key_value.bias")
        w = w.reshape(H, 3, dh, D)
        b = b.reshape(H, 3, dh)
        qs.append(w[:, 0].reshape(H * dh, D).T)
        ks.append(w[:, 1].reshape(H * dh, D).T)
        vs.append(w[:, 2].reshape(H * dh, D).T)
        qbs.append(b[:, 0].reshape(-1))
        kbs.append(b[:, 1].reshape(-1))
        vbs.append(b[:, 2].reshape(-1))

    def st(arrs):
        return jnp.asarray(np.stack(arrs), dtype=dtype)

    params = {
        "embed_tokens": get("embed_tokens.weight"),
        "final_ln_scale": get("final_layernorm.weight"),
        "final_ln_bias": get("final_layernorm.bias"),
        "lm_head": _maybe_quantize(
            jnp.asarray(src.get(lm_head_key).T, dtype=dtype),
            quantize_bits),
        "layers": {
            "ln1_scale": _stack(src, lt + "input_layernorm.weight", L,
                                False, dtype),
            "ln1_bias": _stack(src, lt + "input_layernorm.bias", L,
                               False, dtype),
            "ln2_scale": _stack(
                src, lt + "post_attention_layernorm.weight", L, False,
                dtype),
            "ln2_bias": _stack(
                src, lt + "post_attention_layernorm.bias", L, False,
                dtype),
            "q_proj": _maybe_quantize(st(qs), quantize_bits),
            "q_b": st(qbs),
            "k_proj": _maybe_quantize(st(ks), quantize_bits),
            "k_b": st(kbs),
            "v_proj": _maybe_quantize(st(vs), quantize_bits),
            "v_b": st(vbs),
            "dense": _maybe_quantize(_stack(
                src, lt + "self_attn.dense.weight", L, True, dtype),
                quantize_bits),
            "dense_b": _stack(src, lt + "self_attn.dense.bias", L, False,
                              dtype),
            "h_to_4h": _maybe_quantize(_stack(
                src, lt + "mlp.dense_h_to_4h.weight", L, True, dtype),
                quantize_bits),
            "h_to_4h_b": _stack(src, lt + "mlp.dense_h_to_4h.bias", L,
                                False, dtype),
            "4h_to_h": _maybe_quantize(_stack(
                src, lt + "mlp.dense_4h_to_h.weight", L, True, dtype),
                quantize_bits),
            "4h_to_h_b": _stack(src, lt + "mlp.dense_4h_to_h.bias", L,
                                False, dtype),
        },
    }
    if cfg.qk_layernorm:
        params["layers"].update({
            "q_ln_scale": _stack(
                src, lt + "self_attn.q_layernorm.weight", L, False,
                dtype),
            "q_ln_bias": _stack(
                src, lt + "self_attn.q_layernorm.bias", L, False, dtype),
            "k_ln_scale": _stack(
                src, lt + "self_attn.k_layernorm.weight", L, False,
                dtype),
            "k_ln_bias": _stack(
                src, lt + "self_attn.k_layernorm.bias", L, False, dtype),
        })
    return params


def mfuyu_params_from_hf(src: TensorSource, cfg, dtype=jnp.float32,
                         quantize_bits=None):
    """Fuyu/MFuyu: linear patch embed + Persimmon LM."""
    if any(k.startswith("language_model.model.") for k in src.keys):
        lm_prefix, head = ("language_model.model.",
                           "language_model.lm_head.weight")
        ve = "vision_embed_tokens."
    else:
        lm_prefix, head = "model.language_model.", "lm_head.weight"
        ve = "model.vision_embed_tokens."

    def get(k, transpose=False):
        a = src.get(k)
        return jnp.asarray(a.T if transpose else a, dtype=dtype)

    return {
        "vision_embed_tokens": get(ve + "weight", True),
        "vision_embed_bias": get(ve + "bias"),
        "language_model": persimmon_params_from_hf(
            src, cfg.text_config, prefix=lm_prefix, lm_head_key=head,
            dtype=dtype, quantize_bits=quantize_bits),
    }


def internvl_params_from_hf(src: TensorSource, cfg, dtype=jnp.float32,
                            quantize_bits=None):
    """Map an HF InternVL checkpoint onto our param tree.
    cfg: mantis_tpu.models.intern_vl.model.InternVLConfig."""
    vcfg = cfg.vision_config
    L = vcfg.num_hidden_layers
    vp = "model.vision_tower."
    lt = vp + "encoder.layer.{i}."

    def get(k, transpose=False):
        a = src.get(k)
        return jnp.asarray(a.T if transpose else a, dtype=dtype)

    patch_w = src.get(vp + "embeddings.patch_embeddings.projection.weight")
    patch_w = patch_w.reshape(patch_w.shape[0], -1).T
    pos = src.get(vp + "embeddings.position_embeddings")
    cls = src.get(vp + "embeddings.cls_token")
    vision = {
        "cls_token": jnp.asarray(cls.reshape(-1), dtype=dtype),
        "patch_embedding": jnp.asarray(patch_w, dtype=dtype),
        "patch_bias": get(
            vp + "embeddings.patch_embeddings.projection.bias"),
        "position_embedding": jnp.asarray(
            pos.reshape(pos.shape[-2], pos.shape[-1]), dtype=dtype),
        "layers": {
            "ln1_scale": _stack(src, lt + "layernorm_before.weight", L,
                                False, dtype),
            "ln1_bias": _stack(src, lt + "layernorm_before.bias", L,
                               False, dtype),
            "q": _stack(src, lt + "attention.q_proj.weight", L, True,
                        dtype),
            "q_b": _stack(src, lt + "attention.q_proj.bias", L, False,
                          dtype),
            "k": _stack(src, lt + "attention.k_proj.weight", L, True,
                        dtype),
            "k_b": _stack(src, lt + "attention.k_proj.bias", L, False,
                          dtype),
            "v": _stack(src, lt + "attention.v_proj.weight", L, True,
                        dtype),
            "v_b": _stack(src, lt + "attention.v_proj.bias", L, False,
                          dtype),
            "o": _stack(src, lt + "attention.projection_layer.weight", L,
                        True, dtype),
            "o_b": _stack(src, lt + "attention.projection_layer.bias", L,
                          False, dtype),
            "ln2_scale": _stack(src, lt + "layernorm_after.weight", L,
                                False, dtype),
            "ln2_bias": _stack(src, lt + "layernorm_after.bias", L,
                               False, dtype),
            "fc1": _stack(src, lt + "mlp.fc1.weight", L, True, dtype),
            "fc1_b": _stack(src, lt + "mlp.fc1.bias", L, False, dtype),
            "fc2": _stack(src, lt + "mlp.fc2.weight", L, True, dtype),
            "fc2_b": _stack(src, lt + "mlp.fc2.bias", L, False, dtype),
            "lambda_1": _stack(src, lt + "lambda_1", L, False, dtype),
            "lambda_2": _stack(src, lt + "lambda_2", L, False, dtype),
        },
    }
    mp = "model.multi_modal_projector."
    return {
        "vision_tower": vision,
        "projector": {
            "ln_scale": get(mp + "layer_norm.weight"),
            "ln_bias": get(mp + "layer_norm.bias"),
            "linear_1": get(mp + "linear_1.weight", True),
            "linear_1_b": get(mp + "linear_1.bias"),
            "linear_2": get(mp + "linear_2.weight", True),
            "linear_2_b": get(mp + "linear_2.bias"),
        },
        "language_model": llama_params_from_hf(
            src, cfg.text_config, prefix="model.language_model.",
            lm_head_key="lm_head.weight", dtype=dtype,
            quantize_bits=quantize_bits),
    }


def internlm2_llama_params_from_hf(src: TensorSource, cfg,
                                   prefix: str = "language_model.model.",
                                   lm_head_key: str =
                                   "language_model.output.weight",
                                   dtype=jnp.float32, quantize_bits=None):
    """Original InternLM2 checkpoints (the Mantis InternVL-2.5 fork):
    fused grouped wqkv (per kv-group layout [g q-heads, 1 k, 1 v]) and
    w1/w3/w2 MLP naming, mapped onto our LLaMA layout."""
    L = cfg.num_hidden_layers
    hq, hk, dh, D = (cfg.num_attention_heads, cfg.num_key_value_heads,
                     cfg.head_dim_, cfg.hidden_size)
    g = hq // hk
    lt = prefix + "layers.{i}."
    qs, ks_, vs = [], [], []
    for i in range(L):
        w = src.get(lt.format(i=i) + "attention.wqkv.weight")
        w = w.reshape(hk, g + 2, dh, D)
        qs.append(w[:, :g].reshape(hq * dh, D).T)
        ks_.append(w[:, g].reshape(hk * dh, D).T)
        vs.append(w[:, g + 1].reshape(hk * dh, D).T)

    def st(arrs):
        return jnp.asarray(np.stack(arrs), dtype=dtype)

    def get(k, transpose=False):
        a = src.get(prefix + k)
        return jnp.asarray(a.T if transpose else a, dtype=dtype)

    return {
        "embed_tokens": get("tok_embeddings.weight"),
        "norm": get("norm.weight"),
        "lm_head": _maybe_quantize(
            jnp.asarray(src.get(lm_head_key).T, dtype=dtype),
            quantize_bits),
        "layers": {
            "input_layernorm": _stack(
                src, lt + "attention_norm.weight", L, False, dtype),
            "post_attention_layernorm": _stack(
                src, lt + "ffn_norm.weight", L, False, dtype),
            "q_proj": _maybe_quantize(st(qs), quantize_bits),
            "k_proj": _maybe_quantize(st(ks_), quantize_bits),
            "v_proj": _maybe_quantize(st(vs), quantize_bits),
            "o_proj": _maybe_quantize(_stack(
                src, lt + "attention.wo.weight", L, True, dtype),
                quantize_bits),
            "gate_proj": _maybe_quantize(_stack(
                src, lt + "feed_forward.w1.weight", L, True, dtype),
                quantize_bits),
            "up_proj": _maybe_quantize(_stack(
                src, lt + "feed_forward.w3.weight", L, True, dtype),
                quantize_bits),
            "down_proj": _maybe_quantize(_stack(
                src, lt + "feed_forward.w2.weight", L, True, dtype),
                quantize_bits),
        },
    }


def idefics3_params_from_hf(src: TensorSource, cfg, dtype=jnp.float32,
                            quantize_bits=None):
    """Map an HF Idefics3 checkpoint onto our param tree."""
    return {
        "vision_tower": vit_params_from_hf(
            src, cfg.vision_config, prefix="model.vision_model.",
            dtype=dtype),
        "connector": {
            "proj": jnp.asarray(
                src.get("model.connector.modality_projection.proj."
                        "weight").T, dtype=dtype),
        },
        "language_model": llama_params_from_hf(
            src, cfg.text_config, prefix="model.text_model.",
            lm_head_key="lm_head.weight", dtype=dtype,
            quantize_bits=quantize_bits),
    }


def videollava_params_from_hf(src: TensorSource, cfg,
                              dtype=jnp.float32, quantize_bits=None):
    """Map an HF Video-LLaVA checkpoint onto our param tree.

    Handles both the legacy layout (``image_tower.*``,
    ``language_model.model.*``) and the post-4.52 flattened layout
    (``model.image_tower.*``, ``lm_head.weight``).
    """
    if any(k.startswith("language_model.model.") for k in src.keys):
        lm_prefix, lm_head = ("language_model.model.",
                              "language_model.lm_head.weight")
        it_prefix = "image_tower.vision_model."
        vt_prefix = "video_tower.vision_model."
        mp_prefix = "multi_modal_projector."
    else:
        lm_prefix, lm_head = "model.language_model.", "lm_head.weight"
        it_prefix = "model.image_tower.vision_model."
        vt_prefix = "model.video_tower.vision_model."
        mp_prefix = "model.multi_modal_projector."

    def get(k, transpose=False):
        a = src.get(k)
        return jnp.asarray(a.T if transpose else a, dtype=dtype)

    return {
        "image_tower": vit_params_from_hf(
            src, cfg.vision_config, prefix=it_prefix, dtype=dtype),
        "video_tower": vit_params_from_hf(
            src, cfg.vision_config, prefix=vt_prefix, dtype=dtype),
        "multi_modal_projector": {
            "linear_1": get(mp_prefix + "linear_1.weight", True),
            "linear_1_b": get(mp_prefix + "linear_1.bias"),
            "linear_2": get(mp_prefix + "linear_2.weight", True),
            "linear_2_b": get(mp_prefix + "linear_2.bias"),
        },
        "language_model": llama_params_from_hf(
            src, cfg.text_config, prefix=lm_prefix,
            lm_head_key=lm_head, dtype=dtype,
            quantize_bits=quantize_bits),
    }


# ---------------------------------------------------------------------------
# Generic directory loader (dispatch on config.json model_type)
# ---------------------------------------------------------------------------

def load_checkpoint(checkpoint_dir: str, dtype=jnp.bfloat16,
                    quantize_bits=None):
    """(arch_name, cfg, params) from a local HF checkpoint directory.

    Dispatches on config.json's model_type/architectures the way the
    reference resolves model classes per adapter
    (reference: mantis/mllm_tools/__init__.py:61-174).

    quantize_bits (8/4): weight-only LM quantization at load — each
    linear stack quantizes as it is assembled, so an 8B-class
    checkpoint serves from one 16 GB chip (see llama_params_from_hf).
    """
    with open(os.path.join(checkpoint_dir, "config.json")) as f:
        hf_cfg = json.load(f)
    mt = (hf_cfg.get("model_type") or "").lower()
    archs = " ".join(hf_cfg.get("architectures") or []).lower()
    src = TensorSource.from_safetensors_dir(checkpoint_dir)
    try:

        def is_(*names):
            return any(n in mt or n in archs for n in names)

        if is_("idefics3"):
            from mantis_tpu.models.idefics3.model import Idefics3Config

            cfg = Idefics3Config.from_hf_config(hf_cfg)
            return "idefics3", cfg, idefics3_params_from_hf(src, cfg, dtype, quantize_bits)
        if is_("idefics2"):
            from mantis_tpu.models.idefics2.model import Idefics2Config

            cfg = Idefics2Config.from_hf_config(hf_cfg)
            return "idefics2", cfg, idefics2_params_from_hf(src, cfg, dtype, quantize_bits)
        if is_("qwen2_vl", "qwen2vl"):
            from mantis_tpu.models.qwen2_vl.model import Qwen2VLConfig

            cfg = Qwen2VLConfig.from_hf_config(hf_cfg)
            return "qwen2_vl", cfg, qwen2_vl_params_from_hf(src, cfg, dtype, quantize_bits)
        if is_("fuyu"):
            from mantis_tpu.models.mfuyu.model import MFuyuConfig

            cfg = MFuyuConfig.from_hf_config(hf_cfg)
            return "mfuyu", cfg, mfuyu_params_from_hf(src, cfg, dtype, quantize_bits)
        if is_("internvl"):
            from mantis_tpu.models.intern_vl.model import InternVLConfig

            if any(".attention.wqkv." in k for k in src.keys):
                # original InternLM2-based fork layout (fused wqkv,
                # vision_model.* keys): only the LM mapper exists
                # (internlm2_llama_params_from_hf) — fail loudly instead
                # of a KeyError deep inside the HF-layout mapper
                raise ValueError(
                    "this InternVL checkpoint uses the original InternLM2 "
                    "fork layout; convert it to the transformers 'internvl'"
                    " layout first (the LM part can be mapped with "
                    "internlm2_llama_params_from_hf)")
            cfg = InternVLConfig.from_hf_config(hf_cfg)
            return "internvl", cfg, internvl_params_from_hf(src, cfg, dtype, quantize_bits)
        if is_("llava_next", "llavanext", "llava-next"):
            from mantis_tpu.models.mllava_next.model import LlavaNextConfig

            cfg = LlavaNextConfig.from_hf_config(hf_cfg)
            params = llava_params_from_hf(src, cfg, dtype,
                                          quantize_bits=quantize_bits)
            nl_key = ("image_newline"
                      if "image_newline" in src.keys
                      else "model.image_newline")
            params["image_newline"] = jnp.asarray(src.get(nl_key),
                                                  dtype=dtype)
            return "mllava_next", cfg, params
        if is_("video_llava", "videollava"):
            from mantis_tpu.models.videollava.model import VideoLlavaConfig

            cfg = VideoLlavaConfig.from_hf_config(hf_cfg)
            return ("videollava", cfg,
                    videollava_params_from_hf(src, cfg, dtype, quantize_bits))
        if is_("llava"):
            cfg = LlavaConfig.from_hf_config(hf_cfg)
            return "mllava", cfg, llava_params_from_hf(
                src, cfg, dtype, quantize_bits=quantize_bits)
        raise ValueError(
            f"Unrecognized checkpoint type: model_type={mt!r}, "
            f"architectures={archs!r}")
    finally:
        src.close()
