"""PEFT-interop adapter export round trip.

The reference saves LoRA runs as peft artifacts loadable by the HF
stack (reference train_mllava.py:330-345, train_utils.py:82-124).
These tests prove the TPU trainer's functional LoRA tree exports to
that layout and that ``peft.PeftModel.from_pretrained`` over the torch
model reproduces the merged JAX model's logits exactly.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import transformers

from mantis_tpu.io.hf_loader import TensorSource, llava_params_from_hf
from mantis_tpu.io.peft_export import (peft_adapter_state_dict,
                                       save_peft_adapter)
from mantis_tpu.models.configs import LlavaConfig
from mantis_tpu.models.mllava import model as mllava_model
from mantis_tpu.train.lora import (LoraConfig, init_lora_params,
                                   merge_lora_into_params)

peft = pytest.importorskip("peft")


def _tiny_hf_llava():
    torch.manual_seed(7)
    cfg = transformers.LlavaConfig(
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=2,
                           image_size=28, patch_size=14,
                           attn_implementation="eager"),
        text_config=dict(model_type="llama", vocab_size=128,
                         hidden_size=64, intermediate_size=128,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2,
                         max_position_embeddings=256,
                         rope_theta=10000.0,
                         tie_word_embeddings=False,
                         attn_implementation="eager"),
        image_token_index=127, vision_feature_layer=-2,
        vision_feature_select_strategy="default",
        attn_implementation="eager")
    return transformers.LlavaForConditionalGeneration(cfg).eval(), cfg


def _trained_lora(params, rng_seed=3, r=4):
    """A LoRA tree with NONZERO B (as after training) so the adapter
    actually changes the logits — a zero delta would vacuously pass."""
    lcfg = LoraConfig(r=r, alpha=2.0 * r)
    lora = init_lora_params(params, lcfg, jax.random.PRNGKey(rng_seed))
    rng = np.random.RandomState(rng_seed)
    lora = jax.tree.map(
        lambda x: jnp.asarray(
            rng.randn(*x.shape).astype(np.float32) * 0.05), lora)
    return lora, lcfg


def test_peft_roundtrip_logits_match(tmp_path):
    hf, hf_cfg = _tiny_hf_llava()
    cfg = LlavaConfig.from_hf_config(hf_cfg)
    params = llava_params_from_hf(
        TensorSource.from_state_dict(hf.state_dict()), cfg)
    lora, lcfg = _trained_lora(params)
    assert lora, "no LoRA targets found"

    adir = tmp_path / "adapter"
    save_peft_adapter("mllava", lora, lcfg, str(adir),
                      base_model_name_or_path="tiny-llava")
    assert (adir / "adapter_model.safetensors").exists()
    assert (adir / "adapter_config.json").exists()
    assert (adir / "non_lora_trainables.bin").exists()

    # --- torch side: peft injects the adapter into the HF model ---
    pm = peft.PeftModel.from_pretrained(hf, str(adir))
    pm = pm.eval()

    ids = np.array([[5, 6] + [127] * 4 + [7, 8, 9]])
    pix = np.random.RandomState(1).randn(1, 3, 28, 28).astype(
        np.float32)
    with torch.no_grad():
        peft_logits = pm(input_ids=torch.tensor(ids),
                         pixel_values=torch.tensor(pix)).logits.numpy()
        merged_torch = pm.merge_and_unload()
        merged_logits = merged_torch(
            input_ids=torch.tensor(ids),
            pixel_values=torch.tensor(pix)).logits.numpy()

    # --- JAX side: merged adapter baked into the functional tree ---
    merged = merge_lora_into_params(params, lora, lcfg)
    ours, _, _ = mllava_model.forward(
        merged, cfg, input_ids=jnp.asarray(ids),
        pixel_values=jnp.asarray(pix), attn_impl="xla")

    # the adapter must actually do something...
    base_ours, _, _ = mllava_model.forward(
        params, cfg, input_ids=jnp.asarray(ids),
        pixel_values=jnp.asarray(pix), attn_impl="xla")
    assert np.abs(np.asarray(ours) - np.asarray(base_ours)).max() > 1e-3

    # ...and all three paths agree
    np.testing.assert_allclose(np.asarray(ours), peft_logits,
                               atol=3e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(ours), merged_logits,
                               atol=3e-4, rtol=2e-3)


def test_peft_export_wraps_only_lm_linears(tmp_path):
    """target_modules are full names: the vision tower's same-named
    q_proj/k_proj/... must NOT get adapters (reference
    find_all_linear_names excludes vision/projector,
    train_mllava.py:116-128)."""
    hf, hf_cfg = _tiny_hf_llava()
    cfg = LlavaConfig.from_hf_config(hf_cfg)
    params = llava_params_from_hf(
        TensorSource.from_state_dict(hf.state_dict()), cfg)
    lora, lcfg = _trained_lora(params)
    adir = tmp_path / "adapter"
    save_peft_adapter("mllava", lora, lcfg, str(adir))

    pm = peft.PeftModel.from_pretrained(hf, str(adir))
    wrapped = [n for n, m in pm.named_modules()
               if m.__class__.__name__ == "Linear"
               and hasattr(m, "lora_A")]
    assert wrapped
    assert all("language_model" in n for n in wrapped)
    assert not any("vision_tower" in n for n in wrapped)
    # every adapted layer x proj is wrapped: 2 layers x 7 projs
    assert len(wrapped) == 14


def test_peft_state_dict_orientation():
    """lora_A is [r, in] / lora_B is [out, r] (torch Linear layout) —
    the transpose of our [in, r] / [r, out] functional storage."""
    hf, hf_cfg = _tiny_hf_llava()
    cfg = LlavaConfig.from_hf_config(hf_cfg)
    params = llava_params_from_hf(
        TensorSource.from_state_dict(hf.state_dict()), cfg)
    lora, lcfg = _trained_lora(params, r=4)
    sd = peft_adapter_state_dict("mllava", lora)
    a_key = ("base_model.model.model.language_model.layers.0."
             "self_attn.q_proj.lora_A.weight")
    b_key = a_key.replace("lora_A", "lora_B")
    assert sd[a_key].shape == (4, 64)
    assert sd[b_key].shape == (64, 4)
    np.testing.assert_array_equal(
        sd[a_key], np.asarray(
            lora["language_model/layers/q_proj"]["a"])[0].T)


def test_non_lora_trainables_roundtrip(tmp_path):
    """The projector (non-LoRA trainable in the reference recipe) rides
    along in non_lora_trainables.bin and torch.load round-trips it."""
    hf, hf_cfg = _tiny_hf_llava()
    cfg = LlavaConfig.from_hf_config(hf_cfg)
    params = llava_params_from_hf(
        TensorSource.from_state_dict(hf.state_dict()), cfg)
    lora, lcfg = _trained_lora(params)
    proj = {"base_model.model.model.multi_modal_projector."
            "linear_1.weight":
            np.asarray(params["multi_modal_projector"]["linear_1"]).T}
    adir = tmp_path / "adapter"
    save_peft_adapter("mllava", lora, lcfg, str(adir),
                      non_lora_trainables=proj)
    loaded = torch.load(adir / "non_lora_trainables.bin",
                        weights_only=True)
    (key,) = loaded
    np.testing.assert_allclose(loaded[key].numpy(),
                               list(proj.values())[0])
