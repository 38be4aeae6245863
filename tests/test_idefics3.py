"""Idefics3 parity vs tiny HF Idefics3ForConditionalGeneration."""

import numpy as np
import torch
import transformers

import jax.numpy as jnp

from mantis_tpu.io.hf_loader import TensorSource, idefics3_params_from_hf
from mantis_tpu.models.idefics3 import (
    Idefics3Config, forward, pixel_shuffle_idefics3)


def test_idefics3_logit_parity():
    cfg_hf = transformers.Idefics3Config(
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=2,
                           image_size=56, patch_size=14),
        text_config=dict(model_type="llama", vocab_size=160,
                         hidden_size=48, intermediate_size=96,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2),
        scale_factor=2, image_token_id=150,
        attn_implementation="eager")
    torch.manual_seed(66)
    hf = transformers.Idefics3ForConditionalGeneration(cfg_hf).eval()
    cfg = Idefics3Config.from_hf_config(cfg_hf)
    params = idefics3_params_from_hf(
        TensorSource.from_state_dict(hf.state_dict()), cfg)

    n_tok = cfg.num_image_tokens  # (4/2)^2 = 4
    ids = np.array([[5, 6] + [150] * n_tok + [7, 8]])
    pix = np.random.RandomState(66).randn(1, 1, 3, 56, 56).astype(
        np.float32)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 pixel_values=torch.tensor(pix)).logits.numpy()
    ours, _, _ = forward(params, cfg, input_ids=jnp.asarray(ids),
                         pixel_values=jnp.asarray(
                             pix.reshape(1, 3, 56, 56)),
                         attn_impl="xla")
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-4,
                               rtol=5e-3)


def test_pixel_shuffle_idefics3_shape():
    x = jnp.arange(2 * 16 * 8, dtype=jnp.float32).reshape(2, 16, 8)
    y = pixel_shuffle_idefics3(x, 2)
    assert y.shape == (2, 4, 32)
