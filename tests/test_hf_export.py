"""HF export round-trip: our params -> HF checkpoint dir ->
transformers.from_pretrained logits match; our loader also reads it."""

import numpy as np
import torch
import transformers

import jax
import jax.numpy as jnp

from mantis_tpu.io.hf_export import save_llava
from mantis_tpu.io.hf_loader import load_llava
from mantis_tpu.models.configs import LlamaConfig, LlavaConfig, VisionConfig
from mantis_tpu.models.mllava import model as mllava_model


def test_export_roundtrip_via_transformers(tmp_path):
    cfg = LlavaConfig(
        vision_config=VisionConfig(
            tower_type="clip", hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=2, image_size=28,
            patch_size=14, layer_norm_eps=1e-5),
        text_config=LlamaConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, rope_theta=10000.0,
            max_position_embeddings=256),
        image_token_index=127, pad_token_id=0,
    )
    params = mllava_model.init_params(cfg, jax.random.PRNGKey(5))
    out_dir = str(tmp_path / "ckpt")
    save_llava(params, cfg, out_dir)

    hf = transformers.LlavaForConditionalGeneration.from_pretrained(
        out_dir, attn_implementation="eager").eval()
    P = cfg.num_image_tokens
    ids = np.array([[5, 6] + [127] * P + [7, 8, 9]])
    pix = np.random.RandomState(5).randn(1, 3, 28, 28).astype(np.float32)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 pixel_values=torch.tensor(pix)).logits.numpy()
    ours, _, _ = mllava_model.forward(
        params, cfg, input_ids=jnp.asarray(ids),
        pixel_values=jnp.asarray(pix), attn_impl="xla")
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-4, rtol=2e-3)

    # our own loader reads the exported dir
    cfg2, params2 = load_llava(out_dir, dtype=jnp.float32)
    ours2, _, _ = mllava_model.forward(
        params2, cfg2, input_ids=jnp.asarray(ids),
        pixel_values=jnp.asarray(pix), attn_impl="xla")
    np.testing.assert_allclose(np.asarray(ours2), np.asarray(ours),
                               atol=1e-5)
