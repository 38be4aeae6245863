"""qwen2_vl_vae + idefics2_delta structural tests."""

import numpy as np

import jax
import jax.numpy as jnp
from PIL import Image

from mantis_tpu.models.configs import LlamaConfig
from mantis_tpu.models.idefics2_delta import (
    delta_frames, interleave_frames_and_deltas)
from mantis_tpu.models.qwen2_vl_vae import (
    Qwen2VLVAEConfig, forward, init_params, latent_grid_thw)


def test_qwen2_vl_vae_forward():
    cfg = Qwen2VLVAEConfig(
        latent_channels=4, latent_patch_size=2, spatial_merge_size=2,
        vision_hidden=16,
        text_config=LlamaConfig(
            vocab_size=128, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, rope_theta=10000.0,
            attention_bias=False, mrope_section=None),
        image_token_id=127)
    params = init_params(cfg, jax.random.PRNGKey(0))
    # latent 8x8 -> 4x4 patches -> 2x2 merged tokens = 4 visual tokens
    lat = np.random.RandomState(0).randn(1, 4, 8, 8).astype(np.float32)
    assert latent_grid_thw(8, 8, cfg) == (1, 4, 4)
    ids = np.array([[5, 6] + [127] * 4 + [7]])
    logits, _, _ = forward(params, cfg, input_ids=jnp.asarray(ids),
                           latents=jnp.asarray(lat), attn_impl="xla")
    assert logits.shape == (1, 7, 128)
    # latents influence the output at visual positions
    logits2, _, _ = forward(params, cfg, input_ids=jnp.asarray(ids),
                            latents=jnp.asarray(lat + 1.0),
                            attn_impl="xla")
    assert float(jnp.max(jnp.abs(logits - logits2))) > 1e-5


def test_delta_frames():
    rng = np.random.RandomState(0)
    frames = [Image.fromarray(
        rng.randint(0, 255, (32, 32, 3), np.uint8)) for _ in range(3)]
    deltas = delta_frames(frames)
    assert len(deltas) == 2
    assert deltas[0].size == (32, 32)
    stream = interleave_frames_and_deltas(frames)
    assert len(stream) == 5  # f0 d01 f1 d12 f2
