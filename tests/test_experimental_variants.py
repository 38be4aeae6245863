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


def test_qwen2_vl_vae_raw_pixels_through_vae_encoder():
    """Raw frames -> in-tree VAE encoder -> latent patchify -> LM
    (previously only precomputed latents were accepted; reference
    plugs a diffusers AutoencoderKL here,
    modeling_qwen2_vl_vae.py:121-143)."""
    from mantis_tpu.models.qwen2_vl_vae import model as M
    from mantis_tpu.models.qwen2_vl_vae.vae import (
        VAEEncoderConfig, encode, init_vae_encoder)

    cfg = M.Qwen2VLVAEConfig(
        latent_channels=4, latent_patch_size=2, spatial_merge_size=2,
        vision_hidden=32, vae_base_channels=8,
        vae_channel_mults=(1, 2),
        text_config=type(M.Qwen2VLVAEConfig().text_config)(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, rope_theta=1e6,
            mrope_section=None),
        image_token_id=127)
    params = M.init_params(cfg, jax.random.PRNGKey(0), with_vae=True)
    assert "vae" in params

    # VAE encoder alone: downsample factor and latent channels
    vcfg = VAEEncoderConfig(latent_channels=4, base_channels=8,
                            channel_mults=(1, 2))
    rng = np.random.RandomState(0)
    pix = jnp.asarray(rng.randn(1, 3, 32, 32), jnp.float32)
    lat = encode(init_vae_encoder(vcfg, jax.random.PRNGKey(1)), vcfg,
                 pix)
    assert lat.shape == (1, 4, 16, 16)  # factor 2, 4 channels

    # end to end: raw pixels produce a finite loss and grads flow
    # latents 16x16 / patch 2 -> 8x8=64 tokens / merge 2 -> 16 merged
    ids = rng.randint(2, 120, size=(1, 40))
    ids[0, 2:18] = 127
    labels = ids.copy()

    def loss_fn(p):
        _, loss, _ = M.forward(
            p, cfg, input_ids=jnp.asarray(ids),
            pixel_values=pix, labels=jnp.asarray(labels))
        return loss

    params_t = jax.tree.map(lambda x: x, params)
    loss, grads = jax.value_and_grad(loss_fn)(params_t)
    assert np.isfinite(float(loss))
    gleaves = jax.tree.leaves(grads["vae"])
    assert any(float(jnp.abs(g).max()) > 0 for g in gleaves)


def test_causal_3d_vae_shapes_and_causality():
    """Mochi-style causal-3D encoder (reference AutoencoderKLMochi,
    modeling_qwen2_vl_vae.py:121-143): latent frame j depends only on
    input frames <= j*ft."""
    from mantis_tpu.models.qwen2_vl_vae.vae import (
        CausalVAE3DConfig, encode_3d, init_vae_encoder_3d)

    vcfg = CausalVAE3DConfig(
        latent_channels=4, base_channels=8, channel_mults=(1, 2),
        temporal_expansions=(2,), groups=4)
    assert vcfg.temporal_factor == 2 and vcfg.downsample_factor == 2
    params = init_vae_encoder_3d(vcfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    clip = rng.randn(1, 5, 3, 16, 16).astype(np.float32)

    lat = encode_3d(params, vcfg, jnp.asarray(clip))
    assert lat.shape == (1, 3, 4, 8, 8)  # T'=(5-1)//2+1, f=2

    # perturb the LAST input frame: only the last latent frame moves
    clip2 = clip.copy()
    clip2[0, 4] += 1.0
    lat2 = encode_3d(params, vcfg, jnp.asarray(clip2))
    assert float(jnp.abs(lat2[:, :2] - lat[:, :2]).max()) == 0.0
    assert float(jnp.abs(lat2[:, 2] - lat[:, 2]).max()) > 1e-5

    # perturb frame 3 (odd, between latent frames): latents 0-1 see
    # only frames <= 2, so again only the last latent frame moves
    clip3 = clip.copy()
    clip3[0, 3] += 1.0
    lat3 = encode_3d(params, vcfg, jnp.asarray(clip3))
    assert float(jnp.abs(lat3[:, :2] - lat[:, :2]).max()) == 0.0
    assert float(jnp.abs(lat3[:, 2] - lat[:, 2]).max()) > 1e-5

    # perturbing frame 0 reaches every latent frame (causal, not
    # anti-causal)
    clip4 = clip.copy()
    clip4[0, 0] += 1.0
    lat4 = encode_3d(params, vcfg, jnp.asarray(clip4))
    for j in range(3):
        assert float(jnp.abs(lat4[:, j] - lat[:, j]).max()) > 1e-6


def test_qwen2_vl_vae_mochi3d_end_to_end():
    """Raw clips through the causal-3D encoder -> latent patchify ->
    LM: finite loss, grads flow into the 3-D VAE."""
    from mantis_tpu.models.qwen2_vl_vae import model as M

    cfg = M.Qwen2VLVAEConfig(
        latent_channels=4, latent_patch_size=2, spatial_merge_size=2,
        vision_hidden=32, vae_base_channels=8,
        vae_channel_mults=(1, 2), vae_type="mochi3d",
        vae_temporal_expansions=(2,),
        text_config=type(M.Qwen2VLVAEConfig().text_config)(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, rope_theta=1e6,
            mrope_section=None),
        image_token_id=127)
    params = M.init_params(cfg, jax.random.PRNGKey(0), with_vae=True)

    rng = np.random.RandomState(1)
    # T=3, ft=2 -> 2 latent frames; 32px/2/2 -> 8x8 patches -> /2
    # merge -> 16 tokens per latent frame -> 32 image tokens
    clip = jnp.asarray(rng.randn(1, 3, 3, 32, 32), jnp.float32)
    ids = rng.randint(2, 120, size=(1, 40))
    ids[0, 2:34] = 127
    labels = ids.copy()

    def loss_fn(p):
        _, loss, _ = M.forward(
            p, cfg, input_ids=jnp.asarray(ids), pixel_values=clip,
            labels=jnp.asarray(labels))
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    gleaves = jax.tree.leaves(grads["vae"])
    assert any(float(jnp.abs(g).max()) > 0 for g in gleaves)
