"""Behavioral tests: OpenFlamingo gated x-attn + SigLIP-Video."""

import numpy as np

import jax
import jax.numpy as jnp

from mantis_tpu.models.configs import LlamaConfig, VisionConfig
from mantis_tpu.models.openflamingo import (
    FlamingoConfig, forward as flamingo_forward, init_params as fl_init)
from mantis_tpu.models.siglip_video import (
    SiglipTextConfig, SiglipVideoConfig, forward as sv_forward,
    init_params as sv_init, sigmoid_contrastive_loss)


def tiny_flamingo_cfg():
    return FlamingoConfig(
        vision_config=VisionConfig(
            tower_type="clip", hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=2, image_size=28,
            patch_size=14),
        text_config=LlamaConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=4, num_attention_heads=4,
            num_key_value_heads=2),
        cross_attn_every_n_layers=2,
        perceiver_depth=2, perceiver_num_latents=4, perceiver_heads=2,
        perceiver_head_dim=16, media_token_id=127)


def test_flamingo_zero_gates_are_noop():
    cfg = tiny_flamingo_cfg()
    params = fl_init(cfg, jax.random.PRNGKey(0))
    ids = np.array([[5, 127, 6, 7, 8]])
    pix = np.random.RandomState(0).randn(1, 3, 28, 28).astype(np.float32)
    with_media, _, _ = flamingo_forward(
        params, cfg, input_ids=jnp.asarray(ids),
        pixel_values=jnp.asarray(pix), num_media=1, attn_impl="xla")
    text_only, _, _ = flamingo_forward(
        params, cfg, input_ids=jnp.asarray(ids), attn_impl="xla")
    # tanh(0) gates -> media cannot influence the output
    np.testing.assert_allclose(np.asarray(with_media),
                               np.asarray(text_only), atol=1e-5)

    # open the gates -> media matters, but ONLY after the media token
    params2 = dict(params)
    params2["xattn"] = dict(params["xattn"],
                            attn_gate=jnp.ones_like(
                                params["xattn"]["attn_gate"]))
    g1, _, _ = flamingo_forward(
        params2, cfg, input_ids=jnp.asarray(ids),
        pixel_values=jnp.asarray(pix), num_media=1, attn_impl="xla")
    pix2 = pix + 1.0
    g2, _, _ = flamingo_forward(
        params2, cfg, input_ids=jnp.asarray(ids),
        pixel_values=jnp.asarray(pix2), num_media=1, attn_impl="xla")
    diff = np.abs(np.asarray(g1) - np.asarray(g2))
    assert diff[:, 0].max() < 1e-5   # before the media token: unaffected
    assert diff[:, 2:].max() > 1e-4  # after: affected


def test_flamingo_media_mask_semantics():
    from mantis_tpu.models.openflamingo.model import _media_mask

    # ids: [IMG, t, IMG, t, t] -> text_time [1,1,2,2,2]
    locs = jnp.asarray([[True, False, True, False, False]])
    m_imm = _media_mask(locs, t_media=2, n_latents=1,
                        only_immediate=True)
    # token 1 (after media 1): attends media 1 only
    assert m_imm[0, 1].tolist() == [True, False]
    # token 3 (after media 2): attends media 2 only
    assert m_imm[0, 3].tolist() == [False, True]
    m_all = _media_mask(locs, t_media=2, n_latents=1,
                        only_immediate=False)
    assert m_all[0, 3].tolist() == [True, True]
    assert m_all[0, 1].tolist() == [True, False]


def test_siglip_video_contrastive():
    cfg = SiglipVideoConfig(
        vision_config=VisionConfig(
            tower_type="siglip", hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=2, image_size=28,
            patch_size=14),
        text_config=SiglipTextConfig(
            vocab_size=64, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=2,
            max_position_embeddings=16),
        num_latents=4, perceiver_depth=1, max_temporal_clip_size=4)
    params = sv_init(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    frames = rng.randn(2, 8, 3, 28, 28).astype(np.float32)
    ids = rng.randint(0, 64, size=(2, 12))
    loss, vemb, temb = sv_forward(
        params, cfg, input_ids=jnp.asarray(ids),
        frames=jnp.asarray(frames), attn_impl="xla")
    assert np.isfinite(float(loss))
    assert vemb.shape == (2, 32) and temb.shape == (2, 32)
    # gradient flows to logit scale and towers
    def loss_fn(p):
        l, _, _ = sv_forward(p, cfg, input_ids=jnp.asarray(ids),
                             frames=jnp.asarray(frames), attn_impl="xla")
        return l
    g = jax.grad(loss_fn)(params)
    assert float(jnp.abs(g["logit_scale"])) > 0
    assert float(jnp.max(jnp.abs(g["video_proj"]))) > 0


def test_sigmoid_loss_prefers_matched_pairs():
    v = jnp.eye(4, 8)
    t_match = jnp.eye(4, 8)
    t_shuffle = jnp.roll(t_match, 1, axis=0)
    good = sigmoid_contrastive_loss(v, t_match, jnp.log(10.0), -2.0)
    bad = sigmoid_contrastive_loss(v, t_shuffle, jnp.log(10.0), -2.0)
    assert float(good) < float(bad)
