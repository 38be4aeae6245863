"""Idefics2 parity vs tiny HF Idefics2ForConditionalGeneration."""

import numpy as np
import pytest
import torch
import transformers

import jax
import jax.numpy as jnp

from mantis_tpu.io.hf_loader import TensorSource, idefics2_params_from_hf
from mantis_tpu.models.idefics2 import (
    Idefics2Config,
    Idefics2Processor,
    build_patch_grid,
    forward,
    forward_classification,
    navit_position_ids,
)


def tiny_hf_idefics2():
    cfg = transformers.Idefics2Config(
        vision_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=56, patch_size=14),
        perceiver_config=dict(
            resampler_n_latents=4, resampler_depth=2, resampler_n_heads=2,
            resampler_head_dim=16, num_key_value_heads=1),
        text_config=dict(
            model_type="mistral", vocab_size=128, hidden_size=32,
            intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            rms_norm_eps=1e-6, rope_theta=10000.0,
            sliding_window=None),
        image_token_id=127,
        attn_implementation="eager",
    )
    torch.manual_seed(21)
    return transformers.Idefics2ForConditionalGeneration(cfg).eval(), cfg


def test_navit_position_ids_match_hf_semantics():
    # 4x4 patch canvas, image occupying 2x3 patches
    side = 4
    pos = navit_position_ids(2, 3, side)
    # fractional h = [0, .5)*(1-eps) -> buckets {0, 1};
    # fractional w = [0, 1/3, 2/3)*(1-eps) -> buckets {0, 1, 2}
    assert pos.tolist() == [0, 1, 2, 4, 5, 6]
    mask, grid_pos = build_patch_grid(
        2 * 14, 3 * 14, type("C", (), {"image_size": 56,
                                       "patch_size": 14}))
    assert mask.sum() == 6
    assert grid_pos[mask.astype(bool)].tolist() == [0, 1, 2, 4, 5, 6]


def test_idefics2_logit_parity_full_images():
    hf, hf_cfg = tiny_hf_idefics2()
    cfg = Idefics2Config.from_hf_config(hf_cfg)
    params = idefics2_params_from_hf(
        TensorSource.from_state_dict(hf.state_dict()), cfg)

    L = cfg.num_image_tokens  # 4 latents
    ids = np.array([[5, 6] + [127] * L + [7, 8] + [127] * L + [9]])
    rng = np.random.RandomState(21)
    pix = rng.randn(1, 2, 3, 56, 56).astype(np.float32)  # [B, N, C, H, W]
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 pixel_values=torch.tensor(pix)).logits.numpy()

    # ours: flattened images + full patch grids
    side = 56 // 14
    P = side * side
    pos = navit_position_ids(side, side, side)
    ours, _, _ = forward(
        params, cfg, input_ids=jnp.asarray(ids),
        pixel_values=jnp.asarray(pix.reshape(2, 3, 56, 56)),
        patch_mask=jnp.ones((2, P), jnp.int32),
        patch_position_ids=jnp.broadcast_to(jnp.asarray(pos)[None],
                                            (2, P)),
        attn_impl="xla")
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-4,
                               rtol=5e-3)


def test_idefics2_variable_aspect_parity():
    hf, hf_cfg = tiny_hf_idefics2()
    cfg = Idefics2Config.from_hf_config(hf_cfg)
    params = idefics2_params_from_hf(
        TensorSource.from_state_dict(hf.state_dict()), cfg)

    # image occupies 28x42 in a 56x56 canvas
    rng = np.random.RandomState(22)
    canvas = np.zeros((1, 1, 3, 56, 56), np.float32)
    canvas[:, :, :, :28, :42] = rng.randn(1, 1, 3, 28, 42)
    pam = np.zeros((1, 1, 56, 56), bool)
    pam[:, :, :28, :42] = True
    L = cfg.num_image_tokens
    ids = np.array([[5] + [127] * L + [6, 7]])
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 pixel_values=torch.tensor(canvas),
                 pixel_attention_mask=torch.tensor(pam)).logits.numpy()

    mask, pos = build_patch_grid(
        28, 42, type("C", (), {"image_size": 56, "patch_size": 14}))
    ours, _, _ = forward(
        params, cfg, input_ids=jnp.asarray(ids),
        pixel_values=jnp.asarray(canvas.reshape(1, 3, 56, 56)),
        patch_mask=jnp.asarray(mask)[None],
        patch_position_ids=jnp.asarray(pos)[None],
        attn_impl="xla")
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-4,
                               rtol=5e-3)


def test_idefics2_processor():
    from tests.test_data import make_tokenizer

    tok = make_tokenizer()
    proc = Idefics2Processor(tok, image_size=56, patch_size=14,
                             image_seq_len=4, shortest_edge=28)
    from PIL import Image

    img = Image.new("RGB", (100, 60), "green")
    out = proc("look <image> ok", [img])
    img_id = proc.image_token_index
    assert (out["input_ids"][0] == img_id).sum() == 4
    fake_id = tok.convert_tokens_to_ids("<fake_token_around_image>")
    assert (out["input_ids"][0] == fake_id).sum() == 2
    assert out["pixel_values"].shape == (1, 3, 56, 56)
    assert out["patch_mask"].shape == (1, 16)
    assert 0 < out["patch_mask"].sum() <= 16


def test_classification_head_shapes():
    hf, hf_cfg = tiny_hf_idefics2()
    cfg = Idefics2Config.from_hf_config(hf_cfg)
    import dataclasses

    cfg = dataclasses.replace(cfg, num_labels=3)
    from mantis_tpu.models.idefics2 import init_classification_params

    params = init_classification_params(cfg, jax.random.PRNGKey(0))
    ids = np.array([[5, 6, 7, 0, 0], [5, 6, 7, 8, 9]])
    seg = (ids != 0).astype(np.int32)
    logits = forward_classification(
        params, cfg, input_ids=jnp.asarray(ids),
        segment_ids=jnp.asarray(seg), attn_impl="xla")
    assert logits.shape == (2, 3)


def test_sliding_window_parity_seq_longer_than_window():
    """Mistral SWA (reference: HF Mistral via attn_implementation,
    modeling_idefics2.py:1498): at seq 48 > window 8 our windowed
    decoder must match HF eager, and differ from the full-attn run."""
    cfg_kwargs = dict(
        vision_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=56, patch_size=14),
        perceiver_config=dict(
            resampler_n_latents=4, resampler_depth=2, resampler_n_heads=2,
            resampler_head_dim=16, num_key_value_heads=1),
        text_config=dict(
            model_type="mistral", vocab_size=128, hidden_size=32,
            intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            rms_norm_eps=1e-6, rope_theta=10000.0, sliding_window=8),
        image_token_id=127,
        attn_implementation="eager",
    )
    hf_cfg = transformers.Idefics2Config(**cfg_kwargs)
    torch.manual_seed(33)
    hf = transformers.Idefics2ForConditionalGeneration(hf_cfg).eval()
    cfg = Idefics2Config.from_hf_config(hf_cfg)
    assert cfg.text_config.sliding_window == 8
    params = idefics2_params_from_hf(
        TensorSource.from_state_dict(hf.state_dict()), cfg)

    rng = np.random.RandomState(0)
    ids = rng.randint(0, 120, size=(1, 48))
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids)).logits.numpy()
    ours, _, _ = forward(params, cfg, input_ids=jnp.asarray(ids))
    rel = (np.abs(np.asarray(ours, np.float32) - ref).max()
           / (np.abs(ref).max() + 1e-9))
    assert rel < 2e-3, rel

    # full attention must differ (the window actually bites at seq 48)
    import dataclasses as dc
    cfg_full = dc.replace(
        cfg, text_config=dc.replace(cfg.text_config, sliding_window=None))
    full, _, _ = forward(params, cfg_full, input_ids=jnp.asarray(ids))
    assert float(jnp.abs(full - ours).max()) > 1e-3


def test_build_patch_grid_sub_canvas():
    """A canvas smaller than cfg.image_size (HF pads to the batch max,
    not the config max) yields the top-left sub-block of the full grid
    with the same position-id buckets."""
    cfgc = type("C", (), {"image_size": 98, "patch_size": 14})
    m_full, p_full = build_patch_grid(56, 42, cfgc)
    m_sub, p_sub = build_patch_grid(56, 42, cfgc, canvas_h=56,
                                    canvas_w=56)
    assert m_sub.shape == p_sub.shape == (16,)
    np.testing.assert_array_equal(
        m_sub.reshape(4, 4), m_full.reshape(7, 7)[:4, :4])
    np.testing.assert_array_equal(
        p_sub.reshape(4, 4), p_full.reshape(7, 7)[:4, :4])


@pytest.mark.slow
def test_idefics2_sub_canvas_parity_vs_hf():
    """Canvas (56x56) SMALLER than config image_size (98): HF drives
    pixel_attention_mask over the small canvas; ours drives the
    canvas-sized patch grid.  Mirrors the full-width parity protocol
    (scripts/parity_idefics2_fullwidth.py) at tiny widths."""
    cfg_t = transformers.Idefics2Config(
        vision_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=98, patch_size=14,
            layer_norm_eps=1e-6),
        perceiver_config=dict(
            resampler_n_latents=4, resampler_depth=2,
            resampler_n_heads=2, resampler_head_dim=8,
            num_key_value_heads=1),
        text_config=dict(
            model_type="mistral", vocab_size=99, hidden_size=32,
            intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            rms_norm_eps=1e-5, rope_theta=10000.0, sliding_window=16,
            max_position_embeddings=2048),
        image_token_id=97, attn_implementation="eager")
    torch.manual_seed(0)
    hf = transformers.Idefics2ForConditionalGeneration(cfg_t).eval()
    cfg = Idefics2Config.from_hf_config(cfg_t)
    params = idefics2_params_from_hf(
        TensorSource.from_state_dict(hf.state_dict()), cfg,
        dtype=jnp.float32)

    rng = np.random.RandomState(0)
    ch, cw = 56, 56
    sizes = [(56, 42), (28, 56)]
    canvas = np.zeros((1, 2, 3, ch, cw), np.float32)
    pam = np.zeros((1, 2, ch, cw), bool)
    for i, (h, w) in enumerate(sizes):
        canvas[0, i, :, :h, :w] = rng.randn(3, h, w)
        pam[0, i, :h, :w] = True

    L = cfg.num_image_tokens
    ids = np.concatenate([
        rng.randint(5, 90, size=3), np.full(L, 97),
        rng.randint(5, 90, size=20), np.full(L, 97),
        rng.randint(5, 90, size=20)])[None, :]

    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 pixel_values=torch.tensor(canvas),
                 pixel_attention_mask=torch.tensor(pam)).logits.numpy()

    grid_cfg = type("C", (), {"image_size": 98, "patch_size": 14})
    masks, poss = zip(*(build_patch_grid(h, w, grid_cfg, canvas_h=ch,
                                         canvas_w=cw)
                        for h, w in sizes))
    ours, _, _ = forward(
        params, cfg, input_ids=jnp.asarray(ids),
        pixel_values=jnp.asarray(canvas.reshape(2, 3, ch, cw)),
        patch_mask=jnp.asarray(np.stack(masks)),
        patch_position_ids=jnp.asarray(np.stack(poss)),
        attn_impl="xla")
    ours = np.asarray(ours, np.float32)
    rel = np.abs(ours - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 1e-4, rel
