"""Qwen2-VL parity vs tiny HF Qwen2VLForConditionalGeneration."""

import numpy as np
import pytest
import torch
import transformers

import jax
import jax.numpy as jnp

from mantis_tpu.io.hf_loader import TensorSource, qwen2_vl_params_from_hf
from mantis_tpu.models.qwen2_vl import (
    Qwen2VLConfig,
    forward,
    forward_classification,
    get_rope_index,
    init_classification_params,
    vision_rot_pos_ids,
    vision_segment_ids,
)


def tiny_hf_qwen2vl():
    cfg = transformers.Qwen2VLConfig(
        vision_config=dict(
            depth=2, embed_dim=32, num_heads=2, in_channels=3,
            patch_size=14, temporal_patch_size=2, spatial_merge_size=2,
            mlp_ratio=2.0, hidden_size=48),
        vocab_size=160, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, rms_norm_eps=1e-6, rope_theta=10000.0,
        rope_scaling={"type": "mrope", "mrope_section": [2, 2, 2]},
        image_token_id=151, video_token_id=152,
        vision_start_token_id=150, attn_implementation="eager",
        sliding_window=None, use_sliding_window=False,
    )
    torch.manual_seed(33)
    return transformers.Qwen2VLForConditionalGeneration(cfg).eval(), cfg


def test_text_only_parity_with_mrope():
    hf, hf_cfg = tiny_hf_qwen2vl()
    cfg = Qwen2VLConfig.from_hf_config(hf_cfg)
    assert cfg.text_config.mrope_section == (2, 2, 2)
    params = qwen2_vl_params_from_hf(
        TensorSource.from_state_dict(hf.state_dict()), cfg)
    ids = np.random.RandomState(0).randint(0, 140, size=(2, 11))
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids)).logits.numpy()
    pos, _ = get_rope_index(ids, None, None, cfg)
    ours, _, _ = forward(params, cfg, input_ids=jnp.asarray(ids),
                         positions=jnp.asarray(pos), attn_impl="xla")
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-4,
                               rtol=5e-3)


def test_image_parity():
    hf, hf_cfg = tiny_hf_qwen2vl()
    cfg = Qwen2VLConfig.from_hf_config(hf_cfg)
    params = qwen2_vl_params_from_hf(
        TensorSource.from_state_dict(hf.state_dict()), cfg)

    # one image: grid (1, 4, 4) -> 16 patches -> 4 merged tokens
    grid = np.array([[1, 4, 4]])
    n_tok = 16 // 4
    rng = np.random.RandomState(1)
    patches = rng.randn(16, 3 * 2 * 14 * 14).astype(np.float32)
    ids = np.array([[5, 150] + [151] * n_tok + [7, 8]])
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 pixel_values=torch.tensor(patches),
                 image_grid_thw=torch.tensor(grid)).logits.numpy()

    pos, _ = get_rope_index(ids, grid, None, cfg)
    rp = vision_rot_pos_ids([(1, 4, 4)], merge=2)
    seg = vision_segment_ids([(1, 4, 4)])
    ours, _, _ = forward(
        params, cfg, input_ids=jnp.asarray(ids),
        pixel_values=jnp.asarray(patches),
        rot_pos_ids=jnp.asarray(rp),
        vision_segment_ids_arr=jnp.asarray(seg),
        positions=jnp.asarray(pos), attn_impl="xla")
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-3,
                               rtol=1e-2)


def test_get_rope_index_matches_hf():
    hf, hf_cfg = tiny_hf_qwen2vl()
    cfg = Qwen2VLConfig.from_hf_config(hf_cfg)
    grid = np.array([[1, 4, 4]])
    ids = np.array([[5, 150] + [151] * 4 + [7, 8, 9]])
    mask = np.ones_like(ids)
    target = hf.model if hasattr(hf.model, "get_rope_index") else hf
    ref_pos, ref_delta = target.get_rope_index(
        torch.tensor(ids), torch.tensor(grid), None,
        attention_mask=torch.tensor(mask))
    pos, delta = get_rope_index(ids, grid, mask, cfg)
    np.testing.assert_array_equal(pos, ref_pos.numpy())
    np.testing.assert_array_equal(delta, ref_delta.numpy())


def test_classification_special_token_pooling():
    hf, hf_cfg = tiny_hf_qwen2vl()
    cfg = Qwen2VLConfig.from_hf_config(hf_cfg)
    import dataclasses

    cfg = dataclasses.replace(cfg, num_labels=2,
                              score_type="special_token")
    params = init_classification_params(cfg, jax.random.PRNGKey(0))
    ids = np.array([[5, 6, 120, 7, 121, 8]])
    label_pos = np.array([[2, 4]])  # positions of <|LABEL_i|> tokens
    logits = forward_classification(
        params, cfg, input_ids=jnp.asarray(ids),
        label_token_positions=jnp.asarray(label_pos), attn_impl="xla")
    assert logits.shape == (1, 2)


def test_smart_resize_and_patchify():
    from PIL import Image

    from mantis_tpu.models.qwen2_vl.processor import (
        patchify_image, smart_resize)

    nh, nw = smart_resize(100, 220, factor=28, min_pixels=56 * 56,
                          max_pixels=28 * 28 * 16)
    assert nh % 28 == 0 and nw % 28 == 0
    assert nh * nw <= 28 * 28 * 16

    img = Image.new("RGB", (220, 100), "red")
    flat, (gt, gh, gw) = patchify_image(
        img, min_pixels=56 * 56, max_pixels=28 * 28 * 16)
    assert flat.shape == (gt * gh * gw, 3 * 2 * 14 * 14)
    assert gh % 2 == 0 and gw % 2 == 0
