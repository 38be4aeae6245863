"""InternVL parity + cross-attention behavioral tests."""

import numpy as np
import torch
import transformers

import jax
import jax.numpy as jnp

from mantis_tpu.io.hf_loader import TensorSource, internvl_params_from_hf
from mantis_tpu.models.intern_vl import (
    InternVLChatProcessor,
    InternVLConfig,
    dynamic_preprocess,
    forward,
    init_cross_attention_params,
    init_params,
    pixel_shuffle,
)


def tiny_hf_internvl():
    cfg = transformers.InternVLConfig(
        vision_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=[56, 56],
            patch_size=[14, 14], use_qk_norm=False,
            layer_scale_init_value=0.1, attention_bias=True,
            use_absolute_position_embeddings=True),
        text_config=dict(
            model_type="llama", vocab_size=128, hidden_size=64,
            intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2),
        image_token_id=127, downsample_ratio=0.5,
        vision_feature_layer=-1,
        vision_feature_select_strategy="default",
        attn_implementation="eager")
    torch.manual_seed(55)
    return transformers.InternVLForConditionalGeneration(cfg).eval(), cfg


def test_pixel_shuffle_matches_hf():
    import transformers.models.internvl.modeling_internvl as hf_m

    x = np.random.RandomState(0).randn(2, 4, 4, 8).astype(np.float32)
    hf, hf_cfg = tiny_hf_internvl()
    ref = hf.model.pixel_shuffle(torch.tensor(x), 0.5).numpy()
    ours = pixel_shuffle(jnp.asarray(x), 0.5)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-6)


def test_internvl_inline_logit_parity():
    hf, hf_cfg = tiny_hf_internvl()
    cfg = InternVLConfig.from_hf_config(hf_cfg)
    params = internvl_params_from_hf(
        TensorSource.from_state_dict(hf.state_dict()), cfg)
    n_tok = cfg.num_image_tokens  # (4 * 0.5)^2 = 4
    ids = np.array([[5, 6] + [127] * n_tok + [7, 8]])
    pix = np.random.RandomState(55).randn(1, 3, 56, 56).astype(
        np.float32)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 pixel_values=torch.tensor(pix)).logits.numpy()
    ours, _, _ = forward(params, cfg, input_ids=jnp.asarray(ids),
                         pixel_values=jnp.asarray(pix), attn_impl="xla")
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-4,
                               rtol=5e-3)


def test_cross_attention_zero_gates_are_noop():
    """Zero-initialized tanh gates must leave logits identical to the
    no-cross-attention model (the reference's init contract,
    train_intern_vl_25.py:302-318)."""
    import dataclasses

    hf, hf_cfg = tiny_hf_internvl()
    cfg = InternVLConfig.from_hf_config(hf_cfg)
    cfg_x = dataclasses.replace(cfg, enable_cross_attention=True)
    params = internvl_params_from_hf(
        TensorSource.from_state_dict(hf.state_dict()), cfg)
    ids = np.array([[5, 6, 7, 8, 9]])
    pix = np.random.RandomState(1).randn(2, 3, 56, 56).astype(np.float32)

    base_logits, _, _ = forward(
        params, cfg, input_ids=jnp.asarray(ids), attn_impl="xla")

    params_x = dict(params)
    params_x["cross_attention"] = init_cross_attention_params(
        cfg.text_config, jax.random.PRNGKey(3))
    logits_x, _, _ = forward(
        params_x, cfg_x, input_ids=jnp.asarray(ids),
        pixel_values=jnp.asarray(pix), attn_impl="xla")
    np.testing.assert_allclose(np.asarray(logits_x),
                               np.asarray(base_logits), atol=1e-5)

    # non-zero gates change the output
    params_x["cross_attention"] = dict(
        params_x["cross_attention"],
        attn_gate=jnp.ones_like(
            params_x["cross_attention"]["attn_gate"]))
    logits_g, _, _ = forward(
        params_x, cfg_x, input_ids=jnp.asarray(ids),
        pixel_values=jnp.asarray(pix), attn_impl="xla")
    assert float(jnp.max(jnp.abs(logits_g - base_logits))) > 1e-4


def test_dynamic_preprocess_tiling():
    from PIL import Image

    img = Image.new("RGB", (900, 450), "red")
    tiles = dynamic_preprocess(img, tile=448, max_num=12)
    # 2:1 aspect -> 2x1 grid + thumbnail
    assert len(tiles) == 3
    assert all(t.size == (448, 448) for t in tiles)
    sq = Image.new("RGB", (300, 300))
    tiles = dynamic_preprocess(sq, tile=448, max_num=12)
    assert len(tiles) == 1  # 1x1, no thumbnail


def test_processor_modes():
    from tests.test_data import make_tokenizer
    from PIL import Image

    tok = make_tokenizer()
    proc = InternVLChatProcessor(tok, num_image_tokens=4, tile=56,
                                 max_num=4)
    img = Image.new("RGB", (112, 56), "blue")
    out = proc("describe <image> now", [img])
    n_tiles = out["tiles_per_image"][0]
    assert (out["input_ids"][0] == proc.image_token_index).sum() \
        == 4 * n_tiles
    # cross-attn mode: one IMG_CONTEXT per tile, hoisted to prefix
    proc_x = InternVLChatProcessor(tok, num_image_tokens=4, tile=56,
                                   max_num=4,
                                   enable_cross_attention=True)
    out_x = proc_x("describe <image> now", [img])
    assert (out_x["input_ids"][0] == proc_x.image_token_index).sum() \
        == n_tiles
