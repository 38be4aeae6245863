"""MLlavaNext: anyres geometry vs HF helpers + model behavior."""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from mantis_tpu.models.configs import LlamaConfig, VisionConfig
from mantis_tpu.models.mllava_next import (
    LlavaNextConfig,
    anyres_assembly_indices,
    forward,
    init_params,
    select_best_resolution,
)
from mantis_tpu.models.mllava_next.processor import MLlavaNextProcessor
from mantis_tpu.models.mllava.processor import (
    ImageProcessorConfig, MantisImageProcessor)


def test_select_best_resolution_matches_hf():
    from transformers.models.llava_next.modeling_llava_next import (
        image_size_to_num_patches)

    pinpoints = [[336, 672], [672, 336], [672, 672], [1008, 336],
                 [336, 1008]]
    for size in [(500, 900), (900, 500), (336, 336), (1200, 1200),
                 (100, 800)]:
        best = select_best_resolution(size, pinpoints)
        n_tiles = (best[0] // 336) * (best[1] // 336) + 1
        hf_n = image_size_to_num_patches(size, pinpoints, 336)
        assert n_tiles == hf_n, (size, best, n_tiles, hf_n)


def tiny_cfg():
    return LlavaNextConfig(
        vision_config=VisionConfig(
            tower_type="clip", hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=2, image_size=28,
            patch_size=14),
        text_config=LlamaConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2),
        image_token_index=127,
        image_grid_pinpoints=((28, 56), (56, 28), (56, 56)),
    )


def test_forward_base_plus_newline():
    cfg = tiny_cfg()
    params = init_params(cfg, jax.random.PRNGKey(0))
    P = cfg.num_image_tokens          # 4 (cls dropped)
    tpi = cfg.tokens_per_image        # 5
    assert tpi == P + 1
    # one image with 3 tiles (base + 2): only tile 0 used
    ids = np.array([[5, 6] + [127] * tpi + [7]])
    pix = np.random.RandomState(0).randn(3, 3, 28, 28).astype(np.float32)
    logits, _, _ = forward(
        params, cfg, input_ids=jnp.asarray(ids),
        pixel_values=jnp.asarray(pix),
        first_tile_idx=jnp.asarray([0]), attn_impl="xla")
    assert logits.shape == (1, ids.shape[1], 128)
    # the newline slot must differ from patch slots: check sensitivity —
    # changing image_newline changes logits
    params2 = dict(params)
    params2["image_newline"] = params["image_newline"] + 1.0
    logits2, _, _ = forward(
        params2, cfg, input_ids=jnp.asarray(ids),
        pixel_values=jnp.asarray(pix),
        first_tile_idx=jnp.asarray([0]), attn_impl="xla")
    assert float(jnp.max(jnp.abs(logits - logits2))) > 0


def test_anyres_assembly_indices_structure():
    # 28px tiles, 14px patches -> t=2 tokens per side, P=4 per tile
    idx = anyres_assembly_indices(
        (56, 56), ((28, 56), (56, 28), (56, 56)), 28, 14, tile_offset=0)
    # base tile = 4 tokens; grid 2x2 tiles -> 4x4 token grid unpadded
    # (square image, no unpad) -> 4 rows x (4 + newline)
    assert len(idx) == 4 + 4 * 5
    assert idx[:4] == [0, 1, 2, 3]
    # newline sentinel closes each row
    assert idx[4 + 4] == -1 and idx[-1] == -1


def test_processor_tiling_and_expansion():
    from tests.test_data import make_tokenizer

    tok = make_tokenizer()
    ip = MantisImageProcessor(ImageProcessorConfig.for_tower("clip", 28))
    proc = MLlavaNextProcessor(tok, ip, num_base_tokens=4,
                               grid_pinpoints=((28, 56), (56, 28),
                                               (56, 56)))
    img = Image.new("RGB", (100, 50), "blue")
    out = proc("a <image> b", [img], add_image_ids=False)
    img_id = tok.convert_tokens_to_ids("<image>")
    assert (out["input_ids"][0] == img_id).sum() == 5  # P+1
    # tiles: base + best-resolution grid
    assert out["pixel_values"].shape[0] >= 2
    assert out["pixel_values"].shape[1:] == (3, 28, 28)
    assert out["first_tile_idx"].tolist() == [0]
    assert out["image_sizes"].tolist() == [[50, 100]]
