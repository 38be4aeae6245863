"""MFuyu/Persimmon parity vs tiny HF models."""

import numpy as np
import torch
import transformers

import jax
import jax.numpy as jnp

from mantis_tpu.io.hf_loader import (
    TensorSource,
    mfuyu_params_from_hf,
    persimmon_params_from_hf,
)
from mantis_tpu.models import persimmon
from mantis_tpu.models.mfuyu import (
    MFuyuConfig,
    forward,
    image_token_ids,
    patchify,
)
from mantis_tpu.models.persimmon import PersimmonConfig


def tiny_persimmon_cfg():
    return transformers.PersimmonConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        partial_rotary_factor=0.5, qk_layernorm=True,
        attn_implementation="eager")


def test_persimmon_logit_parity():
    torch.manual_seed(41)
    hf_cfg = tiny_persimmon_cfg()
    hf = transformers.PersimmonForCausalLM(hf_cfg).eval()
    cfg = PersimmonConfig.from_hf_config(hf_cfg)
    params = persimmon_params_from_hf(
        TensorSource.from_state_dict(hf.state_dict()), cfg)
    ids = np.random.RandomState(0).randint(0, 128, size=(2, 13))
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids)).logits.numpy()
    ours, _ = persimmon.forward(params, cfg, input_ids=jnp.asarray(ids),
                                attn_impl="xla")
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-4,
                               rtol=5e-3)


def test_fuyu_logit_parity_with_patches():
    torch.manual_seed(42)
    text_cfg = tiny_persimmon_cfg()
    # FuyuConfig keeps the text params at its top level
    hf_cfg = transformers.FuyuConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        partial_rotary_factor=0.5, qk_layernorm=True,
        patch_size=4, num_channels=3, image_token_id=120,
        attn_implementation="eager")
    hf = transformers.FuyuForCausalLM(hf_cfg).eval()
    cfg = MFuyuConfig(
        text_config=PersimmonConfig.from_hf_config(hf_cfg.text_config),
        patch_size=4, image_placeholder_id=120, image_newline_id=121)
    params = mfuyu_params_from_hf(
        TensorSource.from_state_dict(hf.state_dict()), cfg)

    n_patches = 4
    rng = np.random.RandomState(42)
    patches = rng.randn(n_patches, 3 * 4 * 4).astype(np.float32)
    ids = np.array([[5, 6] + [120] * n_patches + [7, 8]])
    idx = np.full_like(ids, -1)
    idx[0, 2:2 + n_patches] = np.arange(n_patches)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 image_patches=torch.tensor(patches)[None],
                 image_patches_indices=torch.tensor(idx)).logits.numpy()
    ours, _, _ = forward(params, cfg, input_ids=jnp.asarray(ids),
                         image_patches=jnp.asarray(patches),
                         attn_impl="xla")
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-4,
                               rtol=5e-3)


def test_persimmon_kv_cache_decode():
    torch.manual_seed(43)
    hf_cfg = tiny_persimmon_cfg()
    hf = transformers.PersimmonForCausalLM(hf_cfg).eval()
    cfg = PersimmonConfig.from_hf_config(hf_cfg)
    params = persimmon_params_from_hf(
        TensorSource.from_state_dict(hf.state_dict()), cfg)
    ids = np.random.RandomState(1).randint(0, 128, size=(1, 10))
    full, _ = persimmon.forward(params, cfg, input_ids=jnp.asarray(ids),
                                attn_impl="xla")
    from mantis_tpu.models.llama import KVCache

    cache = KVCache.create(cfg, 1, 16, dtype=jnp.float32)
    pre, cache = persimmon.forward(
        params, cfg, input_ids=jnp.asarray(ids[:, :8]),
        positions=jnp.arange(8)[None], kv_cache=cache, attn_impl="xla")
    np.testing.assert_allclose(np.asarray(pre), np.asarray(full[:, :8]),
                               atol=1e-4, rtol=1e-3)
    step, cache = persimmon.forward(
        params, cfg, input_ids=jnp.asarray(ids[:, 8:9]),
        positions=jnp.array([[8]]), kv_cache=cache, attn_impl="xla")
    np.testing.assert_allclose(np.asarray(step[:, 0]),
                               np.asarray(full[:, 8]), atol=1e-4,
                               rtol=1e-3)


def test_patchify_and_token_layout():
    from PIL import Image

    img = Image.new("RGB", (70, 40), "blue")
    patches, rows, cols = patchify(img, patch_size=30)
    assert (rows, cols) == (2, 3)
    assert patches.shape == (6, 2700)
    cfg = MFuyuConfig()
    toks = image_token_ids(rows, cols, cfg)
    assert len(toks) == rows * (cols + 1)
    assert toks[cols] == cfg.image_newline_id
