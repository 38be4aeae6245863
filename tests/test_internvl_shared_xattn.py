"""Shared-cross-attention inference mode (reference:
modeling_internvl_chat.py:284-330, modeling_internlm2.py:1828-1864):
with one local group spanning the whole image prefix the mode is
EXACTLY standard causal attention (image rows only see the prefix under
plain causality anyway); with smaller groups the locality must bite."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from mantis_tpu.models.configs import LlamaConfig
from mantis_tpu.models.intern_vl.model import (
    InternViTConfig,
    InternVLConfig,
    forward,
    init_params,
)


def tiny_cfg(**kw):
    return InternVLConfig(
        vision_config=InternViTConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=1,
            num_attention_heads=2, image_size=28, patch_size=14),
        text_config=LlamaConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, rope_theta=10000.0),
        image_token_id=127, **kw)


def test_shared_xattn_single_group_matches_causal():
    M, St = 64, 64
    cfg = tiny_cfg(local_attention_group_size=M)
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    ids = rng.randint(2, 120, size=(1, M + St))
    base, _, _ = forward(params, cfg, input_ids=jnp.asarray(ids))
    shared, _, _ = forward(params, cfg, input_ids=jnp.asarray(ids),
                           shared_xattn_prefix=M)
    np.testing.assert_allclose(np.asarray(shared), np.asarray(base),
                               atol=2e-4, rtol=2e-4)


def test_shared_xattn_local_groups_change_prefix_only():
    M, St = 128, 64
    cfg = tiny_cfg(local_attention_group_size=32)
    params = init_params(cfg, jax.random.PRNGKey(1))
    rng = np.random.RandomState(1)
    ids = rng.randint(2, 120, size=(1, M + St))
    base, _, _ = forward(params, cfg, input_ids=jnp.asarray(ids))
    shared, _, _ = forward(params, cfg, input_ids=jnp.asarray(ids),
                           shared_xattn_prefix=M)
    # the locality restriction must change prefix-token states (they no
    # longer see earlier groups)...
    diff_prefix = float(jnp.abs(shared[:, 32:M] - base[:, 32:M]).max())
    assert diff_prefix > 1e-3
    # ...while the FIRST group (tokens < group size) is unchanged: its
    # causal window equals its local group
    np.testing.assert_allclose(
        np.asarray(shared[:, :32]), np.asarray(base[:, :32]),
        atol=2e-4, rtol=2e-4)
