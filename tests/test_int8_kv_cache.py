"""int8 KV cache: per-(token, head)-scaled quantized k/v with scales
factored out of both attention dots (llama.KVCache.create(dtype=int8),
serving memory lever — halves KV HBM reads / doubles context
capacity).  Parity vs the f32 cache on llama, persimmon, internvl,
and through the generate loop."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mantis_tpu.models import llama
from mantis_tpu.models.configs import LlamaConfig
from mantis_tpu.models.llama import KVCache, _quantize_kv


def tiny_cfg():
    return LlamaConfig(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, rope_theta=10000.0)


def test_quantize_kv_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 2, 16),
                          jnp.float32) * 3.0
    q, s = _quantize_kv(x)
    assert q.dtype == jnp.int8 and s.shape == (2, 5, 2)
    back = q.astype(jnp.float32) * s[..., None]
    err = np.max(np.abs(np.asarray(back - x)))
    assert err <= float(np.max(np.abs(np.asarray(x)))) / 127 * 0.51


def test_decode_attention_int8_cache_parity():
    rng = jax.random.PRNGKey(1)
    kq, kk, kv_ = jax.random.split(rng, 3)
    b, m, hk, hq, dh, sq = 2, 24, 2, 4, 16, 1
    q = jax.random.normal(kq, (b, sq, hq, dh), jnp.float32)
    k = jax.random.normal(kk, (b, m, hk, dh), jnp.float32)
    v = jax.random.normal(kv_, (b, m, hk, dh), jnp.float32)
    seg = jnp.ones((b, m), jnp.int32)
    qseg = jnp.ones((b, sq), jnp.int32)
    length = jnp.asarray(m, jnp.int32)
    ref = llama._decode_attention(q, k, v, seg, qseg, length,
                                  dh ** -0.5)
    kq8, ks = _quantize_kv(k)
    vq8, vs = _quantize_kv(v)
    # scales are stored head-major [B, Hk, M] (KVCache docstring)
    out = llama._decode_attention(
        q, kq8, vq8, seg, qseg, length, dh ** -0.5,
        k_scale=ks.transpose(0, 2, 1), v_scale=vs.transpose(0, 2, 1))
    a, b_ = np.asarray(out).ravel(), np.asarray(ref).ravel()
    cos = float(np.dot(a, b_) / (np.linalg.norm(a) * np.linalg.norm(b_)))
    assert cos > 0.999
    np.testing.assert_allclose(a, b_, atol=0.05)


@pytest.mark.parametrize("model", ["llama", "persimmon", "internvl"])
def test_prefill_decode_with_int8_cache(model):
    """prefill-with-cache then one decode step: int8-cache logits track
    the f32-cache logits on every cache-writing decoder."""
    b, s_p = 1, 12
    rng = np.random.RandomState(0)
    if model == "llama":
        cfg = tiny_cfg()
        params = llama.init_params(cfg, jax.random.PRNGKey(2))
        fwd = lambda p, ids, cache: llama.forward(
            p, cfg, input_ids=ids, kv_cache=cache)
        ccfg = cfg
    elif model == "persimmon":
        from mantis_tpu.models import persimmon as P
        cfg = P.PersimmonConfig(
            vocab_size=96, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4)
        params = P.init_params(cfg, jax.random.PRNGKey(2))
        fwd = lambda p, ids, cache: P.forward(
            p, cfg, input_ids=ids, kv_cache=cache)
        ccfg = cfg
    else:
        from mantis_tpu.models.intern_vl import model as IV
        cfg = IV.InternVLConfig(
            text_config=tiny_cfg(),
            vision_config=IV.InternViTConfig(
                hidden_size=32, intermediate_size=64,
                num_hidden_layers=2, num_attention_heads=2,
                image_size=28, patch_size=14))
        params = IV.init_params(cfg, jax.random.PRNGKey(2))
        # IV.forward returns (logits, loss, cache); keep (logits, cache)
        fwd = lambda p, ids, cache: IV.forward(
            p, cfg, input_ids=ids, kv_cache=cache)[::2]
        ccfg = cfg.text_config

    ids = jnp.asarray(rng.randint(2, 90, size=(b, s_p)))
    nxt = jnp.asarray(rng.randint(2, 90, size=(b, 1)))

    outs = {}
    for dt in (jnp.float32, jnp.int8):
        cache = KVCache.create(ccfg, b, s_p + 4, dtype=dt)
        res = fwd(params, ids, cache)
        logits, cache = res[0], res[-1]
        res = fwd(params, nxt, cache)
        outs[str(dt)] = np.asarray(res[0][:, -1], np.float32)
    a = outs[str(jnp.float32)].ravel()
    c = outs[str(jnp.int8)].ravel()
    cos = float(np.dot(a, c) / (np.linalg.norm(a) * np.linalg.norm(c)))
    assert cos > 0.995, cos


def test_generate_with_int8_cache_runs_end_to_end():
    from mantis_tpu.generation.sampler import GenerationConfig, generate
    from mantis_tpu.models.configs import LlavaConfig, VisionConfig
    from mantis_tpu.models.mllava import model as mllava_model

    cfg = LlavaConfig(
        vision_config=VisionConfig(
            tower_type="clip", hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=2, image_size=28,
            patch_size=14),
        text_config=tiny_cfg(),
        image_token_index=95,
    )
    params = mllava_model.init_params(cfg, jax.random.PRNGKey(0))
    P = cfg.num_image_tokens
    ids = np.array([[1, 5, 6] + [95] * P + [7, 8, 9]])
    pix = np.random.RandomState(0).randn(1, 3, 28, 28).astype(np.float32)
    gen_cfg = GenerationConfig(max_new_tokens=6, do_sample=False,
                               pad_token_id=0)
    out = generate(params, cfg, mllava_model.forward, ids, pix,
                   gen_cfg=gen_cfg, cache_dtype=jnp.int8)
    assert out.shape == (1, 6)
    assert np.all((out >= 0) & (out < 96))
