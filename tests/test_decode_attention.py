"""Parity for the fused Pallas decode-attention kernel
(ops/decode_attention.py) vs the XLA reference path
(models/llama.py ``_decode_attention``).

The bf16/f32-cache path must match the XLA einsum numerically; the
int8-cache path is W8A8 (q and probs row-quantized in-kernel), pinned
here at cos >= 0.9999 / row-relative <= 6% on uniform-random
attention — two orders of magnitude below the int8 KV cache's own
accepted quantization noise (tests/test_int8_kv_cache.py cos > 0.995).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mantis_tpu.models.llama import _decode_attention
from mantis_tpu.ops.decode_attention import (_pick_block_m,
                                             decode_attention, supports)

B, M, HQ, HK, DH = 3, 256, 8, 2, 64
SCALE = DH ** -0.5


def _inputs(dtype=jnp.float32):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, 1, HQ, DH), dtype)
    lengths = jnp.asarray([200, 37, 1], jnp.int32)
    kv_seg = (jnp.arange(M)[None, :] < lengths[:, None]).astype(
        jnp.int32)
    q_seg = jnp.ones((B, 1), jnp.int32)
    return rng, q, lengths, kv_seg, q_seg


def test_dense_cache_matches_xla():
    rng, q, lengths, kv_seg, q_seg = _inputs()
    k = jnp.asarray(rng.randn(B, M, HK, DH), jnp.float32)
    v = jnp.asarray(rng.randn(B, M, HK, DH), jnp.float32)
    ref = _decode_attention(q, k, v, kv_seg, q_seg, lengths, SCALE)
    got = decode_attention(q[:, 0], k, v, kv_seg, q_seg[:, 0],
                           lengths, scale=SCALE, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref[:, 0]),
                               atol=2e-5, rtol=2e-5)


def test_int8_cache_w8a8_close_to_xla():
    rng, q, lengths, kv_seg, q_seg = _inputs()
    k = jnp.asarray(rng.randint(-127, 128, (B, M, HK, DH)), jnp.int8)
    v = jnp.asarray(rng.randint(-127, 128, (B, M, HK, DH)), jnp.int8)
    ks = jnp.asarray(rng.rand(B, HK, M) * 0.02 + 1e-3, jnp.float32)
    vs = jnp.asarray(rng.rand(B, HK, M) * 0.02 + 1e-3, jnp.float32)
    ref = np.asarray(_decode_attention(
        q, k, v, kv_seg, q_seg, lengths, SCALE, k_scale=ks,
        v_scale=vs)[:, 0])
    got = np.asarray(decode_attention(
        q[:, 0], k, v, kv_seg, q_seg[:, 0], lengths, ks, vs,
        scale=SCALE, interpret=True))
    cos = (ref * got).sum() / (
        np.linalg.norm(ref) * np.linalg.norm(got))
    assert cos > 0.9999, cos
    for i in range(B):
        rel = np.abs(ref[i] - got[i]).max() / (
            np.abs(ref[i]).max() + 1e-9)
        assert rel < 0.06, (i, rel)


def test_segment_mask_respected():
    """Positions with a foreign segment id must not contribute even
    inside the valid length prefix."""
    rng, q, lengths, kv_seg, q_seg = _inputs()
    k = jnp.asarray(rng.randn(B, M, HK, DH), jnp.float32)
    v = jnp.asarray(rng.randn(B, M, HK, DH), jnp.float32)
    # poison a stripe of positions with segment id 7
    seg2 = kv_seg.at[:, 10:20].set(7)
    big = k.at[:, 10:20].set(100.0)
    ref = _decode_attention(q, big, v, seg2, q_seg, lengths, SCALE)
    got = decode_attention(q[:, 0], big, v, seg2, q_seg[:, 0],
                           lengths, scale=SCALE, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref[:, 0]),
                               atol=2e-5, rtol=2e-5)
    # and the stripe really was excluded: zeroing it changes nothing
    got2 = decode_attention(q[:, 0], k, v, seg2, q_seg[:, 0],
                            lengths, scale=SCALE, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(got2),
                               atol=2e-5, rtol=2e-5)


def test_gqa_groups_use_their_own_kv_head():
    """With k/v differing per head, each q group must attend its own
    kv head (catches flat-layout slicing bugs)."""
    rng, q, lengths, kv_seg, q_seg = _inputs()
    k = np.zeros((B, M, HK, DH), np.float32)
    v = np.zeros((B, M, HK, DH), np.float32)
    for h in range(HK):
        k[:, :, h, :] = rng.randn(B, M, DH)
        v[:, :, h, :] = float(h + 1)
    ref = _decode_attention(q, jnp.asarray(k), jnp.asarray(v), kv_seg,
                            q_seg, lengths, SCALE)
    got = decode_attention(q[:, 0], jnp.asarray(k), jnp.asarray(v),
                           kv_seg, q_seg[:, 0], lengths, scale=SCALE,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref[:, 0]),
                               atol=2e-5, rtol=2e-5)
    # group g rows equal their kv head's constant v
    out = np.asarray(got).reshape(B, HK, HQ // HK, DH)
    for h in range(HK):
        np.testing.assert_allclose(out[:, h], float(h + 1),
                                   atol=2e-4)


def test_block_picker_and_supports():
    assert _pick_block_m(2048) == 1024
    assert _pick_block_m(6144) == 1024
    assert _pick_block_m(256) == 256
    assert _pick_block_m(6048) is None
    assert supports(2048) and not supports(6050)


def test_length_zero_row_is_finite():
    """A dead slot (length 0) must produce zeros, not NaN."""
    rng, q, _, _, q_seg = _inputs()
    k = jnp.asarray(rng.randn(B, M, HK, DH), jnp.float32)
    v = jnp.asarray(rng.randn(B, M, HK, DH), jnp.float32)
    lengths = jnp.asarray([128, 0, 5], jnp.int32)
    kv_seg = (jnp.arange(M)[None, :] < lengths[:, None]).astype(
        jnp.int32)
    got = np.asarray(decode_attention(
        q[:, 0], k, v, kv_seg, q_seg[:, 0], lengths, scale=SCALE,
        interpret=True))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got[1], 0.0, atol=1e-6)


def test_llama_forward_dispatch_equivalence():
    """The llama decode path must produce the same logits whether the
    cache depth routes it to the fused kernel (%128) or the XLA einsum
    (off-%128) — f32 CPU, single token, same written content."""
    from mantis_tpu.models import llama
    from mantis_tpu.models.configs import LlamaConfig
    from mantis_tpu.models.llama import KVCache

    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, rope_theta=10000.0)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, 128, size=(1, 17)))

    def run(depth):
        cache = KVCache.create(cfg, 1, depth, dtype=jnp.float32)
        logits, cache = llama.forward(
            params, cfg, input_ids=ids, kv_cache=cache)
        tok = jnp.argmax(logits[:, -1], -1)[:, None]
        step, cache = llama.forward(
            params, cfg, input_ids=tok, kv_cache=cache)
        return np.asarray(step[:, -1])

    kernel_logits = run(128)    # %128 -> fused kernel (interpret)
    xla_logits = run(100)       # off-%128 -> XLA einsum path
    np.testing.assert_allclose(kernel_logits, xla_logits,
                               atol=2e-5, rtol=2e-5)


def test_llama_forward_dispatch_equivalence_int8():
    """Same dispatch check with an int8 cache: the kernel's W8A8 path
    must stay within serving tolerance of the XLA int8 path."""
    from mantis_tpu.models import llama
    from mantis_tpu.models.configs import LlamaConfig
    from mantis_tpu.models.llama import KVCache

    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, rope_theta=10000.0)
    params = llama.init_params(cfg, jax.random.PRNGKey(1))
    rng = np.random.RandomState(1)
    ids = jnp.asarray(rng.randint(0, 128, size=(1, 33)))

    def run(depth):
        cache = KVCache.create(cfg, 1, depth, dtype=jnp.int8)
        logits, cache = llama.forward(
            params, cfg, input_ids=ids, kv_cache=cache)
        tok = jnp.argmax(logits[:, -1], -1)[:, None]
        step, cache = llama.forward(
            params, cfg, input_ids=tok, kv_cache=cache)
        return np.asarray(step[:, -1], np.float32)

    a, b = run(128), run(100)
    cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.999, cos
