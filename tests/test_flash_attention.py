"""Flash-attention kernel parity vs the O(S^2) reference, fwd + bwd.

Runs in Pallas interpreter mode on CPU (auto-selected off-TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mantis_tpu.ops.flash_attention import flash_attention, mha_reference


def _rand_qkv(key, b, sq, sk, hq, hk, d, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, sq, hq, d), dtype)
    k = jax.random.normal(kk, (b, sk, hk, d), dtype)
    v = jax.random.normal(kv, (b, sk, hk, d), dtype)
    return q, k, v


@pytest.mark.parametrize("causal", [True, False])
def test_fwd_matches_reference(causal):
    q, k, v = _rand_qkv(jax.random.PRNGKey(0), 2, 256, 256, 4, 4, 64)
    out = flash_attention(q, k, v, causal=causal)
    ref = mha_reference(q, k, v, causal=causal)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_fwd_gqa():
    q, k, v = _rand_qkv(jax.random.PRNGKey(1), 1, 256, 256, 8, 2, 64)
    out = flash_attention(q, k, v, causal=True)
    ref = mha_reference(q, k, v, causal=True)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_fwd_segment_ids():
    b, s = 2, 384
    q, k, v = _rand_qkv(jax.random.PRNGKey(2), b, s, s, 4, 4, 64)
    # Three packed segments of 128 tokens each.
    seg = jnp.repeat(jnp.array([[1, 2, 3]] * b, jnp.int32), 128, axis=1)
    out = flash_attention(q, k, v, causal=True, segment_ids=seg)
    ref = mha_reference(q, k, v, causal=True, segment_ids=seg)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)
    # Each segment must equal attention run on that segment alone.
    solo = mha_reference(q[:, 128:256], k[:, 128:256], v[:, 128:256],
                         causal=True)
    np.testing.assert_allclose(out[:, 128:256], solo, atol=2e-5, rtol=2e-5)


def test_fwd_unaligned_seq_len():
    q, k, v = _rand_qkv(jax.random.PRNGKey(3), 1, 200, 200, 2, 2, 64)
    out = flash_attention(q, k, v, causal=True)
    ref = mha_reference(q, k, v, causal=True)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_cross_attention_no_causal():
    q, k, v = _rand_qkv(jax.random.PRNGKey(4), 1, 128, 384, 4, 4, 64)
    out = flash_attention(q, k, v, causal=False)
    ref = mha_reference(q, k, v, causal=False)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("causal", [True, False])
def test_bwd_matches_reference(causal):
    q, k, v = _rand_qkv(jax.random.PRNGKey(5), 1, 256, 256, 2, 2, 64)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=causal) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, causal=causal) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(a, b, atol=2e-4, rtol=2e-4,
                                   err_msg=f"d{name}")


def test_bwd_gqa_and_segments():
    b, s = 1, 256
    q, k, v = _rand_qkv(jax.random.PRNGKey(6), b, s, s, 4, 2, 64)
    seg = jnp.repeat(jnp.array([[1, 2]] * b, jnp.int32), 128, axis=1)

    def loss_flash(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, causal=True, segment_ids=seg) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(
            mha_reference(q, k, v, causal=True, segment_ids=seg) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(a, b_, atol=2e-4, rtol=2e-4,
                                   err_msg=f"d{name}")


def test_bf16_runs():
    q, k, v = _rand_qkv(jax.random.PRNGKey(7), 1, 128, 128, 2, 2, 64,
                        jnp.bfloat16)
    out = flash_attention(q, k, v, causal=True)
    ref = mha_reference(q, k, v, causal=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        out.astype(np.float32), ref.astype(np.float32), atol=2e-2, rtol=2e-2)


def test_sliding_window_matches_reference():
    """Window < seq: kernel vs O(S^2) reference, fwd and grads
    (Mistral SWA semantics: query i sees keys [i-w+1, i])."""
    rng = np.random.RandomState(7)
    b, s, h, d, w = 2, 512, 4, 64, 128
    q = jnp.asarray(rng.randn(b, s, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, s, h, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, s, h, d), jnp.float32)

    def f_kernel(q, k, v):
        return flash_attention(q, k, v, causal=True, window_size=w,
                               block_q=128, block_k=128).sum()

    def f_ref(q, k, v):
        return mha_reference(q, k, v, causal=True, window_size=w).sum()

    out_k = flash_attention(q, k, v, causal=True, window_size=w,
                            block_q=128, block_k=128)
    out_r = mha_reference(q, k, v, causal=True, window_size=w)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               atol=2e-5, rtol=2e-5)
    # windowed must differ from full causal (sanity that the mask bites)
    out_full = mha_reference(q, k, v, causal=True)
    assert float(jnp.abs(out_full - out_r).max()) > 1e-3

    gk = jax.grad(f_kernel, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, r in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=5e-4, rtol=5e-4)


def test_sliding_window_composes_with_segments():
    rng = np.random.RandomState(8)
    b, s, h, d, w = 1, 256, 2, 32, 64
    q = jnp.asarray(rng.randn(b, s, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, s, h, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, s, h, d), jnp.float32)
    seg = np.ones((b, s), np.int32)
    seg[:, 100:] = 2  # two packed segments
    seg = jnp.asarray(seg)

    out_k = flash_attention(q, k, v, causal=True, window_size=w,
                            segment_ids=seg, block_q=128, block_k=128)
    out_r = mha_reference(q, k, v, causal=True, window_size=w,
                          segment_ids=seg)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               atol=2e-5, rtol=2e-5)


def test_causal_offset_suffix_queries():
    """q is the text suffix of an image-prefixed kv sequence
    (shared-cross-attn, reference modeling_internlm2.py:1828-1864):
    query i attends keys <= i + M."""
    rng = np.random.RandomState(11)
    b, h, d, M, St = 1, 2, 32, 192, 128
    S = M + St
    q_full = jnp.asarray(rng.randn(b, S, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, S, h, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, S, h, d), jnp.float32)
    q = q_full[:, M:]

    out = flash_attention(q, k, v, causal=True, causal_offset=M,
                          block_q=128, block_k=128)
    ref = mha_reference(q, k, v, causal=True, causal_offset=M)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    # equivalence: rows M.. of a full causal attention over q_full
    full = mha_reference(q_full, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(full[:, M:]),
                               atol=2e-5, rtol=2e-5)

    # grads flow too
    def f(q, k, v):
        return flash_attention(q, k, v, causal=True, causal_offset=M,
                               block_q=128, block_k=128).sum()

    def fr(q, k, v):
        return mha_reference(q, k, v, causal=True,
                             causal_offset=M).sum()
    gk = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(fr, argnums=(0, 1, 2))(q, k, v)
    for a, r in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=5e-4, rtol=5e-4)


def test_xla_fallback_honors_offset_and_kv_valid_len():
    """implementation='xla' must apply EVERY mask the Pallas path
    applies (it silently dropped causal_offset and kv_valid_len)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from mantis_tpu.ops.flash_attention import flash_attention

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(2, 128, 4, 64), jnp.float32)
    k = jnp.asarray(rng.randn(2, 256, 4, 64), jnp.float32)
    v = jnp.asarray(rng.randn(2, 256, 4, 64), jnp.float32)

    pallas = flash_attention(q, k, v, causal=True, causal_offset=128,
                             interpret=True)
    xla = flash_attention(q, k, v, causal=True, causal_offset=128,
                          implementation="xla")
    np.testing.assert_allclose(np.asarray(xla), np.asarray(pallas),
                               atol=2e-5, rtol=2e-5)

    pallas2 = flash_attention(q, k, v[:, :256], causal=False,
                              kv_valid_len=200, interpret=True)
    xla2 = flash_attention(q, k, v, causal=False, kv_valid_len=200,
                           implementation="xla")
    np.testing.assert_allclose(np.asarray(xla2), np.asarray(pallas2),
                               atol=2e-5, rtol=2e-5)

    # xla_fast rejects masked configurations loudly
    import pytest as _pytest
    with _pytest.raises(AssertionError):
        flash_attention(q, k, v, causal=True, implementation="xla_fast")


def test_sliding_window_decode_ignores_padding_slots():
    """Bucketed batched prefill right-pads short rows; the decode SWA
    window must count VALID positions, not cache-slot distance —
    otherwise a short row's real prompt falls out of the window."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from mantis_tpu.models import llama
    from mantis_tpu.models.configs import LlamaConfig
    from mantis_tpu.models.llama import KVCache

    cfg = LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, rope_theta=10000.0, sliding_window=16)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    long_p = rng.randint(2, 60, size=40).tolist()
    short_p = rng.randint(2, 60, size=8).tolist()

    def decode_n(cache, tok, n, pos0):
        toks = []
        for i in range(n):
            logits, cache = llama.forward(
                params, cfg, input_ids=jnp.asarray([[tok]]),
                positions=jnp.asarray([[pos0 + i]]),
                segment_ids=jnp.ones((1, 1), jnp.int32), kv_cache=cache)
            tok = int(jnp.argmax(logits[0, -1]))
            toks.append(tok)
        return toks

    # reference: short row alone, no padding
    c1 = KVCache.create(cfg, 1, 64)
    logits, c1 = llama.forward(
        params, cfg, input_ids=jnp.asarray([short_p]),
        positions=jnp.arange(8)[None, :],
        segment_ids=jnp.ones((1, 8), jnp.int32), kv_cache=c1)
    t0 = int(jnp.argmax(logits[0, -1]))
    ref = [t0] + decode_n(c1, t0, 3, 8)

    # batched: short row padded to the long row's length (seg=0 pads)
    ids = np.full((2, 40), 0, np.int64)
    ids[0] = long_p
    ids[1, :8] = short_p
    seg = np.zeros((2, 40), np.int32)
    seg[0] = 1
    seg[1, :8] = 1
    pos = np.arange(40)[None, :] * seg
    cb = KVCache.create(cfg, 2, 64)
    logits, cb = llama.forward(
        params, cfg, input_ids=jnp.asarray(ids),
        positions=jnp.asarray(pos), segment_ids=jnp.asarray(seg),
        kv_cache=cb)
    t0b = int(jnp.argmax(logits[1, 7]))
    assert t0b == ref[0]
    got = [t0b]
    tok = jnp.asarray([int(jnp.argmax(logits[0, -1])), t0b], jnp.int32)
    for i in range(3):
        # batched decode: q slot = 40+i (past the pads), RoPE position
        # continues per row's true length
        logits, cb = llama.forward(
            params, cfg, input_ids=tok[:, None],
            positions=jnp.asarray([[40 + i], [8 + i]]),
            segment_ids=jnp.ones((2, 1), jnp.int32), kv_cache=cb)
        tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        got.append(int(tok[1]))
    assert got == ref, (got, ref)
