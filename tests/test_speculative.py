"""Speculative decoding (generation/speculative.py): prompt-lookup
drafts + one-pass verification must emit EXACTLY the plain greedy
token sequence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mantis_tpu.generation.sampler import GenerationConfig, generate
from mantis_tpu.generation.speculative import (
    prompt_lookup_draft,
    prompt_lookup_draft_jax,
    speculative_generate,
    speculative_generate_fused,
)
from mantis_tpu.models.configs import LlamaConfig, LlavaConfig, VisionConfig
from mantis_tpu.models.mllava import model as mllava_model


def tiny_cfg():
    return LlavaConfig(
        vision_config=VisionConfig(
            tower_type="clip", hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=2, image_size=28,
            patch_size=14),
        text_config=LlamaConfig(
            vocab_size=96, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, rope_theta=10000.0),
        image_token_index=95,
    )


def test_prompt_lookup_draft():
    toks = [5, 6, 7, 8, 9, 1, 2, 5, 6, 7]
    # trailing (5, 6, 7) matched at position 0 -> continuation 8, 9, 1
    assert prompt_lookup_draft(toks, 3, ngram=3) == [8, 9, 1]
    assert prompt_lookup_draft(toks, 5, ngram=3) == [8, 9, 1, 2, 5]
    assert prompt_lookup_draft([1, 2, 3], 3, ngram=3) == []
    assert prompt_lookup_draft([4, 4, 4, 4], 2, ngram=2) == [4, 4]


def test_prompt_lookup_draft_jax_matches_host():
    """The in-graph n-gram match reproduces the host implementation
    (first occurrence wins, continuation truncated at the live length)
    on random token streams of every length."""
    rng = np.random.RandomState(7)
    for trial in range(40):
        n = rng.randint(1, 40)
        vocab = rng.choice([3, 8, 50])  # small vocab => frequent matches
        toks = rng.randint(0, vocab, size=n).tolist()
        for ngram, k in ((2, 3), (3, 5)):
            want = prompt_lookup_draft(toks, k, ngram=ngram)
            buf = np.zeros(64, np.int32)
            buf[:n] = toks
            # junk beyond the live length must not influence the match
            buf[n:] = rng.randint(0, vocab, size=64 - n)
            drafts, dlen = prompt_lookup_draft_jax(
                jnp.asarray(buf), jnp.asarray(n, jnp.int32),
                n_draft=k, ngram=ngram)
            got = [int(t) for t in np.asarray(drafts)[: int(dlen)]]
            assert got == want, (trial, toks, ngram, k, got, want)


@pytest.mark.parametrize("repetitive", [True, False])
@pytest.mark.parametrize("fused", [True, False])
def test_speculative_matches_plain_greedy(repetitive, fused):
    cfg = tiny_cfg()
    params = mllava_model.init_params(cfg, jax.random.PRNGKey(3))
    rng = np.random.RandomState(0)
    if repetitive:
        block = rng.randint(2, 90, size=8).tolist()
        ids = np.array([[1] + block * 4 + block[:3]])
    else:
        ids = np.array([rng.randint(2, 90, size=24).tolist()])
    P = cfg.num_image_tokens
    ids = np.concatenate(
        [ids, np.full((1, P), 95), rng.randint(2, 90, (1, 3))], axis=1)
    pix = rng.randn(1, 3, 28, 28).astype(np.float32)
    gen_cfg = GenerationConfig(max_new_tokens=12, do_sample=False,
                               eos_token_ids=(2,), pad_token_id=0)

    ref = generate(params, cfg, mllava_model.forward, ids, pix,
                   gen_cfg=gen_cfg, cache_dtype=jnp.float32)[0]
    ref = [int(t) for t in ref]
    stop = next((i for i, t in enumerate(ref) if t == 2), len(ref))
    ref = ref[:stop + 1] if stop < len(ref) else ref

    spec_fn = speculative_generate_fused if fused else speculative_generate
    out, stats = spec_fn(
        params, cfg, mllava_model.forward, ids, pix, gen_cfg=gen_cfg,
        cache_dtype=jnp.float32, n_draft=4, ngram=3)
    assert out[:len(ref)] == ref, (out, ref)
    assert stats["verify_calls"] >= 1
    assert stats["accepted"] <= stats["drafted"]
    # every verify emits at least one token: the call count is bounded
    assert stats["verify_calls"] <= len(out)


def test_fused_and_host_speculative_agree_exactly():
    """Fused and host-stepped speculative emit identical tokens AND
    identical accept statistics (same draft source, same accept rule)."""
    cfg = tiny_cfg()
    params = mllava_model.init_params(cfg, jax.random.PRNGKey(3))
    rng = np.random.RandomState(2)
    block = rng.randint(2, 90, size=6).tolist()
    ids = np.array([[1] + block * 5 + block[:3]])
    gen_cfg = GenerationConfig(max_new_tokens=16, do_sample=False,
                               eos_token_ids=(2,), pad_token_id=0)
    host = speculative_generate(
        params, cfg, mllava_model.forward, ids, gen_cfg=gen_cfg,
        cache_dtype=jnp.float32, n_draft=3, ngram=2)
    fused = speculative_generate_fused(
        params, cfg, mllava_model.forward, ids, gen_cfg=gen_cfg,
        cache_dtype=jnp.float32, n_draft=3, ngram=2)
    assert fused[0] == host[0]
    assert fused[1] == host[1], (fused[1], host[1])


def test_fused_oracle_draft_exact():
    """Oracle drafts through the fused loop: output still exactly the
    greedy sequence, with near-total acceptance."""
    cfg = tiny_cfg()
    params = mllava_model.init_params(cfg, jax.random.PRNGKey(3))
    rng = np.random.RandomState(1)
    ids = np.array([rng.randint(2, 90, size=24).tolist()])
    gen_cfg = GenerationConfig(max_new_tokens=12, do_sample=False,
                               eos_token_ids=(), pad_token_id=0)
    ref, _ = speculative_generate(
        params, cfg, mllava_model.forward, ids, gen_cfg=gen_cfg,
        cache_dtype=jnp.float32, n_draft=4)
    out, stats = speculative_generate_fused(
        params, cfg, mllava_model.forward, ids, gen_cfg=gen_cfg,
        cache_dtype=jnp.float32, n_draft=4, oracle=ref)
    assert out == ref
    # oracle drafting: every verify call accepts its full window except
    # possibly the tail one
    assert stats["accepted"] >= stats["drafted"] - 4
    assert stats["verify_calls"] <= -(-len(ref) // 1)  # sanity bound
    assert stats["verify_calls"] <= (len(ref) + 4) // 5 + 1


def test_injected_draft_fn_output_exact_and_capped():
    """A custom draft_fn (oracle/adversarial) never changes the greedy
    output; over-long drafts are capped at n_draft."""
    cfg = tiny_cfg()
    params = mllava_model.init_params(cfg, jax.random.PRNGKey(3))
    rng = np.random.RandomState(1)
    P = cfg.num_image_tokens
    ids = np.concatenate(
        [rng.randint(2, 90, (1, 9)), np.full((1, P), 95),
         rng.randint(2, 90, (1, 3))], axis=1)
    pix = rng.randn(1, 3, 28, 28).astype(np.float32)
    gen_cfg = GenerationConfig(max_new_tokens=10, do_sample=False,
                               eos_token_ids=(), pad_token_id=0)

    ref, _ = speculative_generate(
        params, cfg, mllava_model.forward, ids, pix, gen_cfg=gen_cfg,
        cache_dtype=jnp.float32, n_draft=4)

    def oracle(history):
        done = len(history) - ids.shape[1]
        return ref[done:done + 99]  # over-long on purpose

    out, stats = speculative_generate(
        params, cfg, mllava_model.forward, ids, pix, gen_cfg=gen_cfg,
        cache_dtype=jnp.float32, n_draft=4, draft_fn=oracle)
    assert out == ref
    # oracle: accept-all, except the final call's tail past max_new
    assert stats["accepted"] >= stats["drafted"] - 4
    assert max(stats["drafted"] // stats["verify_calls"], 1) <= 4

    def adversarial(history):
        return [89, 88, 87, 86]

    out2, _ = speculative_generate(
        params, cfg, mllava_model.forward, ids, pix, gen_cfg=gen_cfg,
        cache_dtype=jnp.float32, n_draft=4, draft_fn=adversarial)
    assert out2 == ref


def test_mantis_llava_speculative_chat_matches_plain():
    """model.speculative drives chat through speculative_generate with
    identical greedy replies (the user-facing wiring)."""
    from tests.test_chat_session import tiny_model

    model = tiny_model()
    from PIL import Image

    img = Image.fromarray(
        np.random.RandomState(1).randint(0, 255, (28, 28, 3), np.uint8))
    reply_plain, _ = model.chat("what is in this <image> ?", [img],
                                max_new_tokens=8)
    model.speculative = 3
    reply_spec, _ = model.chat("what is in this <image> ?", [img],
                               max_new_tokens=8)
    assert reply_spec == reply_plain


def test_session_with_speculative_matches_plain_session():
    """The serving levers compose: ChatSession + speculative decode
    emits the same replies as the plain session, keeping the
    cache.length == len(tokens) invariant."""
    from PIL import Image

    from mantis_tpu.generation.session import ChatSession
    from tests.test_chat_session import tiny_model

    img = Image.fromarray(
        np.random.RandomState(1).randint(0, 255, (28, 28, 3), np.uint8))
    turns = [("what is in this <image> ?", [img]),
             ("tell me more about it", None)]

    replies = {}
    for spec in (0, 3):
        model = tiny_model()
        model.speculative = spec
        session = ChatSession(model, max_ctx=512, max_new_tokens=6,
                              delta_bucket=32)
        rs = []
        for t, im in turns:
            rs.append(session.send(t, images=im))
            assert int(session.cache.length) == len(session.tokens)
        replies[spec] = rs
    assert replies[3] == replies[0], replies
