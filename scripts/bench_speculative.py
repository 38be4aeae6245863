"""Speculative-decoding measurement (VERDICT round-2 item 3).

Full-depth (32-layer) flagship LM, int8 weights + int8 KV — the
single-chip serving config — measured end-to-end:

  - plain FUSED greedy loop (the shipped serving decode; one jit, no
    per-token host round trip) — the honest baseline;
  - plain HOST-STEPPED greedy loop — isolates the per-call dispatch
    cost the speculative loop must pay on this axon tunnel (~35 ms
    RTT), which a local host would not;
  - speculative k=5 prompt-lookup on (a) a repetitive prompt and (b) a
    random-token prompt (worst case), with the acceptance counters
    generation/speculative.py exposes.

Speedup model: the speculative loop emits (1 + accepted/verify_calls)
tokens per verify call, each call costing ~one decode step + one host
RTT.  On this tunnel the RTT dominates: speculative can only win when
acceptance is high; the numbers below are recorded either way
(docs/SERVING.md).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from mantis_tpu.generation.sampler import GenerationConfig
from mantis_tpu.generation.speculative import (
    speculative_generate,
    speculative_generate_fused,
)
from mantis_tpu.models import llama
from mantis_tpu.models.configs import LlamaConfig
from mantis_tpu.models.llama import KVCache
from mantis_tpu.ops.quant import QuantTensor

CFG = LlamaConfig(
    vocab_size=128256, hidden_size=4096, intermediate_size=14336,
    num_hidden_layers=32, num_attention_heads=32,
    num_key_value_heads=8, rope_theta=500000.0)
MAX_NEW = 64


def lm_forward(params, cfg, *, input_ids, pixel_values=None,
               positions=None, segment_ids=None, kv_cache=None,
               cache_attention=None, **_):
    """Text-only adapter giving llama.forward the mllava-style
    3-tuple signature the generation stack expects."""
    logits, cache = llama.forward(
        params, cfg.text_cfg if hasattr(cfg, "text_cfg") else cfg,
        input_ids=input_ids, positions=positions,
        segment_ids=segment_ids, kv_cache=kv_cache,
        cache_attention=cache_attention)
    return logits, None, cache


def build_int8_params(cfg):
    """Random int8 flagship weights built ON DEVICE (streaming 9 GB of
    host weights over the tunnel takes minutes) — same recipe as
    bench.py's decode section."""
    L, d, li = cfg.num_hidden_layers, cfg.hidden_size, \
        cfg.intermediate_size
    hq, hk, dh = 32, 8, 128
    g = 128

    @jax.jit
    def build(key):
        ks = jax.random.split(key, 16)

        def qt(k, din, dout):
            q = jax.random.randint(
                k, (L, din // g, g, dout), -127, 128, jnp.int8)
            scale = jnp.full((L, din // g, 1, dout), 1e-3, jnp.float32)
            return QuantTensor(q=q, scale=scale, bits=8)

        def qt1(k, din, dout):
            q = jax.random.randint(
                k, (din // g, g, dout), -127, 128, jnp.int8)
            scale = jnp.full((din // g, 1, dout), 1e-3, jnp.float32)
            return QuantTensor(q=q, scale=scale, bits=8)

        def bf(k, *shape):
            return jax.random.normal(k, shape, jnp.bfloat16) * 0.02

        return {
            "embed_tokens": bf(ks[0], cfg.vocab_size, d),
            "norm": jnp.ones((d,), jnp.bfloat16),
            "lm_head": qt1(ks[1], d, cfg.vocab_size),
            "layers": {
                "input_layernorm": jnp.ones((L, d), jnp.bfloat16),
                "post_attention_layernorm": jnp.ones((L, d),
                                                     jnp.bfloat16),
                "q_proj": qt(ks[2], d, hq * dh),
                "k_proj": qt(ks[3], d, hk * dh),
                "v_proj": qt(ks[4], d, hk * dh),
                "o_proj": qt(ks[5], hq * dh, d),
                "gate_proj": qt(ks[6], d, li),
                "up_proj": qt(ks[7], d, li),
                "down_proj": qt(ks[8], li, d),
            },
        }

    return jax.block_until_ready(build(jax.random.PRNGKey(0)))


def make_prompts(s=1024):
    rng = np.random.RandomState(0)
    random_prompt = rng.randint(2, 128000, size=(1, s))
    piece = rng.randint(2, 128000, size=s // 8)
    repetitive = np.tile(piece, 9)[:s][None, :]
    return {"random": random_prompt, "repetitive": repetitive}


def bench_plain_fused(params, ids):
    """The shipped fused greedy loop (one jit; bench.py recipe)."""
    s = ids.shape[1]

    @jax.jit
    def prefill(params, ids):
        b = 1
        seg = jnp.ones((b, s), jnp.int32)
        pos = jnp.broadcast_to(jnp.arange(s), (b, s))
        cache = KVCache.create(CFG, b, s + MAX_NEW, dtype=jnp.int8)
        logits, cache = llama.forward(
            params, CFG, input_ids=ids, positions=pos,
            segment_ids=seg, kv_cache=cache)
        return jnp.argmax(logits[:, -1], -1).astype(jnp.int32), cache

    @jax.jit
    def loop(params, tok, cache):
        def body(i, state):
            tok, cache, acc = state
            logits, cache = llama.forward(
                params, CFG, input_ids=tok[:, None],
                positions=(s + i)[None, None],
                segment_ids=jnp.ones((1, 1), jnp.int32), kv_cache=cache)
            nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
            return nxt, cache, acc + nxt
        return jax.lax.fori_loop(
            0, MAX_NEW, body,
            (tok, cache, jnp.zeros((1,), jnp.int32)))[2]

    tok, cache = prefill(params, jnp.asarray(ids))
    int(tok[0])
    acc = loop(params, tok, cache)          # compile
    int(acc[0])
    tok, cache = prefill(params, jnp.asarray(ids + 1))  # distinct input
    int(tok[0])
    t0 = time.perf_counter()
    acc = loop(params, tok, cache)
    int(acc[0])
    return MAX_NEW / (time.perf_counter() - t0)


def _spec_prefill(params, ids, gen_cfg, n_draft):
    """Untimed prompt prefill (shared by both speculative variants) so
    every reported number is DECODE-ONLY tok/s, comparable with the
    plain fused loop's."""
    from mantis_tpu.generation.speculative import _prefill_jit

    s = ids.shape[1]
    tok0, cache = _prefill_jit(
        params, jnp.asarray(ids, jnp.int32), None,
        jnp.asarray(s, jnp.int32), model_forward=lm_forward,
        model_cfg=CFG, max_new=gen_cfg.max_new_tokens + n_draft + 1,
        cache_dtype=jnp.int8)
    t0 = int(tok0[0])  # sync
    return t0, tok0, cache


def bench_speculative(params, ids, n_draft, draft_fn=None):
    from mantis_tpu.generation.speculative import decode_from_cache

    gen_cfg = GenerationConfig(max_new_tokens=MAX_NEW, do_sample=False,
                               eos_token_ids=(), pad_token_id=0)
    s = ids.shape[1]

    def run(prompt):
        t0, _, cache = _spec_prefill(params, prompt, gen_cfg, n_draft)
        ctx = [int(t) for t in prompt[0]]
        tw = time.perf_counter()
        out, stats, _, _ = decode_from_cache(
            params, CFG, lm_forward, cache, s, ctx, t0, gen_cfg,
            n_draft=n_draft, draft_fn=draft_fn)
        return out, stats, time.perf_counter() - tw

    run(ids + 3)  # warm compile on a distinct prompt
    out, stats, dt = run(ids)
    return len(out) / dt, stats, len(out), out


def bench_speculative_fused(params, ids, n_draft, oracle=None):
    """The round-3 FUSED speculative loop: drafting + verify + accept in
    one device program — no per-call host RTT at all."""
    from mantis_tpu.generation.speculative import (
        _fused_token_buffer, _spec_fused_jit)

    gen_cfg = GenerationConfig(max_new_tokens=MAX_NEW, do_sample=False,
                               eos_token_ids=(), pad_token_id=0)
    s = ids.shape[1]
    use_oracle = oracle is not None
    if use_oracle:
        orc = np.zeros(MAX_NEW + n_draft, np.int32)
        orc[:len(oracle)] = oracle
        n_orc = len(oracle)
    else:
        orc, n_orc = np.zeros(n_draft, np.int32), 0

    def run(prompt):
        _, tok0, cache = _spec_prefill(params, prompt, gen_cfg, n_draft)
        ctx = [int(t) for t in prompt[0]]
        buf = _fused_token_buffer(ctx, gen_cfg, n_draft, 3)
        tw = time.perf_counter()
        buf, out_len, cache, vc, dr, ac = _spec_fused_jit(
            params, cache, jnp.asarray(buf), jnp.asarray(s, jnp.int32),
            tok0.astype(jnp.int32), jnp.asarray(orc),
            jnp.asarray(n_orc, jnp.int32), model_forward=lm_forward,
            model_cfg=CFG, gen_cfg=gen_cfg, n_draft=n_draft, ngram=3,
            use_oracle=use_oracle)
        n = int(out_len)  # sync
        dt = time.perf_counter() - tw
        out = [int(t) for t in np.asarray(buf[s:s + n])]
        stats = {"verify_calls": int(vc), "drafted": int(dr),
                 "accepted": int(ac)}
        return out, stats, dt

    run(ids + 3)  # warm compile on a distinct prompt
    out, stats, dt = run(ids)
    return len(out) / dt, stats, len(out), out


def report(label, tok_s, stats, n):
    acc_rate = stats["accepted"] / max(stats["drafted"], 1)
    per_call = n / max(stats["verify_calls"], 1)
    print(f"{label}: {tok_s:6.1f} tok/s  ({n} toks, "
          f"{stats['verify_calls']} verify calls, "
          f"{stats['accepted']}/{stats['drafted']} drafts accepted = "
          f"{acc_rate:.2f}, {per_call:.2f} tok/call)", flush=True)


def main():
    n_draft = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    params = build_int8_params(CFG)
    prompts = make_prompts()

    fused = bench_plain_fused(params, prompts["random"])
    print(f"plain FUSED greedy loop:            {fused:6.1f} tok/s "
          f"(the shipped serving decode)", flush=True)

    # prompt-lookup on random-weight generations: the model's output
    # n-grams never recur in the prompt, so acceptance is ~0 on BOTH
    # prompts — this IS the worst case (pure host-stepped overhead)
    greedy_out = None
    for name, ids in prompts.items():
        tok_s, stats, n, out = bench_speculative(params, ids, n_draft)
        report(f"spec k={n_draft} lookup [{name:>10}]", tok_s, stats, n)
        if name == "random":
            greedy_out = out

    # best case: an ORACLE draft (the precomputed greedy continuation)
    # simulates perfectly-predictable text — what prompt-lookup yields
    # on extractive/repetitive generations with trained weights.
    # Greedy verification keeps the output exact either way.
    def oracle(history):
        done = len(history) - prompts["random"].shape[1]
        return greedy_out[done:done + n_draft]

    tok_s, stats, n, out = bench_speculative(
        params, prompts["random"], n_draft, draft_fn=oracle)
    assert out == greedy_out, "oracle drafts changed the output"
    report(f"spec k={n_draft} ORACLE [ best-case]", tok_s, stats, n)

    # round 3: the FUSED speculative loop (one device program) — the
    # host-RTT penalty disappears, so the worst case tracks the plain
    # fused loop and the best case keeps the full amortization.
    for name, ids in prompts.items():
        tok_s, stats, n, out = bench_speculative_fused(
            params, ids, n_draft)
        if name == "random":
            assert out == greedy_out, "fused lookup changed the output"
        report(f"FUSED k={n_draft} lookup [{name:>10}]", tok_s, stats, n)

    tok_s, stats, n, out = bench_speculative_fused(
        params, prompts["random"], n_draft, oracle=greedy_out)
    assert out == greedy_out, "fused oracle changed the output"
    report(f"FUSED k={n_draft} ORACLE [ best-case]", tok_s, stats, n)


if __name__ == "__main__":
    main()
