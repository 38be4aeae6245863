"""Batched decode throughput — the serving scale-out story on one chip.

Batch-1 decode is HBM-bound on the 7.5 GB of int8 weights read per
step (docs/PERF.md: 58 tok/s, ~73% of roofline), so batching amortizes
the weight reads almost linearly until the KV-cache reads and HBM
capacity take over.  Full-depth flagship LM (8B class, int8 weight-only
as in bench.py), 2048-token prompts, greedy x32.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from mantis_tpu.models import llama
from mantis_tpu.models.configs import LlamaConfig
from mantis_tpu.models.llama import KVCache
from mantis_tpu.ops.quant import QuantTensor

CFG = LlamaConfig(
    vocab_size=128256, hidden_size=4096, intermediate_size=14336,
    num_hidden_layers=32, num_attention_heads=32,
    num_key_value_heads=8, rope_theta=500000.0)
S_PROMPT, MAX_NEW = 2048, 32


@jax.jit
def build_params(key):
    L, d, li = CFG.num_hidden_layers, CFG.hidden_size, \
        CFG.intermediate_size
    hq, hk, dh = 32, 8, 128
    g = 128
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
        return (jax.random.normal(k, shape, jnp.bfloat16) * 0.02)

    return {
        "embed_tokens": bf(ks[0], CFG.vocab_size, d),
        "norm": jnp.ones((d,), jnp.bfloat16),
        "lm_head": qt1(ks[1], d, CFG.vocab_size),
        "layers": {
            "input_layernorm": jnp.ones((L, d), jnp.bfloat16),
            "post_attention_layernorm": jnp.ones((L, d), jnp.bfloat16),
            "q_proj": qt(ks[2], d, hq * dh),
            "k_proj": qt(ks[3], d, hk * dh),
            "v_proj": qt(ks[4], d, hk * dh),
            "o_proj": qt(ks[5], hq * dh, d),
            "gate_proj": qt(ks[6], d, li),
            "up_proj": qt(ks[7], d, li),
            "down_proj": qt(ks[8], li, d),
        },
    }


def bench_batch(params, b, cache_dtype=jnp.bfloat16):
    @jax.jit
    def prefill(params, ids):
        bb, s = ids.shape
        seg = jnp.ones((bb, s), jnp.int32)
        pos = jnp.broadcast_to(jnp.arange(s), (bb, s))
        cache = KVCache.create(CFG, bb, s + MAX_NEW, dtype=cache_dtype)
        logits, cache = llama.forward(
            params, CFG, input_ids=ids, positions=pos, segment_ids=seg,
            kv_cache=cache)
        return jnp.argmax(logits[:, -1], -1).astype(jnp.int32), cache

    @jax.jit
    def decode_loop(params, tok, cache):
        def body(i, state):
            tok, cache, acc = state
            logits, cache = llama.forward(
                params, CFG, input_ids=tok[:, None],
                positions=jnp.broadcast_to(
                    (S_PROMPT + i)[None, None], (tok.shape[0], 1)),
                segment_ids=jnp.ones((tok.shape[0], 1), jnp.int32),
                kv_cache=cache)
            nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
            return nxt, cache, acc + nxt
        tok, cache, acc = jax.lax.fori_loop(
            0, MAX_NEW, body,
            (tok, cache, jnp.zeros(tok.shape, jnp.int32)))
        return tok, acc

    rng = np.random.RandomState(b)
    prompts = [jnp.asarray(rng.randint(2, 128000, size=(b, S_PROMPT)))
               for _ in range(3)]
    tok, cache = prefill(params, prompts[-1])
    int(tok[0])
    _t, _a = decode_loop(params, tok, cache)
    int(_a[0])

    times = []
    for p in prompts[:2]:
        tok, cache = prefill(params, p)
        int(tok[0])
        t0 = time.perf_counter()
        _t, _a = decode_loop(params, tok, cache)
        int(_a[0])
        times.append(time.perf_counter() - t0)
    dt = min(times)
    agg = b * MAX_NEW / dt
    name = "int8" if cache_dtype == jnp.int8 else "bf16"
    print(f"kv={name} batch {b}: {agg:7.1f} tok/s aggregate "
          f"({agg/b:6.1f}/stream, {dt/MAX_NEW*1000:6.2f} ms/step)",
          flush=True)
    return agg


def main():
    params = jax.block_until_ready(build_params(jax.random.PRNGKey(0)))
    for b in (1, 2, 4, 8):
        bench_batch(params, b)
    # int8 KV cache (llama.KVCache.create(dtype=int8)): measured
    # kv=bf16/int8 b1@6016ctx 57.0/65.1, b8@2048 311/411 tok/s;
    # b16@2048 (574 tok/s) only fits with int8 KV
    for b in (1, 8, 16):
        bench_batch(params, b, cache_dtype=jnp.int8)


if __name__ == "__main__":
    main()
