"""Decompose the full-depth int8 decode step (bench.py bench_decode:
66.9 tok/s at ctx 6016 = 14.9 ms/token vs the ~10 ms weight+KV
bandwidth floor — where do the extra ~5 ms live?).

Ablations, each a fused 32-step greedy loop like the bench:
  A full step, ctx 6016           (the bench number)
  B full step, ctx 64             (KV/attention ablated: weights only)
  C no-lm_head step, ctx 6016     (head+argmax ablated)
  D matvec-only chain             (pure quant_matmul weight stream at
                                   the exact layer shapes x32 + head —
                                   the HBM floor XLA actually delivers)

Report effective HBM GB/s for D against the chip's ~819 GB/s peak.

Measurement rules as bench.py: distinct pre-staged inputs, value-fetch
syncs, best of 3.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from mantis_tpu.models import llama
from mantis_tpu.models.configs import LlamaConfig
from mantis_tpu.models.llama import KVCache
from mantis_tpu.ops.quant import QuantTensor, quant_matmul

cfg = LlamaConfig(
    vocab_size=128256, hidden_size=4096, intermediate_size=14336,
    num_hidden_layers=32, num_attention_heads=32,
    num_key_value_heads=8, rope_theta=500000.0)
L, d, li = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
hq, hk, dh = 32, 8, 128
g = 128
MAX_NEW = 32


@jax.jit
def build_params(key):
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
        "embed_tokens": bf(ks[0], cfg.vocab_size, d),
        "norm": jnp.ones((d,), jnp.bfloat16),
        "lm_head": qt1(ks[1], d, cfg.vocab_size),
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


def layer_slice(layers, i):
    def f(x):
        if isinstance(x, QuantTensor):
            return QuantTensor(q=x.q[i], scale=x.scale[i], bits=x.bits)
        return x[i]
    return jax.tree.map(f, layers,
                        is_leaf=lambda x: isinstance(x, QuantTensor))


def decode_bytes(ctx, with_head=True):
    """HBM bytes touched per decode token (int8 weights + scales,
    int8 KV at ctx, bf16 embed row)."""
    per_layer = (d * hq * dh + 2 * d * hk * dh + hq * dh * d
                 + 2 * d * li + li * d)
    w = per_layer * L
    scales = w // g * 4
    head = d * cfg.vocab_size * (1 + 4 // g) if with_head else 0
    kv = L * 2 * hk * dh * ctx * (1 + 4 // 1 // dh)  # int8 + scales/th
    return w + scales + head + kv


def timed_loop(fn, args_list, n_tok):
    best = None
    for a in args_list:
        t0 = time.perf_counter()
        out = fn(*a)
        _ = jax.tree.leaves(out)[0]
        float(jnp.sum(_.astype(jnp.float32))) if _.ndim else float(_)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best / n_tok * 1000  # ms/token


def make_decode(s_prompt, with_head=True):
    @jax.jit
    def prefill(params, ids):
        b, s = ids.shape
        seg = jnp.ones((b, s), jnp.int32)
        pos = jnp.broadcast_to(jnp.arange(s), (b, s))
        cache = KVCache.create(cfg, b, s + MAX_NEW, dtype=jnp.int8)
        logits, cache = llama.forward(
            params, cfg, input_ids=ids, positions=pos, segment_ids=seg,
            kv_cache=cache)
        return jnp.argmax(logits[:, -1], -1).astype(jnp.int32), cache

    @jax.jit
    def loop(params, tok, cache):
        def body(i, state):
            tok, cache, acc = state
            out, cache = llama.forward(
                params, cfg, input_ids=tok[:, None],
                positions=(s_prompt + i)[None, None],
                segment_ids=jnp.ones((1, 1), jnp.int32),
                kv_cache=cache, return_hidden=not with_head)
            if with_head:
                nxt = jnp.argmax(out[:, -1], -1).astype(jnp.int32)
            else:
                # head ablated (return_hidden skips lm_head); keep a
                # data dependency on the hidden state so nothing DCEs
                nxt = (tok + jnp.sum(out).astype(jnp.int32) % 3) \
                    % 128000
            return nxt, cache, acc + nxt
        tok, cache, acc = jax.lax.fori_loop(
            0, MAX_NEW, body, (tok, cache, jnp.zeros((1,), jnp.int32)))
        return acc
    return prefill, loop


def main():
    params = jax.block_until_ready(build_params(jax.random.PRNGKey(0)))
    rng = np.random.RandomState(0)

    results = {}
    for name, ctx, with_head in (
            ("A_full_ctx6016", 6016, True),
            ("B_full_ctx64", 64, True),
            ("C_nohead_ctx6016", 6016, False)):
        prefill, loop = make_decode(ctx, with_head)
        prompts = [jnp.asarray(rng.randint(2, 128000, size=(1, ctx)))
                   for _ in range(4)]
        caches = []
        for p in prompts:
            tok, cache = prefill(params, p)
            int(tok[0])
            caches.append((params, tok, cache))
        int(loop(*caches[0])[0])  # compile+warm on cache 0
        ms = timed_loop(loop, caches[1:], MAX_NEW)
        gbs = decode_bytes(ctx, with_head) / 1e9 / (ms / 1000)
        results[name] = ms
        print(f"{name}: {ms:7.2f} ms/token   eff {gbs:6.0f} GB/s")

    # D: pure weight stream — the 7 quant_matmuls per layer x L + head,
    # chained through a data dependency so nothing hoists.
    @jax.jit
    def matvec_chain(params, x):
        lp = params["layers"]

        def body(i, x):
            ly = layer_slice(lp, i)
            a = quant_matmul(x, ly["q_proj"])
            b = quant_matmul(x, ly["k_proj"])
            c = quant_matmul(x, ly["v_proj"])
            h = quant_matmul(a.reshape(1, hq * dh), ly["o_proj"])
            gt = quant_matmul(h, ly["gate_proj"])
            up = quant_matmul(h, ly["up_proj"])
            dn = quant_matmul(jax.nn.silu(gt) * up, ly["down_proj"])
            return dn + jnp.sum(b) + jnp.sum(c)
        x = jax.lax.fori_loop(0, L, body, x)
        logit = quant_matmul(x, params["lm_head"])
        return jnp.sum(logit)

    xs = [jnp.asarray(rng.randn(1, d), jnp.bfloat16) for _ in range(4)]
    float(matvec_chain(params, xs[0]))
    best = None
    for x in xs[1:]:
        t0 = time.perf_counter()
        float(matvec_chain(params, x))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    ms = best * 1000
    gbs = decode_bytes(0, True) / 1e9 / best
    print(f"D_matvec_only:  {ms:7.2f} ms/pass  eff {gbs:6.0f} GB/s "
          f"(weights+head {decode_bytes(0, True)/1e9:.2f} GB)")
    a, b_, c = (results["A_full_ctx6016"], results["B_full_ctx64"],
                results["C_nohead_ctx6016"])
    print(f"attention+KV @6016:  {a - b_:6.2f} ms/token")
    print(f"lm_head+argmax:      {a - c:6.2f} ms/token")
    print(f"matvec floor:        {ms:6.2f} ms/token")
    print(f"residual (norms/rope/loop): {b_ - ms:6.2f} ms/token")


if __name__ == "__main__":
    main()
