"""Benchmark entry: prints ONE JSON line for the driver.

Headline metric: SigLIP-so400m image-encode throughput (images/sec/chip)
against the driver target "≥2x A100 images/sec encoded per chip"
(~400 img/s; an A100-80G sustains ~200 img/s through the HF tower at
the reference's eval setting, modeling_llava.py:437-441).

Extra metrics in the same JSON object:
  - train_step_mfu: SFT train step at flagship LM widths (4096/14336,
    GQA 32/8), reduced depth with the FLOP model scaled to the actual
    config, bf16 compute, packed segments — the BASELINE ≥40% MFU
    check.
  - decode_tok_s / prefill_ttft_ms: FULL-DEPTH (32-layer) flagship LM
    with int8 weight-only quantized matmuls (an 8B bf16 + KV cache does
    not fit one 16 GB v5e; int8 is the single-chip serving config) —
    batch 1 greedy decode and 8-image-scale prefill TTFT.

Axon-tunnel measurement rules: the remote service result-caches
identical executions and adds ~5 ms/call dispatch, so every timed call
uses a DISTINCT pre-staged input and each section syncs once; the
encode section additionally takes the best of 3 rounds because the
single-tenant tunnel shows transient multi-second stalls.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

PEAK_FLOPS = 197e12  # v5e bf16


def bench_encode():
    from mantis_tpu.models import vit
    from mantis_tpu.models.configs import VisionConfig

    cfg = VisionConfig(
        tower_type="siglip", hidden_size=1152, intermediate_size=4304,
        num_hidden_layers=27, num_attention_heads=16, image_size=384,
        patch_size=14, layer_norm_eps=1e-6)
    params = vit.init_params(cfg, jax.random.PRNGKey(0),
                             dtype=jnp.bfloat16)

    batch, n_calls, rounds = 64, 6, 3
    rng = np.random.RandomState(0)
    batches = [jnp.asarray(rng.randn(batch, 3, 384, 384), jnp.bfloat16)
               for _ in range(rounds * n_calls + 1)]

    @jax.jit
    def encode(params, pix):
        # full eval feature path: hidden_states[-2] tap like Mantis eval
        feats = vit.forward(params, cfg, pix,
                            num_layers=cfg.num_hidden_layers - 1)
        return jnp.sum(feats.astype(jnp.float32))

    float(encode(params, batches[-1]))  # compile + warm
    best = 0.0
    for r in range(rounds):
        t0 = time.perf_counter()
        acc = 0.0
        for pix in batches[r * n_calls:(r + 1) * n_calls]:
            acc = acc + encode(params, pix)
        float(acc)  # single sync per round
        dt = time.perf_counter() - t0
        best = max(best, batch * n_calls / dt)

    # W8A8 int8 serving variant (cosine > 0.999 vs bf16, see
    # tests/test_int8_encode.py); reported separately from the bf16
    # headline for apples-to-apples with the A100 fp16 reference
    q8 = jax.jit(vit.quantize_encoder_weights_int8)(params)

    @jax.jit
    def encode_int8(q8_, pix):
        x = vit.embed(params, cfg, pix)
        h = vit.encoder_int8(q8_, cfg, x,
                             num_layers=cfg.num_hidden_layers - 1)
        return jnp.sum(h.astype(jnp.float32))

    float(encode_int8(q8, batches[-1]))
    best8 = 0.0
    for r in range(min(rounds, 2)):
        t0 = time.perf_counter()
        acc = 0.0
        for pix in batches[r * n_calls:(r + 1) * n_calls]:
            acc = acc + encode_int8(q8, pix)
        float(acc)
        best8 = max(best8, batch * n_calls / (time.perf_counter() - t0))
    return best, best8


def bench_train_mfu():
    """Packed-segment SFT step, flagship widths at reduced depth."""
    from mantis_tpu.models.configs import (
        LlamaConfig, LlavaConfig, VisionConfig)
    from mantis_tpu.models.mllava import model as mllava_model
    from mantis_tpu.train import trainer as T
    from mantis_tpu.utils.metrics import estimate_train_flops

    cfg = LlavaConfig(
        vision_config=VisionConfig(
            tower_type="siglip", hidden_size=1152,
            intermediate_size=4304, num_hidden_layers=2,
            num_attention_heads=16, image_size=384, patch_size=14),
        text_config=LlamaConfig(
            vocab_size=32768, hidden_size=4096, intermediate_size=14336,
            num_hidden_layers=2, num_attention_heads=32,
            num_key_value_heads=8, rope_theta=500000.0),
        image_token_index=32767,
    )
    params = mllava_model.init_params(cfg, jax.random.PRNGKey(0),
                                      dtype=jnp.bfloat16)
    tcfg = T.TrainConfig(learning_rate=1e-5, lr_schedule="constant",
                         max_steps=100, compute_dtype="bfloat16",
                         use_remat="dots", freeze_vision=True)
    trainable, frozen = T.partition_params(
        params, lambda p: T.default_trainable_pred(p, freeze_vision=True))
    opt, _ = T.make_optimizer(tcfg)
    step_fn = T.make_train_step(mllava_model.forward, cfg, tcfg, opt,
                                frozen)
    state = T.create_train_state(trainable, opt)

    b, s = 2, 8192
    rng = np.random.RandomState(0)
    n_calls = 4
    batches = []
    for i in range(n_calls + 1):
        ids = rng.randint(2, 32000, size=(b, s))
        labels = ids.copy()
        seg = np.ones((b, s), np.int32)
        seg[:, s // 3: 2 * s // 3] = 2   # packed conversations
        seg[:, 2 * s // 3:] = 3
        pos = np.concatenate([
            np.arange(s // 3), np.arange(s // 3),
            np.arange(s - 2 * (s // 3))])
        batches.append({
            "input_ids": jnp.asarray(ids),
            "labels": jnp.asarray(labels),
            "segment_ids": jnp.asarray(seg),
            "positions": jnp.asarray(
                np.broadcast_to(pos, (b, s)).copy()),
        })
    state, m = step_fn(state, batches[-1])  # compile
    float(m["loss"])
    t0 = time.perf_counter()
    for batch in batches[:n_calls]:
        state, m = step_fn(state, batch)
    float(m["loss"])  # sync
    dt = (time.perf_counter() - t0) / n_calls
    tok_s = b * s / dt
    mfu = estimate_train_flops(cfg) * tok_s / PEAK_FLOPS
    return mfu, tok_s


def bench_decode():
    """Full-depth flagship LM, int8 weight-only, batch-1 greedy."""
    from mantis_tpu.models import llama
    from mantis_tpu.models.configs import LlamaConfig
    from mantis_tpu.models.llama import KVCache
    from mantis_tpu.ops.quant import quantize_tree

    from mantis_tpu.ops.quant import QuantTensor

    del quantize_tree  # full bf16 8B does not fit HBM to quantize from
    cfg = LlamaConfig(
        vocab_size=128256, hidden_size=4096, intermediate_size=14336,
        num_hidden_layers=32, num_attention_heads=32,
        num_key_value_heads=8, rope_theta=500000.0)

    # Build the int8 tree ON DEVICE: 9 GB of host-generated weights
    # would stream over the axon tunnel for minutes; random device-side
    # weights are equivalent for throughput.
    L, d, li = cfg.num_hidden_layers, cfg.hidden_size, \
        cfg.intermediate_size
    hq, hk, dh = 32, 8, 128
    g = 128  # quant group size

    @jax.jit
    def build_params(key):
        ks = jax.random.split(key, 16)

        def qt(k, din, dout):
            q = jax.random.randint(
                k, (L, din // g, g, dout), -127, 128, jnp.int8)
            scale = jnp.full((L, din // g, 1, dout), 1e-3, jnp.float32)
            return QuantTensor(q=q, scale=scale, bits=8)

        def qt1(k, din, dout):  # unstacked (lm_head)
            q = jax.random.randint(
                k, (din // g, g, dout), -127, 128, jnp.int8)
            scale = jnp.full((din // g, 1, dout), 1e-3, jnp.float32)
            return QuantTensor(q=q, scale=scale, bits=8)

        def bf(k, *shape):
            return (jax.random.normal(k, shape, jnp.bfloat16) * 0.02)

        return {
            "embed_tokens": bf(ks[0], cfg.vocab_size, d),
            "norm": jnp.ones((d,), jnp.bfloat16),
            # int8 head too: 1.05 GB bf16 read/token otherwise
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

    params = jax.block_until_ready(build_params(jax.random.PRNGKey(0)))
    rng = np.random.RandomState(0)

    # 8-image-scale prefill: 8 x 729 image tokens + text ~= 6016
    s_prompt, max_new = 6016, 32
    rng = np.random.RandomState(0)

    @jax.jit
    def prefill(params, ids):
        b, s = ids.shape
        seg = jnp.ones((b, s), jnp.int32)
        pos = jnp.broadcast_to(jnp.arange(s), (b, s))
        # int8 KV (per-token-head scales): decode 57 -> 65 tok/s and
        # doubles batch capacity (docs/PERF.md); parity-tested in
        # tests/test_int8_kv_cache.py
        cache = KVCache.create(cfg, b, s + max_new, dtype=jnp.int8)
        logits, cache = llama.forward(
            params, cfg, input_ids=ids, positions=pos, segment_ids=seg,
            kv_cache=cache)
        return jnp.argmax(logits[:, -1], -1).astype(jnp.int32), cache

    @jax.jit
    def decode_loop(params, tok, cache):
        # the whole greedy loop in ONE jit (a host-side per-token loop
        # pays the tunnel dispatch + cache copy every step: measured
        # 6.4 tok/s vs the fused loop)
        def body(i, state):
            tok, cache, acc = state
            logits, cache = llama.forward(
                params, cfg, input_ids=tok[:, None],
                positions=(s_prompt + i)[None, None],
                segment_ids=jnp.ones((1, 1), jnp.int32), kv_cache=cache)
            nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
            return nxt, cache, acc + nxt
        tok, cache, acc = jax.lax.fori_loop(
            0, max_new, body, (tok, cache, jnp.zeros((1,), jnp.int32)))
        return tok, acc

    prompts = [jnp.asarray(rng.randint(2, 128000, size=(1, s_prompt)))
               for _ in range(3)]
    # warm up with VALUE fetches: block_until_ready over the axon
    # tunnel returns before remote work drains, so the first timed
    # fetch would otherwise absorb the whole compile pipeline
    tok, cache = prefill(params, prompts[-1])       # compile
    int(tok[0])
    _t, _a = decode_loop(params, tok, cache)        # compile
    int(_a[0])
    tok, cache = prefill(params, prompts[-2])       # fresh cache
    int(tok[0])

    # TTFT: prefill on distinct prompts; force a value fetch per call
    # (block_until_ready over the tunnel can return before the remote
    # result materializes — fetching the token scalar cannot)
    t0 = time.perf_counter()
    acc = 0
    for p in prompts[:2]:
        tok, cache = prefill(params, p)
        acc += int(tok[0])
    ttft_ms = (time.perf_counter() - t0) / 2 * 1000

    # decode: the fused loop on the fresh cache (distinct from the
    # compile run, so the tunnel result-cache cannot alias it)
    t0 = time.perf_counter()
    _tok, acc = decode_loop(params, tok, cache)
    int(acc[0])  # value fetch forces completion
    tok_s = max_new / (time.perf_counter() - t0)
    return ttft_ms, tok_s


def _bounded(fn, seconds=300):
    """Run a bench section under a SIGALRM budget: a cold compile cache
    or a stalled tunnel must not take down the headline metric."""
    import signal

    def _raise(signum, frame):
        raise TimeoutError(f"section exceeded {seconds}s")

    old_h = signal.signal(signal.SIGALRM, _raise)
    signal.alarm(seconds)
    try:
        return fn()
    except Exception as e:
        print(f"# bench section skipped: {type(e).__name__}: {e}",
              flush=True)
        return None
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old_h)


def main():
    imgs_per_sec, imgs_per_sec_int8 = bench_encode()
    mfu_res = _bounded(bench_train_mfu, 480)
    dec_res = _bounded(bench_decode, 480)
    extras = {
        "encode_img_s_int8_w8a8": round(imgs_per_sec_int8, 2),
    }
    if mfu_res:
        extras["train_step_mfu"] = round(mfu_res[0], 4)
        extras["train_tokens_per_sec"] = round(mfu_res[1], 1)
    if dec_res:
        extras["prefill_ttft_ms_6016tok_fulldepth_int8"] = round(
            dec_res[0], 1)
        extras["decode_tok_per_sec_fulldepth_int8"] = round(
            dec_res[1], 1)
    print(json.dumps({
        "metric": "siglip_so400m_encode_images_per_sec_per_chip",
        "value": round(imgs_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(imgs_per_sec / 400.0, 3),
        "extra_metrics": extras,
    }))


if __name__ == "__main__":
    main()
