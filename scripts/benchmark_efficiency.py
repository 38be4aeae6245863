"""Inference efficiency harness: prefill TTFT + decode tokens/sec.

TPU equivalent of the reference harness
(reference: scripts/benchmark_internvl_efficiency.py:1-60 — mean ms over
100 one-token generates with CUDA events).  Here: jitted prefill
(one-token generate == TTFT) and a jitted decode loop, timed with
distinct pre-staged inputs and a single device sync (the axon tunnel
result-caches identical executions, see bench.py).

Usage:
  python scripts/benchmark_efficiency.py [--layers 4] [--images 8] \
      [--prompt_len 512] [--decode_tokens 64] [--batch 1]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--layers", type=int, default=4,
                   help="LM layers (32 = full 8B; reduced fits faster)")
    p.add_argument("--vit_layers", type=int, default=4)
    p.add_argument("--images", type=int, default=8)
    p.add_argument("--prompt_len", type=int, default=512)
    p.add_argument("--decode_tokens", type=int, default=64)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--iters", type=int, default=4)
    args = p.parse_args()

    from __graft_entry__ import _flagship_cfg
    from mantis_tpu.generation.sampler import GenerationConfig, generate
    from mantis_tpu.models.mllava import model as mllava_model

    cfg = _flagship_cfg(num_lm_layers=args.layers,
                        num_vit_layers=args.vit_layers)
    params = mllava_model.init_params(
        cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    P = cfg.num_image_tokens
    rng = np.random.RandomState(0)
    seq = args.prompt_len + args.images * P

    def make_inputs(seed):
        r = np.random.RandomState(seed)
        ids = r.randint(0, 1000, size=(args.batch, seq))
        for i in range(args.images):
            ids[:, 10 + i * P:10 + (i + 1) * P] = cfg.image_token_index
        pix = r.randn(args.images * args.batch, 3,
                      cfg.vision_config.image_size,
                      cfg.vision_config.image_size).astype(np.float32)
        return ids, pix

    gen1 = GenerationConfig(max_new_tokens=1, pad_token_id=0)
    genN = GenerationConfig(max_new_tokens=args.decode_tokens,
                            pad_token_id=0)

    # compile + warm
    ids, pix = make_inputs(99)
    generate(params, cfg, mllava_model.forward, ids, pix, gen_cfg=gen1)
    generate(params, cfg, mllava_model.forward, ids, pix, gen_cfg=genN)

    # TTFT: one-token generates over distinct inputs
    t0 = time.perf_counter()
    for i in range(args.iters):
        ids, pix = make_inputs(i)
        generate(params, cfg, mllava_model.forward, ids, pix,
                 gen_cfg=gen1)
    ttft_ms = (time.perf_counter() - t0) / args.iters * 1e3

    # decode: N tokens; decode time = total - prefill
    t0 = time.perf_counter()
    for i in range(args.iters):
        ids, pix = make_inputs(i + 100)
        generate(params, cfg, mllava_model.forward, ids, pix,
                 gen_cfg=genN)
    total_ms = (time.perf_counter() - t0) / args.iters * 1e3
    decode_ms = max(total_ms - ttft_ms, 1e-6)
    tok_s = (args.decode_tokens - 1) / (decode_ms / 1e3)

    print(json.dumps({
        "config": {
            "lm_layers": args.layers, "images": args.images,
            "prompt_len": args.prompt_len, "seq_len": seq,
            "batch": args.batch,
        },
        "prefill_ttft_ms": round(ttft_ms, 2),
        "decode_tokens_per_sec": round(tok_s, 2),
        "note": ("reduced-depth flagship architecture; scale LM-bound "
                 "numbers by layers/32 for the full 8B"),
    }, indent=2))


if __name__ == "__main__":
    main()
