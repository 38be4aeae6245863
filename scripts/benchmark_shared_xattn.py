"""Shared-cross-attention prefill efficiency (reference:
mantis/scripts/benchmark_internvl_efficiency.py — times a 1-new-token
generate, i.e. prefill TTFT, for shared-cross-attn InternVL).

Compares inline attention (every image token attends the whole packed
sequence) vs the shared mode (text-q over [image ++ text] with
causal_offset; image tokens local-group self-attn), at a video-scale
prefix.  Axon rules: distinct inputs per timed call, one sync each.
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from mantis_tpu.models.configs import LlamaConfig
from mantis_tpu.models.intern_vl.model import (
    InternViTConfig,
    InternVLConfig,
    init_params,
    forward,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--prefix", type=int, default=4096,
                   help="image-token prefix length (16 tiles x 256)")
    p.add_argument("--text", type=int, default=512)
    p.add_argument("--group", type=int, default=256,
                   help="local_attention_group_size (tokens per tile)")
    p.add_argument("--layers", type=int, default=8)
    p.add_argument("--runs", type=int, default=4)
    a = p.parse_args()

    cfg = InternVLConfig(
        vision_config=InternViTConfig(
            hidden_size=64, intermediate_size=128, num_hidden_layers=1,
            num_attention_heads=2, image_size=28, patch_size=14),
        text_config=LlamaConfig(
            vocab_size=32768, hidden_size=4096, intermediate_size=14336,
            num_hidden_layers=a.layers, num_attention_heads=32,
            num_key_value_heads=8, rope_theta=1e6),
        image_token_id=32767,
        local_attention_group_size=a.group)
    params = init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    S = a.prefix + a.text
    rng = np.random.RandomState(0)
    prompts = [jnp.asarray(rng.randint(2, 32000, size=(1, S)))
               for _ in range(2 * a.runs + 2)]

    def run(name, **kw):
        @jax.jit
        def f(params, ids):
            logits, _, _ = forward(params, cfg, input_ids=ids, **kw)
            return jnp.argmax(logits[:, -1], -1)

        int(f(params, prompts[-1])[0])  # compile
        t0 = time.perf_counter()
        acc = 0
        for ids in prompts[:a.runs]:
            acc += int(f(params, ids)[0])
        ms = (time.perf_counter() - t0) / a.runs * 1000
        print(f"{name:34s} prefill TTFT {ms:8.1f} ms")
        return ms

    base = run(f"inline full attention (S={S})")
    shared = run(f"shared-xattn (group={a.group})",
                 shared_xattn_prefix=a.prefix)
    print(f"speedup: {base / shared:.2f}x")


if __name__ == "__main__":
    main()
