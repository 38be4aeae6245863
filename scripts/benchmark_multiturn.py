"""Multi-turn serving: incremental prefill (ChatSession's primitive)
vs the reference's full re-prefill, at full depth.

The reference rebuilds and re-prefills the whole conversation every
turn (mantis/models/mllava/utils.py:10-97), so turn-N TTFT grows with
the history.  Our ``cache_attention=True`` incremental-prefill mode
(llama.forward; generation/session.py) attends a delta chunk to the
live cache, making turn-N TTFT O(delta).

32-layer int8-weight LM, int8 KV cache, 2048-token opening prompt,
128-token per-turn deltas.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import jax
import jax.numpy as jnp

import profile_batched_decode as B
from mantis_tpu.models import llama
from mantis_tpu.models.llama import KVCache

CTX, FIRST, DELTA = 4096, 2048, 128


def main():
    params = jax.block_until_ready(B.build_params(jax.random.PRNGKey(0)))

    @jax.jit
    def prefill_full(params, ids):
        b, s = ids.shape
        cache = KVCache.create(B.CFG, b, CTX, dtype=jnp.int8)
        logits, cache = llama.forward(
            params, B.CFG, input_ids=ids,
            positions=jnp.broadcast_to(jnp.arange(s), (b, s)),
            segment_ids=jnp.ones((b, s), jnp.int32), kv_cache=cache)
        return logits[:, -1], cache

    @jax.jit
    def extend(params, ids, start, cache):
        b, s = ids.shape
        pos = (start + jnp.arange(s))[None, :]
        logits, cache = llama.forward(
            params, B.CFG, input_ids=ids, positions=pos,
            segment_ids=jnp.ones((b, s), jnp.int32), kv_cache=cache,
            cache_attention=True)
        return logits[:, -1], cache

    rng = np.random.RandomState(0)

    def t_of(fn, argsets):
        # warm on argsets[0]; time argsets[1:] — the tunnel
        # result-caches identical executions, so every timed call
        # needs distinct inputs and a value fetch
        lg, cache = fn(*argsets[0])
        float(jnp.sum(lg.astype(jnp.float32)))
        t0 = time.perf_counter()
        for a in argsets[1:]:
            lg, cache = fn(*a)
            float(jnp.sum(lg.astype(jnp.float32)))
        return (time.perf_counter() - t0) * 1000 / (len(argsets) - 1), \
            cache

    def toks(n):
        return jnp.asarray(rng.randint(2, 128000, size=(1, n)))

    dt_first, cache = t_of(prefill_full,
                           [(params, toks(FIRST)) for _ in range(3)])
    print(f"turn 1 prefill ({FIRST} tok):        {dt_first:7.1f} ms",
          flush=True)

    start = jnp.asarray(FIRST, jnp.int32)
    dt_inc, _ = t_of(extend,
                     [(params, toks(DELTA), start, cache)
                      for _ in range(3)])
    print(f"turn 2 incremental ({DELTA} tok):    {dt_inc:7.1f} ms",
          flush=True)

    dt_re, _ = t_of(prefill_full,
                    [(params, toks(FIRST + DELTA)) for _ in range(3)])
    print(f"turn 2 full re-prefill ({FIRST + DELTA} tok): {dt_re:7.1f} ms"
          f"  ({dt_re / dt_inc:.1f}x slower than incremental)",
          flush=True)


if __name__ == "__main__":
    main()
