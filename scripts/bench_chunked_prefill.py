"""Chunked prefill (round 3): co-resident decode stall during a long
admission, with and without --prefill_chunk.

One live stream decodes (full-depth int8 flagship LM) while a
~1900-token prompt is admitted.  Without chunking the live stream
stalls for one whole-prompt prefill; with prefill_chunk=256 the
admission interleaves decode chunks between 256-token incremental-
prefill pieces, bounding the stall at ~one piece.  Reported: the live
stream's max inter-token gap during the admission, and the admitted
request's time-to-first-token (the latency the chunking trades away).
"""
import sys
import threading
import time

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir",
                  "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from scripts.load_test_server import build_model
from mantis_tpu.serving.engine import ContinuousBatchingEngine


def run(model, prefill_chunk):
    eng = ContinuousBatchingEngine(
        model, max_slots=2, slot_ctx=2048, chunk_tokens=8,
        prefill_buckets=(256, 512, 1024, 2048), max_cached_prefixes=0,
        prefill_chunk=prefill_chunk)
    rng = np.random.RandomState(0)
    live_prompt = [int(t) for t in rng.randint(5, 500, size=200)]
    long_prompt = [int(t) for t in rng.randint(5, 500, size=1900)]
    # warm every program: live decode, long admit (+pieces), retire
    eng.generate_sync(live_prompt[:100], None, 4)
    eng.generate_sync(long_prompt, None, 2)

    gaps, times = [], []
    admitted_t0 = [None]
    ttft = [None]

    def live_consumer():
        last = time.perf_counter()
        for _ in eng.generate_stream(live_prompt, None, 96):
            now = time.perf_counter()
            gaps.append(now - last)
            times.append(now)
            last = now

    th = threading.Thread(target=live_consumer)
    th.start()
    while len(gaps) < 16:        # live stream well into decode
        time.sleep(0.005)
    admitted_t0[0] = time.perf_counter()
    req = eng.submit_ids(long_prompt, None, 8)
    req.done.wait(300)
    ttft[0] = None
    th.join(timeout=300)
    eng.shutdown()
    # tokens arrive in per-chunk bursts, so the meaningful baseline is
    # the MAX inter-token gap before the admission (≈ one decode chunk)
    stall = max(g for g, t in zip(gaps, times) if t > admitted_t0[0])
    base = max(g for g, t in zip(gaps, times) if t <= admitted_t0[0])
    return base, stall


def main():
    model = build_model()
    for chunk in (0, 256):
        base, stall = run(model, chunk)
        label = f"prefill_chunk={chunk or 'off'}"
        print(f"{label:>20}: baseline inter-token gap {base*1e3:6.1f} ms"
              f", max stall during 1900-tok admission {stall*1e3:6.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
