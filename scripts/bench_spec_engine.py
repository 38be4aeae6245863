"""Speculative decoding inside the continuous-batching engine
(round 3): aggregate tok/s at 8 concurrent streams, spec vs plain.

Full-depth int8 flagship LM (the serving config).  Random weights give
~0 prompt-lookup acceptance, so the spec number here is the WORST case
— the claim under test is that speculative verify-steps are
throughput-neutral when nothing is accepted (each (k+1)-token verify
reads the same ~8 GB of weights as a 1-token step) and every extra
accepted token on real text is pure gain (the single-stream oracle
ceiling is 4.7x, docs/SERVING.md).
"""
import sys
import time
import threading

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir",
                  "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from scripts.load_test_server import build_model
from mantis_tpu.serving.engine import ContinuousBatchingEngine


def run_engine(model, spec_tokens, prompts, max_new=64):
    eng = ContinuousBatchingEngine(
        model, max_slots=8, slot_ctx=1024, chunk_tokens=16,
        prefill_buckets=(512,), max_cached_prefixes=0,
        spec_tokens=spec_tokens, spec_ngram=3)
    eng.generate_sync(prompts[8], None, 4)      # warm/compile
    results = [None] * 8
    t0 = time.perf_counter()

    def worker(i):
        results[i] = eng.generate_sync(prompts[i], None, max_new)

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    stats = eng.stats()
    eng.shutdown()
    n = sum(len(r) for r in results)
    return n / dt, results, stats


def main():
    model = build_model()
    rng = np.random.RandomState(0)
    prompts = [[int(t) for t in rng.randint(5, 500, size=400)]
               for _ in range(9)]

    plain_tps, plain_out, _ = run_engine(model, 0, prompts)
    print(f"plain engine 8 streams: {plain_tps:6.1f} tok/s aggregate",
          flush=True)
    spec_tps, spec_out, stats = run_engine(model, 5, prompts)
    print(f"spec  engine 8 streams: {spec_tps:6.1f} tok/s aggregate "
          f"(spec_extra_tokens={stats['spec_extra_tokens']}, "
          f"verify steps={stats['decode_steps']})", flush=True)
    same = sum(a == b for a, b in zip(plain_out, spec_out))
    print(f"replies identical to plain engine: {same}/8 "
          f"(cross-PROGRAM bf16 argmax near-ties on random weights; "
          f"CPU f32 tests assert spec==plain exactly)", flush=True)

    # the correct on-chip control: the SAME spec engine serving the
    # same prompts strictly one-at-a-time — identical compiled
    # programs, co-residency the only variable
    eng = ContinuousBatchingEngine(
        model, max_slots=8, slot_ctx=1024, chunk_tokens=16,
        prefill_buckets=(512,), max_cached_prefixes=0,
        spec_tokens=5, spec_ngram=3)
    serial_out = [eng.generate_sync(prompts[i], None, 64)
                  for i in range(8)]
    eng.shutdown()
    same = sum(a == b for a, b in zip(serial_out, spec_out))
    print(f"concurrent spec replies identical to one-at-a-time spec "
          f"replies: {same}/8", flush=True)


if __name__ == "__main__":
    main()
