"""Eval-driver throughput: serial protocol vs engine-backed --workers.

The reference's eval protocol runs benchmark examples strictly one at a
time (reference: mantis/benchmark/eval.py main loop).  With
``--use_engine --workers N`` the driver co-schedules examples on the
continuous-batching engine's shared KV cache, so the chip decodes every
in-flight example per step instead of one.

Setup mirrors scripts/load_test_server.py: full-depth (32-layer)
flagship LM, int8 weights + int8 KV, ~340-token text-only multi-choice
prompts (that builder's debug projector doesn't match the LM width;
the image path through the engine is measured end-to-end by
scripts/bench_mm_serving.py), 64 decode tokens per example.

Run on the TPU:  python scripts/bench_eval_engine.py [n_examples]
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

MAX_NEW = 64
N_EXAMPLES = int(sys.argv[1]) if len(sys.argv) > 1 else 16
WORKERS = 8


def make_dataset(root, n):
    rng = np.random.RandomState(0)
    data = []
    for i in range(n):
        words = " ".join(f"w{j}" for j in rng.randint(0, 512, size=300))
        data.append({
            "id": f"q{i}", "question": words,
            "question_type": "multi-choice",
            "options": [f"w{j}" for j in rng.randint(0, 512, size=4)],
            "answer": "A", "category": "bench", "data_source": "bench",
            "images": []})
    path = os.path.join(root, "bench.json")
    with open(path, "w") as f:
        json.dump(data, f)
    return path


def main():
    from mantis_tpu.benchmark import eval as eval_lib
    from mantis_tpu.benchmark.adapters import MantisTPUAdapter
    from scripts.load_test_server import build_model

    model = build_model()
    root = tempfile.mkdtemp(prefix="bench_eval_")
    ds = make_dataset(root, N_EXAMPLES)
    engine_opts = dict(max_slots=WORKERS, slot_ctx=1024, chunk_tokens=16,
                       prefill_buckets=(512, 1024))

    def timed(tag, **kw):
        adapter = MantisTPUAdapter("", max_new_tokens=MAX_NEW,
                                   model=model)
        # warm: one example compiles this mode's prefill+decode programs
        eval_lib.main(
            model_name=f"warm-{tag}", dataset_path=ds,
            dataset_name=f"warm-{tag}",
            results_dir=os.path.join(root, "res"),
            model_instance=adapter, max_size=1, **kw)
        adapter = MantisTPUAdapter("", max_new_tokens=MAX_NEW,
                                   model=model)
        t0 = time.perf_counter()
        _, results = eval_lib.main(
            model_name=tag, dataset_path=ds, dataset_name=tag,
            results_dir=os.path.join(root, "res"),
            model_instance=adapter, **kw)
        dt = time.perf_counter() - t0
        epm = 60.0 * N_EXAMPLES / dt
        print(f"{tag}: {N_EXAMPLES} examples in {dt:.1f}s -> "
              f"{epm:.1f} examples/min", flush=True)
        return results, epm

    res_serial, epm_serial = timed("serial")
    res_engine, epm_engine = timed(
        "engine", use_engine=True, workers=WORKERS,
        engine_opts=engine_opts)

    same = sum(a["prediction"]["raw_answer"] ==
               b["prediction"]["raw_answer"]
               for a, b in zip(res_serial, res_engine))
    # serial and engine prefill through different XLA programs
    # (request-sized cache vs bucketed scratch) — bf16 argmax near-ties
    # on RANDOM weights may flip; report, don't assert (CPU f32 tests
    # assert exact identity in tests/test_eval.py)
    print(f"answers identical serial-vs-engine: {same}/{N_EXAMPLES} "
          f"(cross-program bf16 near-ties on random weights)")
    print(f"speedup: {epm_engine / epm_serial:.2f}x "
          f"({epm_serial:.1f} -> {epm_engine:.1f} examples/min, "
          f"workers={WORKERS})", flush=True)


if __name__ == "__main__":
    main()
