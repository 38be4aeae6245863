"""Generic multi-image benchmark driver.

Behavioral port of the reference driver
(reference: mantis/benchmark/eval.py:81-255): HF or local-JSON datasets,
option formatting, interleaved message construction with ``<image>``
back-fill, resumable JSONL (skip by id, re-score cached raw answers),
accuracy by question type.

Usage:
  python -m mantis_tpu.benchmark.eval --model_name mantis-tpu:/ckpt/dir \
      --dataset_path TIGER-Lab/Mantis-eval --dataset_name mantis_eval
"""

from __future__ import annotations

import argparse
import json
import os
import random
from collections import Counter
from pathlib import Path
from typing import List, Optional

import numpy as np
from PIL import Image

from mantis_tpu.benchmark.adapters import MLLM_Models
from mantis_tpu.benchmark.scoring import format_options, get_prediction

TEMPLATES_DIR = Path(__file__).parent / "templates"


def load_templates():
    return {p.stem: p.read_text() for p in TEMPLATES_DIR.glob("*.txt")}


def build_messages(question: str, images: List, support_multi_image: bool
                   ) -> List[dict]:
    """Interleaved messages with <image> back-fill
    (reference: eval.py:178-208)."""
    if not support_multi_image:
        parts = question.split("<image>")
        question = " ".join(x.strip(" \n") for x in parts
                            if x.strip() != "")
        messages = [{"type": "image", "content": im} for im in images]
        messages.append({"type": "text", "content": question})
        return messages
    if question.count("<image>") < len(images):
        question = "<image>" * (
            len(images) - question.count("<image>")) + question
    parts = question.split("<image>")
    messages = []
    for i, part in enumerate(parts):
        if part.strip("\n ") != "":
            messages.append({"type": "text", "content": part})
        if i < len(images):
            messages.append({"type": "image", "content": images[i]})
    return messages


def load_benchmark(dataset_path: str, max_size=None, sub_sample_size=None,
                   seed=42, split="test"):
    if os.path.exists(dataset_path):
        with open(dataset_path) as f:
            dataset = json.load(f)
        base = Path(dataset_path).parent
        for d in dataset:
            d["images"] = [Image.open(str(base / p)).convert("RGB")
                           for p in d["images"]]
        if max_size:
            dataset = dataset[:max_size]
        if isinstance(sub_sample_size, int):
            dataset = random.sample(dataset, sub_sample_size)
        return dataset
    import datasets as hf_datasets

    ds = hf_datasets.load_dataset(dataset_path, split=split)
    if max_size:
        ds = ds.select(range(min(len(ds), max_size)))
    if isinstance(sub_sample_size, int):
        ds = ds.shuffle(seed=seed).select(range(sub_sample_size))
    return ds


def main(
    model_name: str,
    dataset_path: str = "TIGER-Lab/Mantis-eval",
    dataset_name: str = "",
    results_dir: str = "results",
    max_size: Optional[int] = None,
    num_shots: int = 0,
    overwrite: bool = False,
    check_existing: bool = False,
    sub_sample_size: Optional[int] = None,
    seed: int = 42,
    model_instance=None,
    workers: int = 1,
    use_engine: bool = False,
    engine_opts: Optional[dict] = None,
):
    """workers > 1 runs the generation loop with a thread pool — only
    effective on a ``concurrent_safe`` adapter (the continuous-batching
    EngineAdapter), where co-submitted examples share decode chunks on
    one KV cache instead of running serially.  ``use_engine`` wraps a
    MantisLlava-style adapter in the engine automatically
    (``engine_opts`` forwards slot/bucket sizing).  The resume protocol
    is unchanged: JSONL lines may land out of dataset order, resume
    matches by id."""
    if num_shots != 0:
        # the reference CLI exposes the flag but this driver (like the
        # reference's) builds 0-shot prompts; a results file labeled
        # "_4_shots" with 0-shot prompts would misrepresent comparisons
        raise NotImplementedError(
            "few-shot prompt construction is not implemented; "
            "run with --num_shots 0")
    random.seed(seed)
    templates = load_templates()
    results_dir = Path(results_dir)
    results_path = (results_dir / dataset_name
                    / f"{model_name.replace('/', '_').replace(':', '_')}"
                      f"_{num_shots}_shots.jsonl")
    results_path.parent.mkdir(parents=True, exist_ok=True)

    existing = []
    if results_path.exists():
        if overwrite:
            os.remove(results_path)
        else:
            with open(results_path) as f:
                existing = [json.loads(x) for x in f]
    # error records (per-example containment below) are retried on
    # resume rather than cached as wrong answers
    existing_by_id = {r["id"]: r for r in existing
                      if not r.get("error")}
    all_results = []

    if check_existing:
        all_results = existing
    else:
        dataset = load_benchmark(dataset_path, max_size, sub_sample_size,
                                 seed)
        model = None
        if model_instance is not None:
            model = model_instance
        elif model_name != "random":
            model = MLLM_Models(model_name)()
        owned_engine = None
        if use_engine and model is not None:
            from mantis_tpu.serving.engine import wrap_adapter_in_engine

            model = wrap_adapter_in_engine(model, engine_opts)
            owned_engine = model.engine

        import threading

        results_by_id = {}
        with open(results_path, "a+") as result_f:
            write_lock = threading.Lock()
            todo = []
            for d in dataset:
                if d["id"] in existing_by_id and not overwrite:
                    r = existing_by_id[d["id"]]
                    # re-score cached raw answer (reference: eval.py:146-150)
                    r["prediction"] = get_prediction(
                        d["question_type"],
                        r["prediction"]["raw_answer"], d["answer"],
                        d["options"], dataset_name)
                    results_by_id[d["id"]] = r
                else:
                    todo.append(d)

            def run_one(d):
                question_type = d["question_type"]
                question = d["question"]
                messages = None
                error = None
                if model_name == "random" and model is None:
                    if question_type == "multi-choice":
                        raw_answer = random.choice(d["options"])
                    else:
                        raw_answer = ""
                else:
                    if question_type == "multi-choice":
                        question = format_options(question, d["options"])
                    question = templates[question_type].format(
                        question=question)
                    messages = build_messages(
                        question, d["images"], model.support_multi_image)
                    try:
                        raw_answer = model(messages)
                    except Exception as e:
                        # per-example containment: one prompt exceeding
                        # e.g. the engine's static limits must not abort
                        # the run; error records retry on resume
                        print(f"[eval] {d['id']} failed: "
                              f"{type(e).__name__}: {e}", flush=True)
                        raw_answer, error = "", f"{type(e).__name__}: {e}"
                    for m in messages:
                        if m["type"] == "image":
                            m["content"] = str(m["content"])
                prediction = get_prediction(
                    question_type, raw_answer, d["answer"], d["options"],
                    dataset_name)
                item = {
                    "id": d["id"],
                    "question": d["question"],
                    "question_type": d["question_type"],
                    "options": d["options"],
                    "category": d.get("category"),
                    "data_source": d.get("data_source"),
                    "answer": d["answer"],
                    "messages": messages,
                    "prediction": prediction,
                }
                if error is not None:
                    item["error"] = error
                with write_lock:
                    result_f.write(json.dumps(item) + "\n")
                    result_f.flush()
                    results_by_id[d["id"]] = item

            try:
                if workers > 1 and getattr(model, "concurrent_safe",
                                           False):
                    from concurrent.futures import ThreadPoolExecutor

                    with ThreadPoolExecutor(max_workers=workers) as ex:
                        list(ex.map(run_one, todo))
                else:
                    for d in todo:
                        run_one(d)
            finally:
                if owned_engine is not None:
                    owned_engine.shutdown()
        # summary/json in dataset order regardless of completion order
        all_results = [results_by_id[d["id"]] for d in dataset]

    print(Counter(r["prediction"]["parsed_answer"] for r in all_results
                  if r["question_type"] == "multi-choice"))
    with open(results_path.with_suffix(".json"), "w") as f:
        json.dump(all_results, f, indent=4)
    print("Results on dataset:", dataset_name)
    summary = {}
    mc = [q for q in all_results if q["question_type"] == "multi-choice"]
    if mc:
        summary["multi-choice"] = float(
            np.mean([q["prediction"]["correct"] for q in mc]))
        print(f"Multi-choice Accuracy: {summary['multi-choice']:.4f}")
    sa = [q for q in all_results if q["question_type"] == "short-answer"]
    if sa:
        summary["short-answer"] = float(
            np.mean([q["prediction"]["correct"] for q in sa]))
        print(f"Short-answer Accuracy: {summary['short-answer']:.4f}")
    if all_results:
        summary["overall"] = float(
            np.mean([q["prediction"]["correct"] for q in all_results]))
        print(f"Overall Accuracy: {summary['overall']:.4f}")
    return summary, all_results


def cli():
    p = argparse.ArgumentParser()
    p.add_argument("--model_name", required=True)
    p.add_argument("--dataset_path", default="TIGER-Lab/Mantis-eval")
    p.add_argument("--dataset_name", default="")
    p.add_argument("--results_dir", default="results")
    p.add_argument("--max_size", type=int, default=None)
    p.add_argument("--num_shots", type=int, default=0)
    p.add_argument("--overwrite", action="store_true")
    p.add_argument("--check_existing", action="store_true")
    p.add_argument("--sub_sample_size", type=int, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--workers", type=int, default=1,
                   help="concurrent eval examples (effective with "
                        "--use_engine: examples share decode chunks on "
                        "the continuous-batching engine)")
    p.add_argument("--use_engine", action="store_true",
                   help="wrap the adapter in the continuous-batching "
                        "engine (mantis-tpu family)")
    args = p.parse_args()
    main(**vars(args))


if __name__ == "__main__":
    cli()
