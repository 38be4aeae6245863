"""Mementos eval: GPT-assisted keyword extraction -> behavior/object F1.

Behavioral port of the reference driver
(reference: mantis/benchmark/eval_on_mementos.py +
mementos_eval_utils.py): the model describes an image-sequence comic;
an LLM judge extracts behavior/object keywords from both the prediction
and the GT description; F1 over keyword sets is reported.
"""

from __future__ import annotations

import argparse
import json
import os
from pathlib import Path
from typing import Dict, List, Optional, Set

from mantis_tpu.judge.openai_utils import openai_completions

EXTRACT_PROMPT = (
    "Extract two comma-separated lists from the description below:\n"
    "BEHAVIORS: the action/behavior keywords\n"
    "OBJECTS: the object keywords\n\n"
    "Description: {text}\n"
)


def parse_keywords(judge_output: str) -> Dict[str, Set[str]]:
    out = {"behaviors": set(), "objects": set()}
    for line in judge_output.splitlines():
        low = line.lower()
        if low.startswith("behaviors:"):
            out["behaviors"] = {x.strip().lower() for x in
                                line.split(":", 1)[1].split(",")
                                if x.strip()}
        elif low.startswith("objects:"):
            out["objects"] = {x.strip().lower() for x in
                              line.split(":", 1)[1].split(",")
                              if x.strip()}
    return out


def f1(pred: Set[str], gt: Set[str]) -> float:
    if not pred and not gt:
        return 1.0
    if not pred or not gt:
        return 0.0
    tp = len(pred & gt)
    p = tp / len(pred)
    r = tp / len(gt)
    return 0.0 if p + r == 0 else 2 * p * r / (p + r)


def score_predictions(predictions: List[str], references: List[str],
                      model_name: str = "gpt-4o",
                      completion_fn=None, cache_dir=None) -> Dict:
    prompts = [EXTRACT_PROMPT.format(text=t)
               for t in predictions + references]
    out = openai_completions(prompts, model_name,
                             completion_fn=completion_fn,
                             cache_dir=cache_dir)
    n = len(predictions)
    pred_kw = [parse_keywords(t) for t in out["completions"][:n]]
    ref_kw = [parse_keywords(t) for t in out["completions"][n:]]
    behav = [f1(p["behaviors"], r["behaviors"])
             for p, r in zip(pred_kw, ref_kw)]
    obj = [f1(p["objects"], r["objects"])
           for p, r in zip(pred_kw, ref_kw)]
    return {
        "behavior_f1": sum(behav) / max(len(behav), 1),
        "object_f1": sum(obj) / max(len(obj), 1),
        "judge_cost": out["total_price"],
    }


def main(model_name: str, dataset_path: str,
         results_dir: str = "results/mementos",
         judge_model: str = "gpt-4o", max_size: Optional[int] = None,
         model_instance=None):
    from PIL import Image

    from mantis_tpu.benchmark.adapters import MLLM_Models

    with open(dataset_path) as f:
        data = json.load(f)
    if max_size:
        data = data[:max_size]
    model = model_instance or MLLM_Models(model_name)()
    os.makedirs(results_dir, exist_ok=True)
    preds, refs = [], []
    base = Path(dataset_path).parent
    for item in data:
        frames = [Image.open(base / p).convert("RGB")
                  for p in item["images"]]
        messages = [{"type": "image", "content": fr} for fr in frames]
        messages.append({
            "type": "text",
            "content": "Write a description for the given image "
                       "sequence in a single paragraph, what is "
                       "happening in this episode?"})
        preds.append(model(messages))
        refs.append(item["description"])
    scores = score_predictions(preds, refs, judge_model)
    out_path = Path(results_dir) / (
        model_name.replace("/", "_").replace(":", "_") + ".json")
    with open(out_path, "w") as f:
        json.dump({"scores": scores, "predictions": preds}, f, indent=2)
    print(json.dumps(scores, indent=2))
    return scores


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--model_name", required=True)
    p.add_argument("--dataset_path", required=True)
    p.add_argument("--results_dir", default="results/mementos")
    p.add_argument("--judge_model", default="gpt-4o")
    p.add_argument("--max_size", type=int, default=None)
    a = p.parse_args()
    main(**vars(a))
