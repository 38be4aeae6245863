"""LRV-Instruction pairs -> Mantis-Instruct cross-image QA (reference:
data/lrv/prepare_conv.py): two images' single-image QA lists go to an
LLM that writes questions COMPARING the two (injectable
completion_fn)."""

from __future__ import annotations

import argparse
import json
import re

from mantis_tpu.data_prep.schema import make_example, write_dataset
from mantis_tpu.judge.openai_utils import openai_completions

PROMPT = """Here are some questions and answers related to the first \
image:
{qa1}
Here are some questions and answers related to the second image:
{qa2}
Now, please give me {n} question and its answer which compares the two \
images. Output JSON: [{{"question": "...", "answer": "..."}}]"""

JSON_RE = re.compile(r"\[.*\]", re.DOTALL)


def convert(pairs, completion_fn, model_name="gpt-4o-mini",
            n_questions=2, cache_dir=None):
    """pairs: [{"img1": path, "qa1": [(q, a)], "img2": ..., "qa2": ...}]"""
    def fmt(qa):
        return "\n".join(f"Q: {q} A: {a}" for q, a in qa)

    prompts = [[{"role": "user", "content": PROMPT.format(
        qa1=fmt(p["qa1"]), qa2=fmt(p["qa2"]), n=n_questions)}]
        for p in pairs]
    res = openai_completions(prompts, model_name=model_name,
                             completion_fn=completion_fn,
                             cache_dir=cache_dir)
    out = []
    for i, (pair, comp) in enumerate(zip(pairs, res["completions"])):
        m = JSON_RE.search(comp)
        if not m:
            continue
        try:
            qa = json.loads(m.group(0))
        except json.JSONDecodeError:
            continue
        conv = []
        for j, d in enumerate(qa):
            q = d.get("question", "").strip()
            if j == 0:
                q = "<image> <image> " + q
            conv.append({"from": "human", "value": q})
            conv.append({"from": "gpt",
                         "value": str(d.get("answer", "")).strip()})
        if conv:
            out.append(make_example(
                f"lrv_{i}", conv, [pair["img1"], pair["img2"]]))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_json", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--model_name", default="gpt-4o-mini")
    a = p.parse_args()
    with open(a.input_json) as f:
        pairs = json.load(f)
    exs = convert(pairs, completion_fn=None, model_name=a.model_name)
    print("wrote", write_dataset(exs, a.out_dir))


if __name__ == "__main__":
    main()
