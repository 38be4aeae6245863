"""Multi-VQA synthesis -> Mantis-Instruct (reference:
data/multi_vqa/prepare.py): groups of captioned images are sent to an
LLM that generates multi-image QA pairs; the 'Question:/Answer:' runs
are parsed into one multi-turn conversation per group.  The LLM call
is injectable (judge.openai_utils protocol) so this runs offline in
tests."""

from __future__ import annotations

import argparse
import json
import re

from mantis_tpu.data_prep.schema import make_example, write_dataset
from mantis_tpu.judge.openai_utils import openai_completions

TEMPLATE = """Here are {n} captions:
{captions}
Please generate 10 independent QA pairs. Each question shall involve \
at least 2 images to answer. Use "image i" to refer to the i-th image \
in your questions.
Output format:
Question: First question?
Answer: The answer to the first question.
..."""

QA_RE = re.compile(
    r"Question:\s*(.+?)\s*Answer:\s*(.+?)(?=\s*Question:|\s*$)",
    re.DOTALL)


def parse_completion(text: str):
    return [(q.strip(), a.strip()) for q, a in QA_RE.findall(text)]


def convert(groups, completion_fn, model_name="gpt-4o-mini",
            cache_dir=None):
    """groups: [{"images": [...], "captions": [...]}]"""
    prompts = []
    for g in groups:
        caps = "".join(f"Image {i + 1}: {c}\n"
                       for i, c in enumerate(g["captions"]))
        prompts.append([{"role": "user", "content": TEMPLATE.format(
            n=len(g["captions"]), captions=caps)}])
    res = openai_completions(prompts, model_name=model_name,
                             completion_fn=completion_fn,
                             cache_dir=cache_dir)
    out = []
    for gi, (g, comp) in enumerate(zip(groups, res["completions"])):
        qa = parse_completion(comp)
        if not qa:
            continue
        conv = []
        for qi, (q, a) in enumerate(qa):
            if qi == 0:
                q = " ".join(["<image>"] * len(g["images"])) + " " + q
            conv.append({"from": "human", "value": q})
            conv.append({"from": "gpt", "value": a})
        out.append(make_example(f"multi_vqa_{gi}", conv, g["images"]))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_json", required=True,
                   help="[{images: [...], captions: [...]}]")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--model_name", default="gpt-4o-mini")
    a = p.parse_args()
    with open(a.input_json) as f:
        groups = json.load(f)
    exs = convert(groups, completion_fn=None, model_name=a.model_name)
    print("wrote", write_dataset(exs, a.out_dir))


if __name__ == "__main__":
    main()
