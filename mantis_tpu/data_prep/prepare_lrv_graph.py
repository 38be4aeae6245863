"""LRV pairwise "graph" synthesis -> Mantis-Instruct (reference:
data/lrv_graph/prepare_conv.py): consecutive LRV images are paired; each
pair's single-image QA lists are replayed as two conversation segments
("we now look at another image" pivot), then an LLM generates extra
questions COMPARING the two images.  The LLM call is injectable
(judge.openai_utils protocol) so this runs offline in tests."""

from __future__ import annotations

import argparse
import json
from string import Template
from typing import Dict, List, Tuple

from mantis_tpu.data_prep.schema import make_example, write_dataset
from mantis_tpu.judge.openai_utils import openai_completions

PROMPT_TEMPLATE = Template("""
Here are some questions and answers related to the first image:

${image1}

Here are some questions and answers related to the second image:

${image2}

Now, please give me ${question_ct} question and its answer which \
compares the two images. Each question should ask about the details \
in both image. The output should be in the following json format, do \
not include extra spacing or new line character:
[{"question": "...", "answer": "..."}]
""")


def group_by_image(rows) -> Dict[str, List[Tuple[str, str]]]:
    """rows: [{image_id, question, answer}] -> image_id -> QA list
    (reference prepare_conv.py:21-38)."""
    out: Dict[str, List[Tuple[str, str]]] = {}
    for r in rows:
        out.setdefault(r["image_id"], []).append(
            (r["question"], r["answer"]))
    return out


def _segment(qas: List[Tuple[str, str]], position: int):
    intro = ("<image> " if position == 1
             else "<image> we now look at another image. ")
    conv = [{"from": "human", "value": intro + qas[0][0]},
            {"from": "gpt", "value": qas[0][1]}]
    for q, a in qas[1:]:
        conv.append({"from": "human", "value": q})
        conv.append({"from": "gpt", "value": a})
    return conv


def convert(rows, completion_fn, model_name="gpt-4o-mini",
            question_ct: int = 3, image_dir_rel="image",
            cache_dir=None):
    data = group_by_image(rows)
    ids = list(data.keys())
    pairs = [(ids[i], ids[i + 1]) for i in range(0, len(ids) - 1, 2)]
    prompts = []
    for a, b in pairs:
        prompt = PROMPT_TEMPLATE.substitute(
            image1="\n".join(f"Question: {q} Answer: {an}"
                             for q, an in data[a]),
            image2="\n".join(f"Question: {q} Answer: {an}"
                             for q, an in data[b]),
            question_ct=str(question_ct))
        prompts.append([{"role": "user", "content": prompt}])
    res = openai_completions(prompts, model_name=model_name,
                             completion_fn=completion_fn,
                             cache_dir=cache_dir)
    out = []
    for i, ((a, b), comp) in enumerate(zip(pairs, res["completions"])):
        try:
            extra = []
            for qa in json.loads(comp):
                extra.append({"from": "human", "value": qa["question"]})
                extra.append({"from": "gpt", "value": qa["answer"]})
        except (json.JSONDecodeError, KeyError, TypeError):
            continue  # reference drops unparseable completions too
        conv = _segment(data[a], 1) + _segment(data[b], 2) + extra
        out.append(make_example(
            f"lrv_graph_{i}", conv,
            [f"{image_dir_rel}/{a}.jpg", f"{image_dir_rel}/{b}.jpg"]))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_json", required=True,
                   help="LRV train.json ([{image_id,question,answer}])")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--model_name", default="gpt-4o-mini")
    p.add_argument("--question_ct", type=int, default=3)
    a = p.parse_args()
    with open(a.input_json) as f:
        rows = json.load(f)
    examples = convert(rows, None, model_name=a.model_name,
                       question_ct=a.question_ct)
    write_dataset(examples, a.out_dir)
    print(f"wrote {len(examples)} paired conversations")


if __name__ == "__main__":
    main()
