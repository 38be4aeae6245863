"""Spot-the-Diff -> Mantis-Instruct VQA (reference:
data/spot-the-diff/prepare.py): ground-truth difference sentences go
through an LLM that emits one multi-choice and one short-answer JSON
question; both become chats over the image pair."""

from __future__ import annotations

import argparse
import json
import re

from mantis_tpu.data_prep.schema import make_example, write_dataset
from mantis_tpu.judge.openai_utils import openai_completions

PROMPT = """I am transforming a difference-description dataset into \
VQA. Ground-truth differences between two images:
{difference}

Generate one question in both multi-choice and short-answer format.
Overall output format:
Multi-choice:
{{"question": "...", "options": ["A: ...", "..."], "answer": "A"}}
Short-answer:
{{"question": "...", "options": [], "answer": "short answer"}}"""

JSON_RE = re.compile(r"\{.*?\}", re.DOTALL)


def parse_vqa(text: str):
    out = []
    for m in JSON_RE.findall(text):
        try:
            d = json.loads(m)
        except json.JSONDecodeError:
            continue
        if "question" in d and "answer" in d:
            out.append(d)
    return out


def _qa_to_conv(d, n_images=2):
    q = " ".join(["<image>"] * n_images) + " " + d["question"].strip()
    if d.get("options"):
        q += "\n" + "\n".join(d["options"])
        q += ("\nAnswer with the option's letter from the given "
              "choices directly.")
    ans = str(d["answer"]).strip()
    return [{"from": "human", "value": q}, {"from": "gpt", "value": ans}]


def convert(rows, completion_fn, model_name="gpt-4o-mini",
            cache_dir=None):
    """rows: [{"img_id": ..., "sentences": [...]}] with images at
    images/<img_id>.png and images/<img_id>_2.png."""
    prompts = [[{"role": "user", "content": PROMPT.format(
        difference="\n".join(f"{i + 1}. {s}"
                             for i, s in enumerate(r["sentences"])))}]
        for r in rows]
    res = openai_completions(prompts, model_name=model_name,
                             completion_fn=completion_fn,
                             cache_dir=cache_dir)
    out = []
    for i, (r, comp) in enumerate(zip(rows, res["completions"])):
        images = [f"images/{r['img_id']}.png",
                  f"images/{r['img_id']}_2.png"]
        for j, d in enumerate(parse_vqa(comp)):
            out.append(make_example(
                f"spot_the_diff_{i}_{j}", _qa_to_conv(d), images))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_json", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--model_name", default="gpt-4o-mini")
    a = p.parse_args()
    with open(a.input_json) as f:
        rows = json.load(f)
    exs = convert(rows, completion_fn=None, model_name=a.model_name)
    print("wrote", write_dataset(exs, a.out_dir))


if __name__ == "__main__":
    main()
