"""Birds-to-Words -> Mantis-Instruct VQA (reference:
data/birds-to-words/prepare.py): each row has two bird images and a
difference description; an LLM converts the description into a
multi-choice question (injectable completion_fn)."""

from __future__ import annotations

import argparse
import json

from mantis_tpu.data_prep.schema import make_example, write_dataset
from mantis_tpu.judge.openai_utils import openai_completions
from mantis_tpu.data_prep.prepare_spot_the_diff import parse_vqa

VQA_PROMPT = """The original dataset takes 2 bird images and a text \
describing the difference between them; transform it into multi-choice \
VQA.  Ground truth description:
{difference}

Output format:
{{"question": "...", "options": ["A: ...", "..."], "answer": "A"}}"""


def convert(rows, completion_fn, model_name="gpt-4o-mini",
            cache_dir=None):
    """rows: [{"img1": path, "img2": path, "description": str}]"""
    prompts = [[{"role": "user", "content": VQA_PROMPT.format(
        difference=r["description"])}] for r in rows]
    res = openai_completions(prompts, model_name=model_name,
                             completion_fn=completion_fn,
                             cache_dir=cache_dir)
    out = []
    for i, (r, comp) in enumerate(zip(rows, res["completions"])):
        parsed = parse_vqa(comp)
        if not parsed:
            continue
        d = parsed[0]
        q = "<image> <image> " + d["question"].strip()
        if d.get("options"):
            q += "\n" + "\n".join(d["options"])
            q += ("\nAnswer with the option's letter from the given "
                  "choices directly.")
        out.append(make_example(
            f"birds_to_words_{i}",
            [{"from": "human", "value": q},
             {"from": "gpt", "value": str(d["answer"]).strip()}],
            images=[r["img1"], r["img2"]]))
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
