"""ChartQA / DocVQA / DVQA / AI2D -> one unified single-image VQA set
(reference: data/hybrid_single_image_vqa/prepare_{chartqa,docvqa,dvqa,
ai2d}.py merged by prepare.py)."""

from __future__ import annotations

import argparse
import json
import string

from mantis_tpu.data_prep.schema import make_example, write_dataset


def convert(rows, source="chartqa"):
    """rows: [{"image": path, "question": str, "answer": str,
    "options": [..]?}]"""
    out = []
    for i, r in enumerate(rows):
        q = "<image> " + r["question"].strip()
        opts = r.get("options") or []
        if opts:
            letters = string.ascii_uppercase
            q += "\n" + "\n".join(
                f"({letters[j]}) {o}" for j, o in enumerate(opts))
            q += ("\nAnswer with the option's letter from the given "
                  "choices directly.")
            ans = r["answer"]
            if ans in opts:
                ans = letters[opts.index(ans)]
        else:
            q += "\nAnswer the question using a single word or phrase."
            ans = str(r["answer"])
        out.append(make_example(
            f"{source}_{i}",
            [{"from": "human", "value": q},
             {"from": "gpt", "value": ans}], [r["image"]]))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_json", required=True)
    p.add_argument("--source", default="chartqa",
                   choices=["chartqa", "docvqa", "dvqa", "ai2d"])
    p.add_argument("--out_dir", required=True)
    a = p.parse_args()
    with open(a.input_json) as f:
        rows = json.load(f)
    print("wrote", write_dataset(convert(rows, a.source), a.out_dir))


if __name__ == "__main__":
    main()
