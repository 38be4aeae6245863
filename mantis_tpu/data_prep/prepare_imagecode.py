"""ImageCoDe -> Mantis-Instruct retrieval questions
(reference: data/imagecode/prepare.py): 10 minimally-contrastive images
+ a description; ask which image matches, in 'Image i' or multi-choice
letter form."""

from __future__ import annotations

import argparse
import json
import random
import string

from mantis_tpu.data_prep.schema import make_example, write_dataset


def convert(rows, seed=42):
    """rows: [{"image_set": str, "images": [paths sorted],
    "description": str, "image_index": int}]"""
    rng = random.Random(seed)
    out = []
    for i, r in enumerate(rows):
        n = len(r["images"])
        idx = int(r["image_index"])
        if rng.random() < 0.5:
            q = ("Given a detailed description, retrieve the target "
                 "image among 10 minimally contrastive images"
                 "\nDescription:\n" + r["description"])
        else:
            q = (f"Given this detailed description:\n{r['description']}"
                 "\nWhich image provided best matches the description?")
        if rng.random() < 0.5:
            imgs = "<image>" * n
            q = imgs + q if rng.random() < 0.5 else q + imgs
            ans = f"Answer: Image {idx + 1}"
        else:
            q += "\n" + "\n".join(
                f"{string.ascii_uppercase[j]}. <image>" for j in range(n))
            ans = f"Answer: {string.ascii_uppercase[idx]}"
        out.append(make_example(
            f"ImageCoDe-{r.get('image_set', i)}-{idx}",
            [{"from": "human", "value": q},
             {"from": "gpt", "value": ans}], r["images"]))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_json", required=True)
    p.add_argument("--out_dir", required=True)
    a = p.parse_args()
    with open(a.input_json) as f:
        rows = json.load(f)
    print("wrote", write_dataset(convert(rows), a.out_dir))


if __name__ == "__main__":
    main()
