"""DreamSim triplets -> Mantis-Instruct similarity questions
(reference: data/dream_sim/prepare.py): a reference image + two
candidates; multi-choice and short-answer variants asking which
candidate is more similar."""

from __future__ import annotations

import argparse
import json
import random

from mantis_tpu.data_prep.schema import make_example, write_dataset

MC_TEMPLATE = (
    "Answer the following multiple-choice question:\n"
    "Here are three images: <image> <image> <image>. If image 1 is the "
    "reference image, which image of the other two is more similar to "
    "the reference image?\nOptions:\n(A) Image 2\n(B) Image 3\n"
    "Answer with the option's letter from the given choices directly.")
SA_TEMPLATE = (
    "Answer the following question:\n"
    "Here are three images: <image> <image> <image>. If image 1 is the "
    "reference image, which image of the other two is more similar to "
    "the reference image? Answer 'image 2' or 'image 3' directly.")


def convert(rows, seed=42):
    rng = random.Random(seed)
    out = []
    for i, row in enumerate(rows):
        # row: {"ref": path, "img_left": path, "img_right": path,
        #       "left_is_closer": bool}
        closer_left = bool(row["left_is_closer"])
        images = [row["ref"], row["img_left"], row["img_right"]]
        if rng.random() < 0.5:
            conv = [{"from": "human", "value": MC_TEMPLATE},
                    {"from": "gpt",
                     "value": "A" if closer_left else "B"}]
        else:
            conv = [{"from": "human", "value": SA_TEMPLATE},
                    {"from": "gpt",
                     "value": "image 2" if closer_left else "image 3"}]
        out.append(make_example(f"dream_sim_{i}", conv, images))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_jsonl", required=True)
    p.add_argument("--out_dir", required=True)
    a = p.parse_args()
    with open(a.input_jsonl) as f:
        rows = [json.loads(x) for x in f if x.strip()]
    print("wrote", write_dataset(convert(rows), a.out_dir))


if __name__ == "__main__":
    main()
