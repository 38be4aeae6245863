"""Q-Bench2 pairs -> Mantis-Instruct multi-choice chat
(reference: data/qbench2/prepare.py — raw items carry a concatenated
img pair path, candidates, and the correct choice letter)."""

from __future__ import annotations

import argparse
import json
import string

from mantis_tpu.data_prep.schema import make_example, write_dataset


def split_pair_path(img_path: str):
    """'a.jpg_cat_b.jpg.jpg' -> ('a.jpg', 'b.jpg')."""
    stem = img_path.replace("\\", "/").split("/")[-1]
    if stem.endswith(".jpg") and "_cat_" in stem:
        stem = stem[: -len(".jpg")]
    left, right = stem.split("_cat_", 1)
    return left, right


def convert(rows, image_dir_rel="images"):
    out = []
    for i, row in enumerate(rows):
        left, right = split_pair_path(row["img_path"])
        letters = string.ascii_uppercase
        opts = [f"({letters[j]}) {c}"
                for j, c in enumerate(row["candidates"])]
        q = ("<image> <image> " + row["question"].strip()
             + "\n" + "\n".join(opts)
             + "\nAnswer with the option's letter from the given "
               "choices directly.")
        ans = row.get("correct_choice")
        if not ans:
            ans = letters[row["candidates"].index(row["correct_ans"])]
        out.append(make_example(
            f"qbench2_{i}",
            [{"from": "human", "value": q},
             {"from": "gpt", "value": ans}],
            images=[f"{image_dir_rel}/{left}", f"{image_dir_rel}/{right}"],
        ))
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
