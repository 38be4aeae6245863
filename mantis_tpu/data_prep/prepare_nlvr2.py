"""NLVR2 -> Mantis-Instruct (reference: data/nlvr2/prepare.py pattern).

Each item: two images + a statement; answer True/False as a
multi-choice chat."""

from __future__ import annotations

import argparse
import json

from mantis_tpu.data_prep.schema import make_example, write_dataset


def convert(rows, image_dir_rel=""):
    out = []
    for i, row in enumerate(rows):
        label = str(row["label"]).lower() == "true"
        q = (f"<image> <image> {row['sentence']}\n"
             "Is this statement true or false about the two images? "
             "Answer true or false directly.")
        out.append(make_example(
            row.get("uid", i),
            [{"from": "human", "value": q},
             {"from": "gpt", "value": "true" if label else "false"}],
            images=[row["left_image"], row["right_image"]],
        ))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_jsonl", required=True)
    p.add_argument("--out_dir", required=True)
    a = p.parse_args()
    with open(a.input_jsonl) as f:
        rows = [json.loads(x) for x in f]
    path = write_dataset(convert(rows), a.out_dir)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
