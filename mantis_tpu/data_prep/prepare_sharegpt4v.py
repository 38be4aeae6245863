"""ShareGPT4V -> Mantis-Instruct merged multi-image chats (reference:
data/sharegpt4v/prepare.py + multi_vqa grouping pattern): 2-6 single
-image caption items merge into one interleaved multi-image
conversation with per-image 'image i' references."""

from __future__ import annotations

import argparse
import json
import random

from mantis_tpu.data_prep.schema import make_example, write_dataset


def convert(rows, seed=42, group_range=(2, 6)):
    """rows: [{"image": path, "caption": str}]"""
    rng = random.Random(seed)
    out, cur = [], 0
    gi = 0
    while cur < len(rows):
        n = rng.randint(*group_range)
        group = rows[cur:cur + n]
        cur += n
        if len(group) < 2:
            break
        conv = []
        for j, it in enumerate(group):
            q = f"Describe image {j + 1}: <image>."
            conv.append({"from": "human", "value": q})
            conv.append({"from": "gpt", "value": it["caption"].strip()})
        out.append(make_example(
            f"sharegpt4v_{gi}", conv, [it["image"] for it in group]))
        gi += 1
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
