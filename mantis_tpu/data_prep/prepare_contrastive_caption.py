"""Contrastive captioning -> Mantis-Instruct (reference:
data/contrastive_caption/prepare.py): groups of captioned images become
'describe image i' / 'which image matches this caption' chats —
caption-grounded, no LLM needed for the base variant."""

from __future__ import annotations

import argparse
import json
import random

from mantis_tpu.data_prep.schema import make_example, write_dataset


def convert(groups, seed=42):
    """groups: [{"images": [...], "captions": [...]}]"""
    rng = random.Random(seed)
    out = []
    for gi, g in enumerate(groups):
        n = len(g["images"])
        if n < 2 or n != len(g["captions"]):
            continue
        conv = []
        target = rng.randrange(n)
        q1 = (" ".join(["<image>"] * n)
              + f" Describe image {target + 1} in detail.")
        conv.append({"from": "human", "value": q1})
        conv.append({"from": "gpt", "value": g["captions"][target]})
        pick = rng.randrange(n)
        q2 = (f"Which image does this caption describe: "
              f"\"{g['captions'][pick]}\"? Answer 'image i' directly.")
        conv.append({"from": "human", "value": q2})
        conv.append({"from": "gpt", "value": f"image {pick + 1}"})
        out.append(make_example(f"contrastive_caption_{gi}", conv,
                                g["images"]))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_json", required=True)
    p.add_argument("--out_dir", required=True)
    a = p.parse_args()
    with open(a.input_json) as f:
        groups = json.load(f)
    print("wrote", write_dataset(convert(groups), a.out_dir))


if __name__ == "__main__":
    main()
