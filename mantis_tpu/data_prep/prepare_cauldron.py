"""Cauldron / Docmatrix -> Mantis-Instruct (reference:
data/cauldron/prepare.py + data/docmatrix/prepare.py share the same
{user, assistant} turn schema: multi-turn per image set)."""

from __future__ import annotations

import argparse
import json

from mantis_tpu.data_prep.schema import make_example, write_dataset


def convert(rows, source="cauldron", image_dir_rel="images"):
    """rows: [{"images": [paths], "texts": [{"user": str,
    "assistant": str}]}]"""
    out = []
    for i, r in enumerate(rows):
        conv = []
        for j, turn in enumerate(r["texts"]):
            u = turn["user"].strip()
            if j == 0:
                n = len(r.get("images") or [])
                if u.count("<image>") < n:
                    u = "<image>" * (n - u.count("<image>")) + u
            conv.append({"from": "human", "value": u})
            conv.append({"from": "gpt",
                         "value": turn["assistant"].strip()})
        if not conv:
            continue
        images = [im if "/" in str(im) else f"{image_dir_rel}/{im}"
                  for im in (r.get("images") or [])]
        out.append(make_example(f"{source}_{i}", conv, images))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_json", required=True)
    p.add_argument("--source", default="cauldron",
                   choices=["cauldron", "docmatrix"])
    p.add_argument("--out_dir", required=True)
    a = p.parse_args()
    with open(a.input_json) as f:
        rows = json.load(f)
    print("wrote", write_dataset(convert(rows, a.source), a.out_dir))


if __name__ == "__main__":
    main()
