"""LLaVA-Instruct-style single-image chats -> Mantis-Instruct
(reference: data/llava_instruct/prepare.py pattern)."""

from __future__ import annotations

import argparse
import json

from mantis_tpu.data_prep.schema import make_example, write_dataset


def convert(rows, image_dir_rel=""):
    out = []
    for row in rows:
        convs = row["conversations"]
        if convs and convs[0]["from"] != "human":
            convs = convs[1:]
        if len(convs) < 2:
            continue
        out.append(make_example(
            row.get("id", len(out)), convs,
            images=[row["image"]] if "image" in row else []))
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
