"""LLaVA-Pretrain (LCS-558K captions) -> Mantis-Instruct PLAIN-style
caption pairs (reference: data/llava-pretrain; consumed by the
--do_pretrain stage-1 projector recipe with the 'plain' template)."""

from __future__ import annotations

import argparse
import json

from mantis_tpu.data_prep.schema import make_example, write_dataset


def convert(rows, image_dir_rel="images"):
    out = []
    for i, row in enumerate(rows):
        caption = None
        for t in row.get("conversations", []):
            if t.get("from") == "gpt":
                caption = t["value"]
                break
        if caption is None:
            caption = row.get("caption", "")
        out.append(make_example(
            row.get("id", f"llava_pretrain_{i}"),
            [{"from": "human", "value": "<image>"},
             {"from": "gpt", "value": caption.strip()}],
            images=[f"{image_dir_rel}/{row['image']}"]))
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
