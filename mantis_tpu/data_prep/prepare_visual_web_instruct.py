"""VisualWebInstruct -> Mantis-Instruct (reference:
data/visual_web_instruct/prepare.py: QA pairs keyed by md5(q+a) with
one saved image each)."""

from __future__ import annotations

import argparse
import hashlib
import json

from mantis_tpu.data_prep.schema import make_example, write_dataset


def convert(rows, image_dir_rel="image"):
    out = []
    for r in rows:
        q, a = r["question"].strip(), str(r["answer"]).strip()
        uid = hashlib.md5((q + a).encode()).hexdigest()
        image = r.get("image") or f"{image_dir_rel}/{uid}.jpg"
        if "<image>" not in q:
            q = "<image> " + q
        out.append(make_example(
            f"vwi_{uid}",
            [{"from": "human", "value": q},
             {"from": "gpt", "value": a}], [image]))
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
