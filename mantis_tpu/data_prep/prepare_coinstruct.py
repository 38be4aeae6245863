"""Co-Instruct (llava-format) -> Mantis-Instruct
(reference: data/coinstruct/prepare.py): items sharing the same image
set are merged into one multi-turn conversation, keyed by the md5 of
the joined image list."""

from __future__ import annotations

import argparse
import hashlib
import json

from mantis_tpu.data_prep.schema import make_example, write_dataset


def convert(rows, image_dir_rel="images"):
    merged = {}
    order = []
    for item in rows:
        imgs = item["image"]
        if isinstance(imgs, str):
            imgs = [imgs]
        key = hashlib.md5("".join(imgs).encode()).hexdigest()
        if key not in merged:
            merged[key] = {
                "id": f"coinstruct_{len(merged)}",
                "images": [f"{image_dir_rel}/{im}" for im in imgs],
                "conversations": [],
            }
            order.append(key)
        merged[key]["conversations"].extend(item["conversations"])
    out = []
    for key in order:
        ex = merged[key]
        # normalize <image>\n prefixes the llava format uses
        convs = [{"from": t["from"],
                  "value": t["value"].replace("<image>\n", "<image> ")}
                 for t in ex["conversations"]]
        n_img_tokens = sum(t["value"].count("<image>") for t in convs)
        if n_img_tokens > len(ex["images"]):
            continue  # corrupt merge; reference skips these too
        out.append(make_example(ex["id"], convs, ex["images"]))
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
