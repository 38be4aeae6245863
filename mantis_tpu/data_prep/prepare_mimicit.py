"""MIMIC-IT -> Mantis-Instruct (reference: data/mimicit/prepare.py):
instruction items carry image-id lists and related-instruction links;
related items merge into one multi-turn conversation over the shared
image set."""

from __future__ import annotations

import argparse
import json

from mantis_tpu.data_prep.schema import make_example, write_dataset


def convert(rows, id_to_image):
    """rows: [{"id", "images": [ids], "instruction", "answer",
    "related instructions": [ids]}]; id_to_image: image id -> path."""
    convs = {}
    order = []
    for item in rows:
        try:
            images = [id_to_image[i] for i in item["images"]]
        except KeyError:
            continue  # reference skips items with missing images
        related = item.get("related instructions") or []
        host = next((r for r in related if r in convs), None)
        turns = [{"from": "human", "value": item["instruction"]},
                 {"from": "gpt", "value": item["answer"]}]
        if host is not None:
            convs[host]["conversations"].extend(turns)
        else:
            convs[item["id"]] = {
                "id": "MIMICIT-" + item["id"],
                "images": images,
                "conversations": turns,
            }
            order.append(item["id"])
    out = []
    for key in order:
        c = convs[key]
        first = c["conversations"][0]
        n = len(c["images"])
        if first["value"].count("<image>") < n:
            first["value"] = "<image>" * (
                n - first["value"].count("<image>")) + first["value"]
        out.append(make_example(c["id"], c["conversations"],
                                c["images"]))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--instructions_json", required=True)
    p.add_argument("--image_map_json", required=True)
    p.add_argument("--out_dir", required=True)
    a = p.parse_args()
    with open(a.instructions_json) as f:
        rows = json.load(f)
    with open(a.image_map_json) as f:
        id_to_image = json.load(f)
    print("wrote", write_dataset(convert(rows, id_to_image), a.out_dir))


if __name__ == "__main__":
    main()
