"""Mementos image sequences -> Mantis-Instruct description chats
(reference: data/mementos/prepare.py): csv rows map an image-sequence
folder to a ground-truth description."""

from __future__ import annotations

import argparse
import csv

from mantis_tpu.data_prep.schema import make_example, write_dataset

QUESTION = ("Write a description for the given image sequence in a "
            "single paragraph, what is happening in this episode?")


def convert(rows, folder="single_image_cmc"):
    """rows: csv dicts with image_name|image and gt_description|
    description; images live at images/<folder>/<id>/<frame>.jpg."""
    out = []
    for i, row in enumerate(rows):
        name = row.get("image_name") or row.get("image")
        desc = row.get("gt_description") or row.get("description")
        if not name or not desc:
            continue
        image_id = name.split(".")[0]
        frames = row.get("frames")
        if frames:
            images = [f"images/{folder}/{image_id}/{fr}"
                      for fr in frames.split(";")]
        else:
            images = [f"images/{folder}/{image_id}/0.jpg"]
        q = " ".join(["<image>"] * len(images)) + " " + QUESTION
        out.append(make_example(
            f"mementos_{folder}_{image_id}",
            [{"from": "human", "value": q},
             {"from": "gpt", "value": desc.strip()}],
            images))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--csv", required=True)
    p.add_argument("--folder", default="single_image_cmc")
    p.add_argument("--out_dir", required=True)
    a = p.parse_args()
    with open(a.csv, encoding="latin-1") as f:
        rows = list(csv.DictReader(f))
    print("wrote", write_dataset(convert(rows, a.folder), a.out_dir))


if __name__ == "__main__":
    main()
