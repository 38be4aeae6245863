"""MMMU multi-image subset -> eval-benchmark JSON (reference:
data/mmmu/prepare.py): items from the 30 MMMU subjects that carry MORE
THAN ONE image become multi-choice/short-answer eval items; inline
``<image N>`` markers normalize to plain ``<image>``, and PIL images are
materialized under an images/ dir next to the output file."""

from __future__ import annotations

import argparse
import json
import os
import re
from typing import Dict, List

MMMU_SUBSETS = [
    "Accounting", "Agriculture", "Architecture_and_Engineering", "Art",
    "Art_Theory", "Basic_Medical_Science", "Biology", "Chemistry",
    "Clinical_Medicine", "Computer_Science", "Design",
    "Diagnostics_and_Laboratory_Medicine", "Economics", "Electronics",
    "Energy_and_Power", "Finance", "Geography", "History", "Literature",
    "Manage", "Marketing", "Materials", "Math",
    "Mechanical_Engineering", "Music", "Pharmacy", "Physics",
    "Psychology", "Public_Health", "Sociology",
]

_IMG_MARK = re.compile(r"<image \d+>")


def _options(raw) -> List[str]:
    """MMMU stores options as a stringified python list."""
    if isinstance(raw, str):
        import ast

        return list(ast.literal_eval(raw))
    return list(raw or [])


def convert(rows, image_out_dir: str, rel_to: str) -> List[Dict]:
    """rows: dicts with id/question/options/answer and image_1..image_7
    (PIL images or None).  Saves images, returns eval items with >1
    image only (the multi-image filter, reference prepare.py:44-46)."""
    os.makedirs(image_out_dir, exist_ok=True)
    out = []
    for item in rows:
        images = [item.get(f"image_{i}") for i in range(1, 8)]
        images = [im for im in images if im is not None]
        if len(images) <= 1:
            continue
        opts = _options(item.get("options"))
        qtype = "multi-choice" if len(opts) > 1 else "short-answer"
        paths = []
        for i, im in enumerate(images):
            fmt = (getattr(im, "format", None) or "png").lower()
            p = os.path.join(image_out_dir, f"{item['id']}_{i}.{fmt}")
            if not os.path.exists(p):
                im.save(p)
            paths.append(os.path.relpath(p, rel_to))
        out.append({
            "id": "MMMU_" + str(item["id"]),
            "question_type": qtype,
            "question": _IMG_MARK.sub("<image>", item["question"]),
            "images": paths,
            "options": opts,
            "answer": item["answer"],
            "data_source": "MMMU",
            "category": "STEM reasoning",
        })
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--output_file", default="./data/test.json")
    p.add_argument("--image_output_dir", default="./data/images")
    p.add_argument("--split", default="validation")
    a = p.parse_args()
    from datasets import load_dataset

    rows = []
    for subset in MMMU_SUBSETS:
        ds = load_dataset("MMMU/MMMU", subset)[a.split]
        rows.extend(ds)
    items = convert(rows, a.image_output_dir,
                    os.path.dirname(a.output_file) or ".")
    with open(a.output_file, "w") as f:
        json.dump(items, f, indent=4)
    print(f"wrote {len(items)} multi-image items to {a.output_file}")


if __name__ == "__main__":
    main()
