"""Upload a converted Mantis-Instruct dataset to the HF hub
(reference: data/upload_conv_dataset_to_hf.py + upload_datasets.sh).
Requires egress; everything before the push (schema validation, image
resolution/inlining, HF Dataset construction) runs offline and is
testable via build_hf_dataset."""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List, Optional

from mantis_tpu.data_prep.schema import validate_example

IMAGE_SUFFIXES = (".jpg", ".png", ".jpeg", ".gif")


def resolve_image_path(path: str, image_dir: Optional[str] = None
                       ) -> str:
    """Suffix-probing resolution (reference upload_conv_dataset_to_hf
    load_image: a bare stem tries .jpg/.png/.jpeg/.gif)."""
    if image_dir and not os.path.isabs(path):
        path = os.path.join(image_dir, path)
    if os.path.isfile(path):
        return path
    base, _ = os.path.splitext(path)
    for suf in IMAGE_SUFFIXES:
        if os.path.isfile(base + suf):
            return base + suf
    raise FileNotFoundError(path)


def build_hf_dataset(examples: List[Dict],
                     image_dir: Optional[str] = None,
                     inline_bytes: bool = False):
    """Validated examples -> datasets.Dataset in the Mantis-Instruct
    column layout ({id, images: [{path, bytes}], conversation})."""
    import datasets as hfd

    rows = []
    for ex in examples:
        validate_example(ex)
        images = []
        for im in ex.get("images", []):
            p = im["path"] if isinstance(im, dict) else im
            p = resolve_image_path(p, image_dir)
            b = open(p, "rb").read() if inline_bytes else None
            images.append({"path": os.path.basename(p), "bytes": b})
        rows.append({"id": ex["id"], "images": images,
                     "conversation": ex["conversations"]})
    return hfd.Dataset.from_list(rows)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--repo_id", required=True,
                   help="e.g. TIGER-Lab/Mantis-Instruct")
    p.add_argument("--dataset_name", required=True,
                   help="subset/config name on the hub")
    p.add_argument("--dataset_file", required=True,
                   help="converted train.json (unified schema)")
    p.add_argument("--image_dir", default=None)
    p.add_argument("--split", default="train")
    p.add_argument("--inline_bytes", action="store_true",
                   help="embed image bytes in the parquet rows")
    a = p.parse_args()
    with open(a.dataset_file) as f:
        examples = json.load(f)
    ds = build_hf_dataset(examples, a.image_dir,
                          inline_bytes=a.inline_bytes)
    ds.push_to_hub(a.repo_id, config_name=a.dataset_name,
                   split=a.split)
    print(f"pushed {len(ds)} rows to {a.repo_id}/{a.dataset_name} "
          f"[{a.split}]")


if __name__ == "__main__":
    main()
