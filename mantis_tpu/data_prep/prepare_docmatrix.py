"""Docmatrix (HuggingFaceM4/Docmatix) -> Mantis-Instruct.

Standalone counterpart of the reference's docmatrix converter
(reference: data/docmatrix/prepare.py): samples ``sample_size`` items
from each of the two subsets (``images``, ``zero-shot-exp``), extracts
per-item image files into ``<save_dir>/images/<index>_<i>.<ext>``, and
flattens the {user, assistant} turn list into alternating
human/gpt conversations with subset-prefixed ids
(``<subset>_<index>``).

The {user, assistant} turn conversion itself is shared with
prepare_cauldron.py (the two reference scripts use the same turn
schema); this module adds the subset handling, per-subset sampling and
image extraction that are unique to docmatrix.

Offline operation: ``--input_json`` rows carry either local image
paths or raw bytes (``{"bytes": ..., "format": "png"}``); the HF
streaming download is gated behind ``--from_hub``.
"""

from __future__ import annotations

import argparse
import itertools
import json
import os

from mantis_tpu.data_prep.schema import make_example, write_dataset

SUBSETS = ("images", "zero-shot-exp")


def convert_turns(texts):
    """[{"user": str, "assistant": str}] -> alternating human/gpt
    (reference: data/docmatrix/prepare.py ``convert_conversations``)."""
    conv = []
    for turn in texts:
        conv.append({"from": "human", "value": turn["user"].strip()})
        conv.append({"from": "gpt", "value": turn["assistant"].strip()})
    return conv


def _extract_images(images, index, image_dir, save_dir):
    """Save in-row image payloads to images/<index>_<i>.<ext> and return
    save_dir-relative paths (reference ``map_save``)."""
    paths = []
    for i, im in enumerate(images or []):
        if isinstance(im, dict) and im.get("bytes") is not None:
            ext = (im.get("format") or "jpg").lower()
            path = os.path.join(image_dir, f"{index}_{i}.{ext}")
            if not os.path.exists(path):
                with open(path, "wb") as f:
                    f.write(im["bytes"])
            paths.append(os.path.relpath(path, save_dir))
        else:
            paths.append(im if isinstance(im, str) else im["path"])
    return paths


def convert(rows_by_subset, sample_size=15000, save_dir=".",
            image_dir=None):
    """rows_by_subset: {subset: [{"images": [...], "texts": [...]}]}.

    Per-subset truncation to sample_size, ids ``<subset>_<index>`` with
    index running over the concatenated sampled rows (matching the
    reference's with_indices map over the combined dataset).
    """
    image_dir = image_dir or os.path.join(save_dir, "images")
    os.makedirs(image_dir, exist_ok=True)
    sampled = [(subset, r)
               for subset in SUBSETS
               for r in itertools.islice(
                   rows_by_subset.get(subset, []), sample_size)]
    out = []
    for index, (subset, r) in enumerate(sampled):
        conv = convert_turns(r["texts"])
        if not conv:
            continue
        n_img = len(r.get("images") or [])
        if n_img and conv[0]["value"].count("<image>") < n_img:
            conv[0]["value"] = "<image>" * (
                n_img - conv[0]["value"].count("<image>")) \
                + conv[0]["value"]
        images = _extract_images(r.get("images"), index, image_dir,
                                 save_dir)
        out.append(make_example(f"{subset}_{index}", conv, images))
    return out


def load_from_hub(sample_size):  # pragma: no cover - needs network
    import datasets

    rows_by_subset = {}
    for subset in SUBSETS:
        ds = datasets.load_dataset("HuggingFaceM4/Docmatix", subset,
                                   split="train", streaming=True)
        rows = []
        for i, item in enumerate(ds):
            if i >= sample_size:
                break
            rows.append({"images": item.get("images"),
                         "texts": item["texts"]})
        rows_by_subset[subset] = rows
    return rows_by_subset


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_json",
                   help='{"images": [...], "zero-shot-exp": [...]} or '
                        "a flat row list (treated as subset 'images')")
    p.add_argument("--from_hub", action="store_true")
    p.add_argument("--sample_size", type=int, default=15000)
    p.add_argument("--save_dir", required=True)
    a = p.parse_args()
    if a.from_hub:
        rows = load_from_hub(a.sample_size)
    else:
        assert a.input_json, "--input_json required without --from_hub"
        with open(a.input_json) as f:
            rows = json.load(f)
        if isinstance(rows, list):
            rows = {"images": rows}
    exs = convert(rows, a.sample_size, a.save_dir)
    print("wrote", write_dataset(exs, a.save_dir))


if __name__ == "__main__":
    main()
