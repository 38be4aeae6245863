"""Mixture statistics over converted Mantis-Instruct JSONs
(reference: data/dataset_statistics.ipynb as a script): per-dataset
example counts, image-count histogram, turn counts, and text lengths —
the numbers that drive max_num_images/seq-bucket choices in the YAML."""

from __future__ import annotations

import argparse
import json
from collections import Counter


def stats_for(path: str) -> dict:
    with open(path) as f:
        data = (json.load(f) if path.endswith(".json")
                else [json.loads(x) for x in f if x.strip()])
    img_hist = Counter()
    turns = Counter()
    chars = 0
    for ex in data:
        img_hist[len(ex.get("images") or [])] += 1
        key = "conversation" if "conversation" in ex else "conversations"
        convs = ex.get(key, [])
        turns[len(convs)] += 1
        chars += sum(len(t.get("value", t.get("content", "")))
                     for t in convs)
    n = max(len(data), 1)
    return {
        "path": path,
        "examples": len(data),
        "images_per_example": dict(sorted(img_hist.items())),
        "mean_images": sum(k * v for k, v in img_hist.items()) / n,
        "turns_per_example": dict(sorted(turns.items())),
        "mean_chars": chars / n,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_config", default=None,
                   help="YAML mixture (stats per entry)")
    p.add_argument("paths", nargs="*", help="or individual JSON files")
    a = p.parse_args()
    paths = list(a.paths)
    if a.data_config:
        import yaml

        with open(a.data_config) as f:
            paths += [e["path"] for e in yaml.safe_load(f)["data"]]
    total = 0
    for path in paths:
        try:
            s = stats_for(path)
        except FileNotFoundError:
            print(f"{path}: MISSING")
            continue
        total += s["examples"]
        print(json.dumps(s))
    print(f"total examples: {total}")


if __name__ == "__main__":
    main()
