"""Leaderboard over results JSONs
(reference: mantis/benchmark/print_leaderborad.py:9-56; plain-text table
since prettytable is not in this image)."""

from __future__ import annotations

import argparse
import json
import os
from pathlib import Path

import numpy as np

DEFAULT_DATASETS = ["nlvr2", "birds-to-words", "mantis_eval",
                    "q-bench2-a1-pair-dev"]


def collect(results_dir: str, datasets=None):
    datasets = datasets or DEFAULT_DATASETS
    rows = {}
    for ds in datasets:
        d = Path(results_dir) / ds
        if not d.is_dir():
            continue
        for f in d.glob("*_shots.json"):
            model = f.stem.rsplit("_", 2)[0]
            with open(f) as fh:
                results = json.load(fh)
            if not results:
                continue
            acc = float(np.mean(
                [r["prediction"]["correct"] for r in results]))
            rows.setdefault(model, {})[ds] = acc
    return rows, datasets


def print_table(rows, datasets):
    cols = ["model"] + datasets + ["avg"]
    widths = [max(len(c), 24) for c in cols]
    line = " | ".join(c.ljust(w) for c, w in zip(cols, widths))
    print(line)
    print("-" * len(line))
    for model, accs in sorted(rows.items()):
        vals = [accs.get(ds) for ds in datasets]
        known = [v for v in vals if v is not None]
        avg = float(np.mean(known)) if known else 0.0
        cells = [model] + [
            f"{v * 100:.2f}" if v is not None else "-" for v in vals
        ] + [f"{avg * 100:.2f}"]
        print(" | ".join(c.ljust(w) for c, w in zip(cells, widths)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--results_dir", default="results")
    p.add_argument("--datasets", nargs="*", default=None)
    a = p.parse_args()
    rows, datasets = collect(a.results_dir, a.datasets)
    print_table(rows, datasets)


if __name__ == "__main__":
    main()
