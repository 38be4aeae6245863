"""BLINK benchmark -> the local eval-driver JSON format.

The reference runs BLINK through an external fork
(reference: mantis/benchmark/README.md:14-16, BLINK_Benchmark repo);
here BLINK rows (the HF dataset schema: image_1..image_4, question,
choices, answer like "(A)") convert into the same local-JSON layout the
generic driver consumes (benchmark/eval.py load_benchmark), so
`eval.py --model_name idefics2:<ckpt> --dataset_path blink/val.json`
just works.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import string


def convert_rows(rows, out_dir: str, subtask: str = "") -> list:
    img_dir = os.path.join(out_dir, "images")
    os.makedirs(img_dir, exist_ok=True)
    out = []
    for i, row in enumerate(rows):
        images = []
        for j in range(1, 5):
            im = row.get(f"image_{j}")
            if im is None:
                continue
            name = f"{subtask}_{i}_{j}.png" if subtask else f"{i}_{j}.png"
            path = os.path.join(img_dir, name)
            if hasattr(im, "save"):
                im.save(path)
            elif isinstance(im, dict) and im.get("bytes"):
                # HF undecoded image feature ({'bytes': ..., 'path': ...})
                with open(path, "wb") as f:
                    f.write(im["bytes"])
            else:
                # never emit a dataset entry pointing at a file that
                # was not written (eval would crash or read stale data)
                raise TypeError(
                    f"row {i} image_{j}: cannot materialize "
                    f"{type(im).__name__} as an image file")
            images.append(f"images/{name}")
        letters = string.ascii_uppercase
        options = [f"({letters[k]}) {c}"
                   for k, c in enumerate(row.get("choices") or [])]
        ans = row.get("answer", "")
        m = re.search(r"[A-Z]", str(ans))
        out.append({
            "id": row.get("idx", f"{subtask}_{i}"),
            "question_type": "multi-choice" if options
            else "short-answer",
            "question": row["question"],
            "images": images,
            "options": options,
            "answer": m.group(0) if m else str(ans),
            "data_source": "BLINK",
            "category": subtask,
        })
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_dir", required=True,
                   help="local HF BLINK dataset dir (datasets.load_from"
                        "_disk) or a JSON of rows")
    p.add_argument("--subtask", default="")
    p.add_argument("--split", default="val")
    p.add_argument("--out_dir", required=True)
    a = p.parse_args()
    if a.dataset_dir.endswith(".json"):
        with open(a.dataset_dir) as f:
            rows = json.load(f)
    else:
        import datasets

        rows = datasets.load_from_disk(a.dataset_dir)[a.split]
    items = convert_rows(rows, a.out_dir, a.subtask)
    path = os.path.join(a.out_dir, f"{a.split}.json")
    with open(path, "w") as f:
        json.dump(items, f)
    print(f"wrote {len(items)} items to {path}")


if __name__ == "__main__":
    main()
