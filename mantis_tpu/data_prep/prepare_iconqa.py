"""IconQA -> Mantis-Instruct (reference: data/iconqa/prepare.py):
three sub-tasks — choose_txt (multi-choice text options), choose_img
(pick among image options, answered as 'image i'), fill_in_blank."""

from __future__ import annotations

import argparse
import json
import os
import random
import string

from mantis_tpu.data_prep.schema import make_example, write_dataset


def convert(task_items, seed=42):
    """task_items: [(task, item_dict, rel_dir)] where item_dict is the
    per-folder data.json and rel_dir locates image.png/choices."""
    rng = random.Random(seed)
    out = []
    letters = string.ascii_uppercase
    for i, (task, item, rel_dir) in enumerate(task_items):
        q = item["question"].strip()
        if task == "choose_img":
            images = [f"{rel_dir}/image.png"] + [
                f"{rel_dir}/{c}" for c in item["choices"]]
            head = ("<image>" + q if rng.random() < 0.5
                    else q + "<image>")
            body = head + "".join(
                f"\nImage {j + 1}: <image>"
                for j in range(len(item["choices"])))
            ans = f"image {int(item['answer']) + 1}"
            conv = [{"from": "human",
                     "value": body + "\nAnswer with 'image i' directly."},
                    {"from": "gpt", "value": ans}]
        elif task == "choose_txt":
            images = [f"{rel_dir}/image.png"]
            opts = [f"({letters[j]}) {c}"
                    for j, c in enumerate(item["choices"])]
            head = ("<image>" + q if rng.random() < 0.5
                    else q + "<image>")
            conv = [{"from": "human",
                     "value": head + "\n" + "\n".join(opts)
                     + "\nAnswer with the option's letter from the "
                       "given choices directly."},
                    {"from": "gpt",
                     "value": letters[int(item["answer"])]}]
        else:  # fill_in_blank
            images = [f"{rel_dir}/image.png"]
            head = ("<image>" + q if rng.random() < 0.5
                    else q + "<image>")
            conv = [{"from": "human", "value": head},
                    {"from": "gpt", "value": str(item["answer"])}]
        out.append(make_example(f"iconqa_{task}_{i}", conv, images))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", required=True,
                   help="iconqa split dir containing task subdirs")
    p.add_argument("--out_dir", required=True)
    a = p.parse_args()
    items = []
    for task in ("choose_txt", "choose_img", "fill_in_blank"):
        tdir = os.path.join(a.data_dir, task)
        if not os.path.isdir(tdir):
            continue
        for d in sorted(os.listdir(tdir)):
            f = os.path.join(tdir, d, "data.json")
            if os.path.exists(f):
                with open(f) as fh:
                    items.append((task, json.load(fh), f"{task}/{d}"))
    print("wrote", write_dataset(convert(items), a.out_dir))


if __name__ == "__main__":
    main()
