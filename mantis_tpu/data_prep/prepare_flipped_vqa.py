"""NExT-QA / STAR video QA -> Mantis-Instruct (reference:
data/flipped_vqa/prepare_nextqa.py, prepare_star.py): multiple-choice
video questions rendered over 8 pre-extracted frames per video; all
questions about one video merge into one multi-turn conversation."""

from __future__ import annotations

import argparse
import csv
import json
from typing import Dict, List

from mantis_tpu.data_prep.schema import make_example, write_dataset

NUM_FRAMES = 8
LETTERS = "ABCDE"


def _qa_text(question: str, options: List[str], answer_idx: int):
    q = question.capitalize().strip()
    if not q.endswith("?"):
        q += "?"
    opts = [f"{LETTERS[i]}: {o}" for i, o in enumerate(options)]
    human = q + "\n" + "\n".join(opts) + "\n"
    return human, opts[answer_idx]


def _merge_by_video(items, frames_dir_rel: str, source: str):
    """items: (video_id, question, options, answer_idx); one example
    per video, conversations concatenated (reference
    prepare_nextqa.py:44-63)."""
    by_vid: Dict[str, Dict] = {}
    for vid, question, options, answer_idx in items:
        human, gpt = _qa_text(question, options, answer_idx)
        conv = [{"from": "human", "value": human},
                {"from": "gpt", "value": gpt}]
        if vid not in by_vid:
            images = [f"{frames_dir_rel}/{vid}_{i}.jpg"
                      for i in range(NUM_FRAMES)]
            by_vid[vid] = make_example(f"{source}_{vid}", conv, images)
        else:
            by_vid[vid]["conversations"].extend(conv)
    return list(by_vid.values())


def convert_nextqa(csv_rows, frames_dir_rel="nextqa/images"):
    """csv_rows: dicts with video/question/a0..a4/answer (the NExT-QA
    train.csv columns)."""
    items = []
    for r in csv_rows:
        options = [r[f"a{i}"] for i in range(5)]
        items.append((str(r["video"]), r["question"], options,
                      int(r["answer"])))
    return _merge_by_video(items, frames_dir_rel, "nextqa")


def convert_star(star_items, frames_dir_rel="star/images"):
    """star_items: STAR_train.json entries with
    video_id/question/choices[{choice}]/answer."""
    items = []
    for r in star_items:
        options = [c["choice"] for c in r["choices"]]
        items.append((str(r["video_id"]), r["question"], options,
                      options.index(r["answer"])))
    return _merge_by_video(items, frames_dir_rel, "star")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nextqa_csv", default=None)
    p.add_argument("--star_json", default=None)
    p.add_argument("--out_dir", required=True)
    a = p.parse_args()
    examples = []
    if a.nextqa_csv:
        with open(a.nextqa_csv) as f:
            examples.extend(convert_nextqa(list(csv.DictReader(f))))
    if a.star_json:
        with open(a.star_json) as f:
            examples.extend(convert_star(json.load(f)))
    write_dataset(examples, a.out_dir)
    print(f"wrote {len(examples)} merged video conversations")


if __name__ == "__main__":
    main()
