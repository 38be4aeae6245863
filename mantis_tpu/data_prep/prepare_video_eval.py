"""VideoFeedback (video_eval) -> Mantis-Instruct (reference:
data/video_eval/prepare_conv.py): the TIGER-Lab/VideoFeedback
'annotated' + 'real' splits already carry conversations; frames are
re-rooted under images/<prefix>/ (prefix = the part of the first frame
name before '_'), and items whose frames are missing on disk are
dropped (the reference asserts instead)."""

from __future__ import annotations

import argparse
import os
from typing import Dict, List

from mantis_tpu.data_prep.schema import make_example, write_dataset


def reroot_images(images: List[str]) -> List[str]:
    prefix = images[0].split("_")[0]
    return [f"images/{prefix}/{im}" for im in images]


def convert(rows, root: str = None, drop_missing: bool = True
            ) -> List[Dict]:
    """rows: VideoFeedback items {id, images, conversations}."""
    out = []
    for item in rows:
        images = reroot_images(item["images"])
        if root is not None and drop_missing:
            if not all(os.path.exists(os.path.join(root, p))
                       for p in images):
                continue
        out.append(make_example(item["id"], item["conversations"],
                                images))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out_dir", required=True)
    p.add_argument("--splits", nargs="+",
                   default=["annotated", "real"])
    p.add_argument("--check_images_under", default=None)
    a = p.parse_args()
    from datasets import load_dataset

    rows = []
    for name in a.splits:
        rows.extend(load_dataset("TIGER-Lab/VideoFeedback", name=name,
                                 split="train"))
    examples = convert(rows, root=a.check_images_under,
                       drop_missing=a.check_images_under is not None)
    write_dataset(examples, a.out_dir)
    print(f"wrote {len(examples)} video-eval conversations")


if __name__ == "__main__":
    main()
