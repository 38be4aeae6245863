"""Download + unpack the MVBench video benchmark
(reference: data/mvbench/prepare.sh — git-clones
OpenGVLab/MVBench at a pinned revision and unzips the per-source video
archives).  Requires egress; the eval driver
(benchmark/eval_on_mvbench.py) consumes the resulting json/ + video/
layout directly."""

from __future__ import annotations

import argparse
import os
import subprocess
import zipfile

PINNED_REV = "5461410310c8d69b5d63e664bfc5d76dab90054c"
ARCHIVES = [
    "clevrer.zip", "FunQA_test.zip", "Moments_in_Time_Raw.zip",
    "nturgbd.zip", "perception.zip", "scene_qa.zip", "ssv2_video.zip",
    "star.zip", "sta.zip", "tvqa.zip", "vlnqa.zip",
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out_dir", required=True)
    p.add_argument("--revision", default=PINNED_REV)
    a = p.parse_args()
    repo = os.path.join(a.out_dir, "MVBench")
    if not os.path.isdir(repo):
        subprocess.check_call(
            ["git", "clone",
             "https://huggingface.co/datasets/OpenGVLab/MVBench", repo])
    subprocess.check_call(["git", "-C", repo, "checkout", a.revision])
    video_dir = os.path.join(repo, "video")
    for name in ARCHIVES:
        path = os.path.join(video_dir, name)
        if not os.path.exists(path):
            print(f"missing archive {name}, skipping")
            continue
        print(f"unzipping {name} ...")
        with zipfile.ZipFile(path) as z:
            z.extractall(video_dir)
    print(f"MVBench ready under {repo} "
          "(json/ annotations + video/ sources)")


if __name__ == "__main__":
    main()
