"""Download Mantis-Instruct subsets from the HF hub
(reference: data/download_mantis_instruct.py).  Requires egress."""

from __future__ import annotations

import argparse

SUBSETS = [
    "birds-to-words", "chartqa", "coinstruct", "contrastive_caption",
    "docvqa", "dreamsim", "dvqa", "iconqa", "imagecode", "llava_665k_multi",
    "lrv_multi", "multi_vqa", "nextqa", "nlvr2", "spot-the-diff",
    "star", "visual_story_telling",
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out_dir", required=True)
    p.add_argument("--subsets", nargs="*", default=SUBSETS)
    a = p.parse_args()
    try:
        import datasets as hf_datasets
    except ImportError as e:
        raise SystemExit(f"datasets unavailable: {e}")
    for name in a.subsets:
        print(f"downloading TIGER-Lab/Mantis-Instruct/{name} ...")
        ds = hf_datasets.load_dataset("TIGER-Lab/Mantis-Instruct", name)
        ds.save_to_disk(f"{a.out_dir}/{name}")


if __name__ == "__main__":
    main()
