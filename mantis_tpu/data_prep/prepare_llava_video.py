"""LLaVA-Video conversations -> Mantis-Instruct chat_video items
(reference: data/llava-video/prepare_conv.py / prepare_cap.py: per-video
conversations or captions; frames-as-images or <video> token)."""

from __future__ import annotations

import argparse
import json

from mantis_tpu.data_prep.schema import validate_example, write_dataset


def convert(rows, video_dir_rel="videos"):
    out = []
    for i, r in enumerate(rows):
        convs = []
        src = r.get("conversations") or [
            {"from": "human", "value": "<video> Describe this video."},
            {"from": "gpt", "value": r.get("caption", "")}]
        for j, t in enumerate(src):
            v = t["value"]
            if j == 0 and "<video>" not in v:
                v = "<video> " + v
            convs.append({"from": t["from"], "value": v})
        vid = r.get("video") or r.get("id", f"{i}.mp4")
        ex = {
            "id": r.get("id", f"llava_video_{i}"),
            "video": (vid if "/" in str(vid)
                      else f"{video_dir_rel}/{vid}"),
            "images": [],
            "conversations": convs,
        }
        validate_example({"id": ex["id"], "images": [],
                          "conversations": convs})
        out.append(ex)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_json", required=True)
    p.add_argument("--out_dir", required=True)
    a = p.parse_args()
    with open(a.input_json) as f:
        rows = json.load(f)
    import os

    os.makedirs(a.out_dir, exist_ok=True)
    path = os.path.join(a.out_dir, "train.json")
    with open(path, "w") as f:
        json.dump(convert(rows), f)
    print("wrote", path)


if __name__ == "__main__":
    main()
