"""MSR-VTT -> video-caption pairs (reference: data/msrvtt/
prepare_msrvtt.py builds retrieval-style video/caption JSON): emits
BOTH the siglip_video contrastive format ({video, text}) and chat-form
video captioning items."""

from __future__ import annotations

import argparse
import json
import os

from mantis_tpu.data_prep.schema import make_example, write_dataset


def convert_contrastive(data, video_dir_rel="videos"):
    """data: MSRVTT_data.json-like {"videos": [{video_id}],
    "sentences": [{video_id, caption}]}"""
    caps = {}
    for s in data.get("sentences", []):
        caps.setdefault(s["video_id"], []).append(s["caption"])
    out = []
    for vid, cc in caps.items():
        out.append({"id": vid,
                    "video": f"{video_dir_rel}/{vid}.mp4",
                    "text": cc[0]})
    return out


def convert_chat(data, video_dir_rel="videos"):
    caps = {}
    for s in data.get("sentences", []):
        caps.setdefault(s["video_id"], []).append(s["caption"])
    out = []
    for vid, cc in caps.items():
        ex = {
            "id": f"msrvtt_{vid}",
            "video": f"{video_dir_rel}/{vid}.mp4",
            "conversations": [
                {"from": "human",
                 "value": "<video> Describe this video concisely."},
                {"from": "gpt", "value": cc[0]},
            ],
        }
        out.append(ex)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_json", required=True)
    p.add_argument("--out_dir", required=True)
    a = p.parse_args()
    with open(a.data_json) as f:
        data = json.load(f)
    os.makedirs(a.out_dir, exist_ok=True)
    with open(os.path.join(a.out_dir, "contrastive.json"), "w") as f:
        json.dump(convert_contrastive(data), f)
    with open(os.path.join(a.out_dir, "chat_video.json"), "w") as f:
        json.dump(convert_chat(data), f)
    print("wrote contrastive.json + chat_video.json")


if __name__ == "__main__":
    main()
