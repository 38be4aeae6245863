"""Generate the shipped debug datasets (reference: data/examples/*).

Deterministic tiny images + conversations used by the train_example
scripts and the multi-arch smoke tests.  Run from the repo root:
    python examples/data/make_example_data.py
"""

import json
import os

import numpy as np
from PIL import Image

HERE = os.path.dirname(os.path.abspath(__file__))

COLORS = ["red", "green", "blue", "yellow"]
SHAPES = ["square", "circle", "stripes", "noise"]


def make_image(i: int, size=(64, 72)) -> Image.Image:
    rng = np.random.RandomState(i)
    arr = np.zeros((size[1], size[0], 3), np.uint8)
    base = [(200, 40, 40), (40, 180, 40), (40, 40, 220),
            (220, 210, 40)][i % 4]
    kind = i % 4
    if kind == 0:
        arr[8:-8, 8:-8] = base
    elif kind == 1:
        yy, xx = np.mgrid[0:size[1], 0:size[0]]
        m = (yy - size[1] / 2) ** 2 + (xx - size[0] / 2) ** 2 < 20 ** 2
        arr[m] = base
    elif kind == 2:
        arr[::6] = base
    else:
        arr = rng.randint(0, 255, arr.shape).astype(np.uint8)
    return Image.fromarray(arr)


def main():
    chat_dir = os.path.join(HERE, "chat")
    os.makedirs(os.path.join(chat_dir, "images"), exist_ok=True)
    for i in range(8):
        make_image(i).save(
            os.path.join(chat_dir, "images", f"img{i}.png"))

    items = []
    for i in range(8):
        a, b = i % 8, (i + 1) % 8
        items.append({
            "id": f"example-{i}",
            "images": [f"images/img{a}.png", f"images/img{b}.png"],
            "conversations": [
                {"from": "human",
                 "value": f"<image> <image> What do the {COLORS[a % 4]} "
                          f"{SHAPES[a % 4]} and the second picture "
                          "show ?"},
                {"from": "gpt",
                 "value": f"The first shows a {COLORS[a % 4]} "
                          f"{SHAPES[a % 4]} and the second a "
                          f"{COLORS[b % 4]} {SHAPES[b % 4]} ."},
                {"from": "human", "value": "Are they the same ?"},
                {"from": "gpt",
                 "value": ("Yes , they match ." if a % 4 == b % 4
                           else "No , they differ .")},
            ],
        })
    with open(os.path.join(chat_dir, "train.json"), "w") as f:
        json.dump(items, f, indent=1)

    sv_dir = os.path.join(HERE, "siglip_video")
    os.makedirs(sv_dir, exist_ok=True)
    sv_items = [{
        "id": f"clip-{i}",
        "images": [f"../chat/images/img{i % 8}.png",
                   f"../chat/images/img{(i + 1) % 8}.png"],
        "text": f"a {COLORS[i % 4]} {SHAPES[i % 4]} next to a "
                f"{COLORS[(i + 1) % 4]} {SHAPES[(i + 1) % 4]}",
    } for i in range(8)]
    with open(os.path.join(sv_dir, "train.json"), "w") as f:
        json.dump(sv_items, f, indent=1)

    # classification debug set (reference: data/examples/classification
    # + cls_training_example.json): images + float label dicts
    cls_dir = os.path.join(HERE, "classification")
    os.makedirs(cls_dir, exist_ok=True)
    cls_items = [{
        "id": f"cls-{i}",
        "images": [f"../chat/images/img{i % 8}.png"],
        "conversations": [
            {"from": "human", "value": "<image> rate this frame"},
            {"from": "gpt", "value": "rated"},
        ],
        "labels": {"visual_quality": 0.25 * (i % 4) / 3 + 0.5,
                   "dynamic_degree": 0.25},
    } for i in range(8)]
    with open(os.path.join(cls_dir, "train.json"), "w") as f:
        json.dump(cls_items, f, indent=1)

    # chat_video debug set (reference: data/examples/chat_video):
    # tiny synthesized clips + <video> conversations
    try:
        import cv2

        cv_dir = os.path.join(HERE, "chat_video")
        os.makedirs(cv_dir, exist_ok=True)
        cv_items = []
        for i in range(4):
            clip = os.path.join(cv_dir, f"clip{i}.avi")
            w = cv2.VideoWriter(clip, cv2.VideoWriter_fourcc(*"MJPG"),
                                5.0, (64, 64))
            for t in range(6):
                w.write(np.asarray(make_image(i + t, (64, 64)))[..., ::-1]
                        .copy())
            w.release()
            cv_items.append({
                "id": f"vid-{i}",
                "video": f"clip{i}.avi",
                "conversations": [
                    {"from": "human",
                     "value": f"<video> What changes across clip {i}?"},
                    {"from": "gpt",
                     "value": f"The {COLORS[i % 4]} {SHAPES[i % 4]} "
                              "shifts between frames ."},
                ],
            })
        with open(os.path.join(cv_dir, "train.json"), "w") as f:
            json.dump(cv_items, f, indent=1)
    except ImportError:
        print("cv2 unavailable; skipped chat_video examples")
    print("example data written under", HERE)


if __name__ == "__main__":
    main()
