"""LLaVA-1.5 mix665k -> llava_665k_multi (reference:
data/llava-instruct/prepare.py).

Merges runs of 1-4 single-image LLaVA items into multi-image
conversations the way the reference does:

  - with p=0.5 an item stays single (its <image> tokens stripped, one
    re-added at the merge step);
  - otherwise 2-4 consecutive items merge: with p=0.03 the original
    inline <image> tokens are kept in place (interleaved layout),
    else every "image" mention is renamed to a positional name drawn
    from the reference's synonym lists ("left image", "image 2", ...),
    the QA pairs are shuffled, and k "<image>" tokens are prepended or
    appended (p=0.5 each) to the first turn;
  - text-only items pass through with an empty image list;
  - conversations whose estimated token length exceeds the content
    budget split into balanced parts (even turn counts).

Deviation: the reference estimates prompt length with the HF LLaVA
tokenizer; offline here, length is estimated as chars/4 (+256
patches/image), which only shifts the split threshold, never the
conversation content.
"""

from __future__ import annotations

import argparse
import json
import random

from mantis_tpu.data_prep.schema import make_example, write_dataset

# reference prepare.py positional-name synonym lists
NAMES = {
    2: [["left image", "first image", "image 1", "image one",
         "image on the left", "image on the left side",
         "image on the left hand side", "image on the left-hand side"],
        ["right image", "second image", "image 2", "image two",
         "image on the right", "image on the right side",
         "image on the right hand side",
         "image on the right-hand side"]],
    3: [["left image", "first image", "image 1", "image one",
         "image on the left", "image on the left side",
         "image on the left hand side", "image on the left-hand side",
         "initial image"],
        ["middle image", "second image", "image 2", "image two",
         "image on the middle", "image on the middle side",
         "central image"],
        ["right image", "third image", "image 3", "image three",
         "image on the right", "image on the right side",
         "image on the right hand side", "image on the right-hand side",
         "final image"]],
}


def _estimate_tokens(convs, n_images, num_image_patches):
    chars = sum(len(t["value"]) for t in convs)
    return chars // 4 + num_image_patches * n_images


def _lower_first_alpha(s):
    s = s.strip(" \n")
    for k, ch in enumerate(s):
        if ch.isalpha():
            return s[:k] + s[k].lower() + s[k + 1:]
    return s


def convert(rows, seed=42, content_length=4096, num_image_patches=256):
    rng = random.Random(seed)
    with_image = [r for r in rows if "image" in r]
    without_image = [r for r in rows if "image" not in r]
    out = []

    def emit(items, convs, add_image_token, part=None):
        k = len(items)
        convs = [dict(t) for t in convs]
        if add_image_token:
            if rng.random() < 0.5:
                convs[0]["value"] = "<image> " * k + convs[0]["value"]
            else:
                convs[0]["value"] += " <image>" * k
        ex_id = "llava_665k_multi_" + "-".join(
            str(x["id"]) for x in items)
        if part is not None:
            ex_id += f"_part{part}"
        out.append(make_example(ex_id, convs,
                                [x["image"] for x in items]))

    i = 0
    while i < len(with_image):
        k = 1 if rng.random() < 0.5 else rng.randint(2, 4)
        items = with_image[i:i + k]
        k = len(items)
        if k == 1:
            convs = [dict(t) for t in items[0]["conversations"]]
            for c in convs:
                if c["from"] == "human":
                    c["value"] = c["value"].replace(
                        "<image>", "").strip(" \n")
            add_image_token = True
        elif rng.random() < 0.03:
            # interleaved: keep each item's inline <image> tokens
            convs = [dict(t) for item in items
                     for t in item["conversations"]]
            add_image_token = False
        else:
            pairs = []
            for j, item in enumerate(items):
                name_pool = (NAMES[k][j] if k in NAMES
                             else [f"image {j + 1}"])
                iconvs = [dict(t) for t in item["conversations"]]
                for c in iconvs:
                    if c["from"] != "human":
                        continue
                    c["value"] = c["value"].replace("<image>", "")
                    name = rng.choice(name_pool)
                    if "image" in c["value"]:
                        c["value"] = c["value"].replace("image", name)
                    else:
                        c["value"] = (f"For the {name}, "
                                      f"{_lower_first_alpha(c['value'])}")
                for p in range(0, len(iconvs), 2):
                    pairs.append(iconvs[p:p + 2])
            rng.shuffle(pairs)
            convs = [t for pair in pairs for t in pair]
            add_image_token = True
        est = _estimate_tokens(convs, k, num_image_patches)
        if est > content_length:
            n_parts = est // content_length + 1
            per = len(convs) // n_parts + 1
            per += per % 2          # even turn counts per part
            parts = [convs[p:p + per]
                     for p in range(0, len(convs), per)]
            for j, part in enumerate(parts):
                emit(items, part, add_image_token, part=j)
        else:
            emit(items, convs, add_image_token)
        i += k

    for item in without_image:
        out.append(make_example(f"llava_665k_no_image_{item['id']}",
                                item["conversations"], []))
    rng.shuffle(out)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_json", required=True,
                   help="llava_v1_5_mix665k.json")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--content_length", type=int, default=4096)
    a = p.parse_args()
    with open(a.input_json) as f:
        rows = json.load(f)
    print("wrote", write_dataset(
        convert(rows, a.seed, a.content_length), a.out_dir))


if __name__ == "__main__":
    main()
