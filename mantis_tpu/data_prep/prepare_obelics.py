"""OBELICS interleaved web documents -> Mantis-Instruct PLAIN-style
interleaved text (reference: data/obelics/prepare.py: keeps documents
with >=2 downloadable images, hashes image names).  Offline variant:
images are already local paths; text segments interleave with <image>
markers in document order."""

from __future__ import annotations

import argparse
import hashlib
import json

from mantis_tpu.data_prep.schema import make_example, write_dataset


def convert(docs, min_images=2, max_images=8):
    """docs: [{"images": [path|None per segment],
    "texts": [str|None per segment]}]"""
    out = []
    for i, doc in enumerate(docs):
        parts, images = [], []
        for img, txt in zip(doc["images"], doc["texts"]):
            if img:
                images.append(img)
                parts.append("<image>")
            elif txt:
                parts.append(txt.strip())
        if not (min_images <= len(images) <= max_images):
            continue
        body = "\n".join(parts)
        uid = hashlib.sha256(body.encode()).hexdigest()[:16]
        out.append(make_example(
            f"obelics_{uid}",
            # PLAIN-style: the document itself is the target text
            [{"from": "human",
              "value": " ".join(["<image>"] * 0) or
              "Transcribe the interleaved document."},
             {"from": "gpt", "value": body}],
            images))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_jsonl", required=True)
    p.add_argument("--out_dir", required=True)
    a = p.parse_args()
    with open(a.input_jsonl) as f:
        docs = [json.loads(x) for x in f if x.strip()]
    print("wrote", write_dataset(convert(docs), a.out_dir))


if __name__ == "__main__":
    main()
