"""Synthetic multi-image data -> Mantis-Instruct (reference:
data/synthetic/prepare.py): LLM-authored examples carry per-image
text-to-image prompts; a diffusion model renders each prompt and the
result is either a conversation item or an eval-style multi-choice
item.  The image synthesizer is injectable (``synthesize_fn(text) ->
PIL.Image``) — the reference hard-wires diffusers sdxl-turbo on CUDA,
which does not exist here; any JAX/other generator (or a stub in
tests) plugs in."""

from __future__ import annotations

import argparse
import json
import os
from typing import Callable, Dict, List

from mantis_tpu.data_prep.schema import make_example, write_dataset


def convert(examples: List[Dict], synthesize_fn: Callable,
            image_dir: str, rel_to: str, mode: str = "conv",
            resolution=(512, 512)) -> List[Dict]:
    """examples: [{image_prompts: [...], conversation: [...]} |
    {..., question, options, answer, knowledge_aspect}]."""
    os.makedirs(image_dir, exist_ok=True)
    out = []
    for i, ex in enumerate(examples):
        item_id = f"synthetic_{i}"
        paths = []
        for j, prompt in enumerate(ex["image_prompts"]):
            path = os.path.join(image_dir, f"{item_id}_img-{j}.png")
            if not os.path.exists(path):
                img = synthesize_fn(prompt)
                if img.size != resolution:
                    img = img.resize(resolution)
                img.save(path)
            paths.append(os.path.relpath(path, rel_to))
        if mode == "conv":
            out.append(make_example(item_id, ex["conversation"], paths))
        else:
            out.append({
                "id": item_id,
                "question_type": "multi-choice",
                "images": paths,
                "question": ex["question"],
                "options": ex["options"],
                "answer": ex["answer"],
                "data_source": "synthetic",
                "category": ex.get("knowledge_aspect", ""),
            })
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_file", default="./generated_examples.json")
    p.add_argument("--output_file", default="./data/train.json")
    p.add_argument("--image_dir", default="./data/images")
    p.add_argument("--mode", default="conv", choices=["conv", "eval"])
    a = p.parse_args()
    with open(a.input_file) as f:
        examples = json.load(f)

    def synthesize_fn(text):
        raise NotImplementedError(
            "No offline text-to-image generator in this environment "
            "(the reference uses diffusers sdxl-turbo on CUDA, "
            "data/synthetic/prepare.py:57-60).  Pass convert() a "
            "synthesize_fn, or pre-render the images.")

    items = convert(examples, synthesize_fn, a.image_dir,
                    os.path.dirname(a.output_file) or ".", a.mode)
    if a.mode == "conv":
        write_dataset(items, os.path.dirname(a.output_file) or ".")
    else:
        with open(a.output_file, "w") as f:
            json.dump(items, f, indent=4)
    print(f"wrote {len(items)} synthetic items")


if __name__ == "__main__":
    main()
