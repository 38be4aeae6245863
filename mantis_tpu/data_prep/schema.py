"""The unified Mantis-Instruct example schema
(reference: data/README.md:7-40):

    {"id": str,
     "images": [path | {"path": str, "bytes": bytes|None}],
     "conversations": [{"from": "human"|"gpt", "value": str}]}

Converters build examples with make_example and emit train.json via
write_dataset; the training ChatDataset consumes the output directly.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence


def make_example(ex_id: str, conversations: List[Dict],
                 images: Optional[Sequence] = None) -> Dict:
    ex = {
        "id": str(ex_id),
        "images": list(images or []),
        "conversations": conversations,
    }
    validate_example(ex)
    return ex


def validate_example(ex: Dict) -> None:
    assert "id" in ex and "conversations" in ex, ex.keys()
    convs = ex["conversations"]
    assert len(convs) >= 2, "need at least one human/gpt exchange"
    for i, turn in enumerate(convs):
        role = turn.get("from")
        assert role in ("human", "gpt"), role
        expected = "human" if i % 2 == 0 else "gpt"
        assert role == expected, f"role alternation violated at {i}"
        assert isinstance(turn.get("value"), str)
    n_img_tokens = sum(t["value"].count("<image>")
                       for t in ex["conversations"])
    assert n_img_tokens <= len(ex.get("images", [])) or not ex.get(
        "images"), "more <image> tokens than images"


def write_dataset(examples: List[Dict], out_dir: str,
                  name: str = "train") -> str:
    os.makedirs(out_dir, exist_ok=True)
    for ex in examples:
        validate_example(ex)
    path = os.path.join(out_dir, f"{name}.json")
    with open(path, "w") as f:
        json.dump(examples, f)
    return path
