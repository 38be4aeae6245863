"""Offline debug tokenizer: whitespace WordLevel built from dataset text.

Used by the example/debug training scripts (the reference's equivalent is
``scripts/train_example_chat.sh`` pulling a real HF tokenizer; this image
has no network, so debug runs synthesize a vocabulary from the data)."""

from __future__ import annotations

import json
from typing import Iterable, List, Optional


SPECIALS = ["<pad>", "<s>", "</s>", "<unk>", "<image>", "<video>",
            "<0x04>", "|ENDOFTEXT|", "<|im_end|>", "<|im_start|>",
            "<|eot_id|>", "<|start_header_id|>", "<|end_header_id|>",
            "<end_of_utterance>"]


def build_tokenizer_from_texts(texts: Iterable[str],
                               max_vocab: int = 32768):
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    vocab = {t: i for i, t in enumerate(SPECIALS)}
    for text in texts:
        for w in text.split():
            if w not in vocab:
                vocab[w] = len(vocab)
            if len(vocab) >= max_vocab:
                break
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
    return PreTrainedTokenizerFast(
        tokenizer_object=tok, pad_token="<pad>", bos_token="<s>",
        eos_token="</s>", unk_token="<unk>",
        additional_special_tokens=[s for s in SPECIALS if s.startswith("<")
                                   or s.startswith("|")])


def build_tokenizer_from_json_data(paths: List[str],
                                   max_vocab: int = 32768):
    def texts():
        for p in paths:
            with open(p) as f:
                items = (json.load(f) if p.endswith(".json")
                         else [json.loads(x) for x in f])
            for item in items:
                key = ("conversation" if "conversation" in item
                       else "conversations")
                for m in item.get(key, []):
                    yield m.get("value", m.get("content",
                                               m.get("text", "")))

    return build_tokenizer_from_texts(texts(), max_vocab)
