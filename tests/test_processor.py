"""Processor behavior tests: interleave normalization, image-token
expansion, truncation-driven image dropping, image preprocessing parity
vs HF image processors."""

import numpy as np
import pytest
from PIL import Image

from mantis_tpu.models.mllava.processor import (
    ImageProcessorConfig,
    MantisImageProcessor,
    MLlavaProcessor,
    normalize_interleaved,
)


def make_tiny_tokenizer():
    """WordLevel tokenizer over a tiny fixed vocab (offline)."""
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    vocab = {"<pad>": 0, "<s>": 1, "</s>": 2, "<image>": 3, "<unk>": 4}
    words = ("hello world describe the image and USER: ASSISTANT: ( ) : 1 2 "
             "Image < > / a b c d e f g").split()
    for w in words:
        vocab.setdefault(w, len(vocab))
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, pad_token="<pad>", bos_token="<s>",
        eos_token="</s>", unk_token="<unk>",
        additional_special_tokens=["<image>"])
    return fast


def test_normalize_prepends_missing_image_tokens_to_user_turn():
    texts = ["USER: describe the scene ASSISTANT:"]
    images = [[Image.new("RGB", (20, 20))] * 2]
    out = normalize_interleaved(texts, images, add_image_ids=False)
    # replace("USER:", "USER:"+tokens, 1) keeps the original space
    # (reference: processing_llava.py:103).
    assert out[0] == "USER:<image><image> describe the scene ASSISTANT:"


def test_normalize_trims_extra_image_tokens():
    texts = ["a <image> b <image> c <image> d"]
    images = [[Image.new("RGB", (20, 20))]]
    out = normalize_interleaved(texts, images, add_image_ids=False)
    assert out[0] == "a <image> b  c  d"


def test_normalize_adds_numbering_markers():
    texts = ["compare <image> with <image>"]
    images = [[Image.new("RGB", (20, 20))] * 2]
    out = normalize_interleaved(texts, images, add_image_ids=True)
    assert out[0] == (
        "compare (image 1: <Image><image></Image>) with "
        "(image 2: <Image><image></Image>)")


def test_processor_expands_image_tokens():
    tok = make_tiny_tokenizer()
    ip = MantisImageProcessor(ImageProcessorConfig.for_tower("clip", 28))
    proc = MLlavaProcessor(tok, ip, num_image_tokens=4)
    img = Image.new("RGB", (32, 32), (255, 0, 0))
    out = proc("describe <image>", [img], add_image_ids=False)
    ids = out["input_ids"][0]
    img_id = tok.convert_tokens_to_ids("<image>")
    assert (ids == img_id).sum() == 4
    assert out["pixel_values"].shape == (1, 3, 28, 28)


def test_processor_drops_truncated_images():
    tok = make_tiny_tokenizer()
    ip = MantisImageProcessor(ImageProcessorConfig.for_tower("clip", 28))
    proc = MLlavaProcessor(tok, ip, num_image_tokens=4)
    imgs = [Image.new("RGB", (32, 32)) for _ in range(3)]
    # max_length 4 cuts off the later <image> tokens
    out = proc("a <image> b <image> c <image>", [imgs],
               add_image_ids=False, max_length=4, truncation=True)
    img_id = tok.convert_tokens_to_ids("<image>")
    n_tok_imgs = (out["input_ids"][0] == img_id).sum() // 4
    # 4-token budget keeps "a <image> b <image>" -> 2 of 3 images survive.
    assert out["pixel_values"].shape[0] == n_tok_imgs == 2


def test_processor_mismatch_raises():
    tok = make_tiny_tokenizer()
    ip = MantisImageProcessor(ImageProcessorConfig.for_tower("clip", 28))
    proc = MLlavaProcessor(tok, ip, num_image_tokens=4)
    # normalize_interleaved balances counts, so this should NOT raise
    out = proc("no tokens here", [[Image.new("RGB", (20, 20))]],
               add_image_ids=False)
    assert out["pixel_values"].shape[0] == 1


@pytest.mark.parametrize("tower,size", [("clip", 336), ("siglip", 384)])
def test_image_processor_matches_hf(tower, size):
    import transformers

    rng = np.random.RandomState(0)
    images = [
        Image.fromarray(rng.randint(0, 255, (480, 640, 3), np.uint8)),
        Image.fromarray(rng.randint(0, 255, (224, 224, 3), np.uint8)),
        Image.fromarray(rng.randint(0, 255, (50, 300, 3), np.uint8)),
    ]
    ours = MantisImageProcessor(
        ImageProcessorConfig.for_tower(tower, size))(images)
    if tower == "clip":
        hf = transformers.CLIPImageProcessor(
            size={"shortest_edge": size}, crop_size={"height": size,
                                                     "width": size})
    else:
        hf = transformers.SiglipImageProcessor(
            size={"height": size, "width": size})
    ref = hf(images, return_tensors="np")["pixel_values"]
    np.testing.assert_allclose(ours, ref, atol=1e-5)
