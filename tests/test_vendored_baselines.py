"""Protocol tests for the vendored / remote-code baseline adapters
(reference: mantis/mllm_tools/{cogvlm,qwenVL,minicpmv,emu2,vila,
otterimage,ottervideo,otterhd}_eval.py).

The real checkpoints need trust_remote_code / external packages with
hub egress, so each adapter takes injected model machinery; these
tests drive the full prompt-building + output-parsing logic with fakes
and assert the reference wrapper's exact protocol."""

import json

import numpy as np
import pytest
import torch
from PIL import Image

from mantis_tpu.benchmark.adapters import MLLM_Models
from mantis_tpu.benchmark.adapters.vendored_baselines import (
    VENDORED_BASELINES, CogVLM, Emu2, MiniCPMV, OtterHD, OtterImage,
    OtterVideo, QwenVL, VILA)


def img(w=40, h=30, seed=0):
    rng = np.random.RandomState(seed)
    return Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8))


MESSAGES = [
    {"type": "image", "content": img(seed=1)},
    {"type": "image", "content": img(seed=2)},
    {"type": "text", "content": "What differs between the images?"},
]


class FakeTokenizer:
    eos_token_id = 2

    def __call__(self, texts, return_tensors=None,
                 add_special_tokens=True):
        if isinstance(texts, str):
            texts = [texts]
        if return_tensors is not None:
            self.last_texts = texts
        n = max(len(t.split()) for t in texts)
        ids = torch.arange(n)[None, :].repeat(len(texts), 1)
        if not add_special_tokens:
            return type("R", (), {"input_ids": ids.tolist()})
        return {"input_ids": ids, "attention_mask":
                torch.ones_like(ids)}

    def decode(self, ids, skip_special_tokens=False):
        return self.decoded

    def batch_decode(self, ids, **kw):
        return [self.decoded]


def test_cogvlm_protocol():
    tok = FakeTokenizer()
    tok.decoded = " a cat . "

    class FakeModel:
        def build_conversation_input_ids(self, tokenizer, query,
                                         history, images):
            assert history == []
            assert len(images) == 1          # merged single image
            assert images[0].width == 80     # two 40px images merged
            self.query = query
            return {"input_ids": torch.arange(6),
                    "token_type_ids": torch.zeros(6, dtype=torch.long),
                    "attention_mask": torch.ones(6, dtype=torch.long),
                    "images": [torch.zeros(3, 10, 10)]}

        def generate(self, **kw):
            assert kw["do_sample"] is False
            assert kw["no_repeat_ngram_size"] == 3
            assert kw["input_ids"].shape == (1, 6)
            assert isinstance(kw["images"], list)
            return torch.arange(9)[None, :]

    m = FakeModel()
    out = CogVLM(model=m, tokenizer=tok)(MESSAGES)
    assert m.query == "What differs between the images?"
    assert out == "a cat ."


def test_qwenvl_protocol(tmp_path):
    class FakeQwenTok:
        def from_list_format(self, entries):
            # one {'image': path} entry PER image (the reference does
            # not merge in-wrapper, qwenVL_eval.py:48-67), then the
            # '\n'-joined text
            assert [set(e) for e in entries] == [
                {"image"}, {"image"}, {"text"}]
            assert all(e["image"].endswith(".jpg")
                       for e in entries[:2])
            assert entries[0]["image"] != entries[1]["image"]
            assert entries[2] == {
                "text": "What differs between the images?"}
            return "Picture 1: <img>...</img>\nWhat differs?"

    class FakeModel:
        def chat(self, tokenizer, query, history):
            assert history is None
            assert query.startswith("Picture 1:")
            return " two cats ", []

    adapter = QwenVL(model=FakeModel(), tokenizer=FakeQwenTok())
    assert adapter(MESSAGES) == "two cats"
    files = list(adapter._tmp_files)
    assert files
    adapter.__del__()
    import os

    assert not any(os.path.exists(f) for f in files)


def test_minicpmv_protocol():
    class FakeModel:
        def chat(self, image, msgs, tokenizer, sampling):
            assert image is None and sampling is False
            (turn,) = msgs
            assert turn["role"] == "user"
            kinds = [type(c).__name__ for c in turn["content"]]
            assert kinds[:2] == ["Image", "Image"]  # interleaved PILs
            assert turn["content"][2] == \
                "What differs between the images?"
            return " blue \n"

    assert MiniCPMV(model=FakeModel(), tokenizer=object())(
        MESSAGES) == "blue"


def test_emu2_protocol():
    tok = FakeTokenizer()
    tok.decoded = " riverbank "

    class FakeModel:
        def build_input_ids(self, text, tokenizer, image):
            assert text == ["[<IMG_PLH>][<IMG_PLH>]\n"
                            "What differs between the images?"]
            assert len(image) == 2
            return {"input_ids": torch.arange(4)[None],
                    "attention_mask": torch.ones(1, 4),
                    "image": torch.zeros(2, 3, 8, 8)}

        def generate(self, **kw):
            assert kw["max_new_tokens"] == 64
            assert kw["length_penalty"] == -1
            assert kw["image"].dtype == torch.float16
            return torch.arange(6)[None]

    assert Emu2(model=FakeModel(), tokenizer=tok)(
        MESSAGES) == "riverbank"


def test_vila_protocol():
    """Byte-exact golden of the reference's prompt construction
    (vila_eval.py:90-115): placeholder-per-image + raw text, re.sub to
    <image>, conv template by model name with empty assistant turn.
    The llama_3 template's pirate system prompt is a genuine reference
    quirk (reference models/conversation.py:476)."""
    class FakeBackend:
        def generate(self, prompt, images):
            assert prompt == (
                "<|start_header_id|>system<|end_header_id|>\n\n"
                "You are a pirate chatbot who always responds in "
                "pirate speak!<|eot_id|>"
                "<|start_header_id|>user<|end_header_id|>\n\n"
                "<image> <image> What differs between the images?"
                "<|eot_id|>"
                "<|start_header_id|>assistant<|end_header_id|>\n\n")
            assert len(images) == 2
            return " a boat <|eot_id|>"

    # default model path is Llama-3-VILA -> llama_3 conv mode; reply
    # trimmed at the template stop string (vila_eval.py:120,141-143)
    assert VILA(backend=FakeBackend())(MESSAGES) == "a boat"
    with pytest.raises(ImportError):
        VILA()


def test_vila_protocol_v1_im_start_end():
    """The mm_use_im_start_end branch + llava_v1 conv-mode selection
    (vila_eval.py:59,97-102): placeholders become
    <im_start><image><im_end> and the v1 template renders."""
    class FakeBackend:
        mm_use_im_start_end = True

        def generate(self, prompt, images):
            assert prompt == (
                "A chat between a curious human and an artificial "
                "intelligence assistant. The assistant gives helpful, "
                "detailed, and polite answers to the human's "
                "questions. USER: <im_start><image><im_end> "
                "<im_start><image><im_end> "
                "What differs between the images? ASSISTANT:")
            return " a boat </s>"

    v = VILA(model_path="liuhaotian/llava-v1.5-7b",
             backend=FakeBackend())
    assert v.conv_mode == "llava_v1"
    assert v(MESSAGES) == "a boat"


def test_vila_no_image_tag_auto_prepend():
    """vila_eval.py:103-110: when the message list carries no images
    but also no <image> tag, nothing is prepended (len(images)==0);
    a text containing a literal <image> tag is left untouched."""
    captured = {}

    class FakeBackend:
        def generate(self, prompt, images):
            captured["prompt"] = prompt
            return "ok"

    v = VILA(backend=FakeBackend())
    v([{"type": "text", "content": "already has <image> tag"}])
    assert "user<|end_header_id|>\n\nalready has <image> tag<|eot_id|>" \
        in captured["prompt"]


class FakeImageProcessor:
    def preprocess(self, images, return_tensors=None):
        return {"pixel_values": torch.zeros(len(images), 3, 16, 16)}


def test_otter_image_protocol():
    tok = FakeTokenizer()
    tok.decoded = ("<image>User: What differs between the images? "
                   "GPT:<answer> A dog appears.<|endofchunk|>")

    class FakeModel:
        def generate(self, **kw):
            # merged single image -> [1, 1, 1, C, H, W]
            assert kw["vision_x"].shape[:3] == (1, 1, 1)
            assert kw["num_beams"] == 3
            self.kw = kw
            return torch.arange(8)[None]

    m = FakeModel()
    out = OtterImage(model=m, tokenizer=tok,
                     image_processor=FakeImageProcessor())(MESSAGES)
    assert out == "A dog appears."
    # the reference's exact prompt protocol
    assert tok.last_texts == [
        "<image>User: What differs between the images? GPT:<answer>"]


def test_otter_video_frames_axis():
    tok = FakeTokenizer()
    tok.decoded = "GPT:<answer> \"walking\"<|endofchunk|>"

    class FakeModel:
        def generate(self, **kw):
            # two images stack on the TEMPORAL axis: [1, 1, T=2, ...]
            assert kw["vision_x"].shape[:3] == (1, 1, 2)
            return torch.arange(4)[None]

    out = OtterVideo(model=FakeModel(), tokenizer=tok,
                     image_processor=FakeImageProcessor())(MESSAGES)
    assert out == "walking"   # quote-stripped like the reference


def test_otterhd_protocol_and_eval_jsonl(tmp_path):
    class FakeProcessor:
        class tokenizer:
            eos_token_id = 0

        def __call__(self, text, images, return_tensors=None):
            assert text.startswith("User: ")
            assert text.endswith(" Assistant:")
            assert len(images) == 1
            return {"input_ids": torch.arange(5)[None]}

        def batch_decode(self, out, skip_special_tokens=False):
            return ["User: prompt Assistant:\x04 A \n"]

    class FakeModel:
        def generate(self, **kw):
            assert kw["max_new_tokens"] == 256
            return torch.arange(7)[None]

    adapter = OtterHD(model=FakeModel(), processor=FakeProcessor())
    assert adapter(MESSAGES) == "A"

    # full eval-driver drive to a scored JSONL, like every other family
    from mantis_tpu.benchmark import eval as eval_lib

    imgs = tmp_path / "imgs"
    imgs.mkdir()
    img(seed=3).save(imgs / "i.png")
    bench = [{"id": "q1", "question": "Is this <image> bright ?",
              "question_type": "multi-choice", "options": ["yes", "no"],
              "answer": "A", "images": ["imgs/i.png"]}]
    bpath = tmp_path / "bench.json"
    bpath.write_text(json.dumps(bench))
    summary, results = eval_lib.main(
        model_name="otterhd-fake", dataset_path=str(bpath),
        dataset_name="toy-otterhd",
        results_dir=str(tmp_path / "res"), model_instance=adapter)
    assert len(results) == 1
    out = list((tmp_path / "res" / "toy-otterhd").glob("*.jsonl"))
    assert out and len(out[0].read_text().strip().splitlines()) == 1


def test_registry_resolution():
    # <name>:<path> and bare reference names both resolve
    assert MLLM_Models("otterhd") is OtterHD
    assert MLLM_Models("qwenVL") is QwenVL
    for name in VENDORED_BASELINES:
        factory = MLLM_Models(f"{name}:/some/ckpt")
        assert callable(factory)
    # un-injectable families fail loudly, not silently
    with pytest.raises(ImportError):
        OtterImage()


def test_otterhd_executed_end_to_end(tmp_path):
    """EXECUTED (not injected) otterhd drive: a tiny random-weight
    FuyuForCausalLM + real FuyuProcessor round-trip through
    save_pretrained/from_pretrained, then the adapter's real
    processor -> generate -> \\x04-split path.  OtterHD-8B is a plain
    Fuyu checkpoint (reference model_utils/otter/otterhd.py:36), so
    stock-transformers execution covers the whole wrapper; only the
    checkpoint weights differ from production use."""
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import (FuyuConfig, FuyuForCausalLM,
                              FuyuImageProcessor, FuyuProcessor,
                              PreTrainedTokenizerFast)

    words = ["User", "Assistant", ":", "what", "is", "this", "a",
             "cat", "dog", "SPEAKER", "NEWLINE", "|", "What", "differs",
             "between", "the", "images", "?"]
    vocab = {w: i for i, w in enumerate(
        ["<unk>", "<s>", "</s>", "<0x04>", "|SPEAKER|", "|NEWLINE|",
         "|ENDOFTEXT|"] + words)}
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", bos_token="<s>",
        eos_token="</s>", pad_token="</s>")
    # the processor derives the image-placeholder id as token [1] of
    # encode("|SPEAKER|") (processing_fuyu.py); mirror it in the config
    spk = fast.encode("|SPEAKER|", add_special_tokens=False)[1]
    cfg = FuyuConfig(
        vocab_size=len(vocab), hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, patch_size=16,
        image_token_id=spk,
        text_config=dict(
            model_type="persimmon", vocab_size=len(vocab),
            hidden_size=64, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, max_position_embeddings=512))
    torch.manual_seed(0)
    model = FuyuForCausalLM(cfg).eval()
    proc = FuyuProcessor(
        image_processor=FuyuImageProcessor(
            size={"height": 64, "width": 64},
            patch_size={"height": 16, "width": 16}),
        tokenizer=fast)
    ckpt = tmp_path / "tiny-fuyu"
    model.save_pretrained(ckpt)
    proc.save_pretrained(ckpt)

    adapter = OtterHD(model_path=str(ckpt), max_new_tokens=4)
    out = adapter(MESSAGES)          # real processor + real generate
    assert isinstance(out, str)

    # and through the eval driver, scored to JSONL
    from mantis_tpu.benchmark import eval as eval_lib

    imgs = tmp_path / "imgs"
    imgs.mkdir()
    img(seed=3).save(imgs / "i.png")
    bench = [{"id": "q1", "question": "Is this <image> a cat ?",
              "question_type": "multi-choice", "options": ["yes", "no"],
              "answer": "A", "images": ["imgs/i.png"]}]
    bpath = tmp_path / "bench.json"
    bpath.write_text(json.dumps(bench))
    _, results = eval_lib.main(
        model_name="otterhd-tiny", dataset_path=str(bpath),
        dataset_name="toy-otterhd-exec",
        results_dir=str(tmp_path / "res"), model_instance=adapter)
    assert len(results) == 1


def test_otterimage_executed_end_to_end(tmp_path):
    """EXECUTED otterimage: the repo's compact Flamingo-over-MPT
    (adapters/otter_modeling.py — the runnable equivalent of the
    reference's 12.8K-LoC vendored tree, model_utils/otter/) over tiny
    random weights, driven through the REAL adapter generate path
    (beam-3, no_repeat_ngram, bad_words) and the eval driver."""
    from mantis_tpu.benchmark.adapters.otter_modeling import (
        build_tiny_otter)

    model, tok, ip = build_tiny_otter(
        ["What differs between the images? Is this bright ?"])
    adapter = OtterImage(model=model, tokenizer=tok,
                         image_processor=ip)
    out = adapter(MESSAGES)   # real beam-3 generate over real model
    assert isinstance(out, str)

    from mantis_tpu.benchmark import eval as eval_lib

    imgs = tmp_path / "imgs"
    imgs.mkdir()
    img(seed=3).save(imgs / "i.png")
    bench = [{"id": "q1", "question": "Is this <image> bright ?",
              "question_type": "multi-choice", "options": ["yes", "no"],
              "answer": "A", "images": ["imgs/i.png"]}]
    bpath = tmp_path / "bench.json"
    bpath.write_text(json.dumps(bench))
    _, results = eval_lib.main(
        model_name="otterimage-tiny", dataset_path=str(bpath),
        dataset_name="toy-otterimage-exec",
        results_dir=str(tmp_path / "res"), model_instance=adapter)
    assert len(results) == 1
    jl = list((tmp_path / "res" / "toy-otterimage-exec").glob("*.jsonl"))
    assert jl and len(jl[0].read_text().strip().splitlines()) == 1


def test_ottervideo_executed_frames_axis():
    """EXECUTED ottervideo: frames stack on vision_x's TEMPORAL axis
    ([1, 1, T, C, H, W], reference ottervideo_eval.py + vendored
    otter_video.py) and the full generate runs over the tiny model."""
    from mantis_tpu.benchmark.adapters.otter_modeling import (
        build_tiny_otter)

    model, tok, ip = build_tiny_otter(
        ["What differs between the images?"])
    seen = {}
    real_encode = model.encode_vision

    def spy(vision_x):
        seen["shape"] = tuple(vision_x.shape)
        return real_encode(vision_x)

    model.encode_vision = spy
    adapter = OtterVideo(model=model, tokenizer=tok,
                         image_processor=ip)
    out = adapter(MESSAGES)
    assert isinstance(out, str)
    # two images -> T=2 frames, N=1 media item
    assert seen["shape"][:3] == (1, 1, 2)


def test_otter_mini_media_masking_and_gate():
    """Structural checks on the mini model itself: zero-init gates make
    the fresh model media-independent BEFORE training signal flows
    (reference modeling_otter.py:380-430 attn_gate zeros), and tokens
    before any <image> are unaffected by media entirely."""
    from mantis_tpu.benchmark.adapters.otter_modeling import (
        build_tiny_otter)

    model, tok, ip = build_tiny_otter()
    px = ip.preprocess([img(seed=5)])["pixel_values"]
    v1 = px.unsqueeze(1).unsqueeze(0)          # [1, 1, 1, C, H, W]
    v2 = v1 * 0.0 + 0.5                        # different media
    ids = tok(["<image>User: what is this GPT:<answer>"],
              return_tensors="pt")["input_ids"]
    l1 = model(ids, vision_x=v1).logits
    l2 = model(ids, vision_x=v2).logits
    # tanh(0) gates: different media, identical logits at init
    assert torch.allclose(l1, l2)
    # open the gate: media must now flow into the logits
    for xa in model.xattn:
        if xa is not None:
            xa.gate.data.fill_(1.0)
    l1 = model(ids, vision_x=v1).logits
    l2 = model(ids, vision_x=v2).logits
    assert not torch.allclose(l1, l2)
    # ...but tokens BEFORE the <image> marker stay media-independent
    ids2 = tok(["User: what <image> GPT:<answer>"],
               return_tensors="pt")["input_ids"]
    pre = int((ids2[0] == model.config.media_token_id).nonzero()[0])
    p1 = model(ids2, vision_x=v1).logits[:, :pre]
    p2 = model(ids2, vision_x=v2).logits[:, :pre]
    assert torch.allclose(p1, p2)
