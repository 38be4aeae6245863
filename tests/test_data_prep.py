"""Golden tests for the data-prep converters (VERDICT #9): sample
inputs per source -> validated unified-schema output (reference
recipes under /root/reference/data/*/prepare.py)."""

import json

from mantis_tpu.data_prep import schema
from mantis_tpu.data_prep.prepare_birds_to_words import (
    convert as conv_birds)
from mantis_tpu.data_prep.prepare_coinstruct import convert as conv_coin
from mantis_tpu.data_prep.prepare_contrastive_caption import (
    convert as conv_cc)
from mantis_tpu.data_prep.prepare_dream_sim import convert as conv_dream
from mantis_tpu.data_prep.prepare_iconqa import convert as conv_iconqa
from mantis_tpu.data_prep.prepare_llava_pretrain import (
    convert as conv_lp)
from mantis_tpu.data_prep.prepare_mementos import convert as conv_mem
from mantis_tpu.data_prep.prepare_multi_vqa import (
    convert as conv_mvqa, parse_completion)
from mantis_tpu.data_prep.prepare_qbench2 import (
    convert as conv_qb, split_pair_path)
from mantis_tpu.data_prep.prepare_sharegpt4v import convert as conv_sgpt
from mantis_tpu.data_prep.prepare_spot_the_diff import (
    convert as conv_spot, parse_vqa)


def _check(examples, min_n=1):
    assert len(examples) >= min_n
    for ex in examples:
        schema.validate_example(ex)
    return examples


def test_qbench2():
    assert split_pair_path("a\\b\\x.jpg_cat_y.jpg.jpg") == (
        "x.jpg", "y.jpg")
    rows = [{"question": "Which is clearer?",
             "img_path": "x.jpg_cat_y.jpg.jpg",
             "candidates": ["First", "Second", "Same"],
             "correct_ans": "Second", "correct_choice": "B"}]
    exs = _check(conv_qb(rows))
    assert exs[0]["conversations"][1]["value"] == "B"
    assert len(exs[0]["images"]) == 2
    assert "(B) Second" in exs[0]["conversations"][0]["value"]


def test_iconqa_all_tasks():
    items = [
        ("choose_txt", {"question": "What shape?",
                        "choices": ["circle", "square"], "answer": 1},
         "choose_txt/0"),
        ("choose_img", {"question": "Pick the match.",
                        "choices": ["c0.png", "c1.png"], "answer": 0},
         "choose_img/1"),
        ("fill_in_blank", {"question": "How many dots?", "answer": 3},
         "fill_in_blank/2"),
    ]
    exs = _check(conv_iconqa(items), min_n=3)
    by_id = {e["id"]: e for e in exs}
    assert by_id["iconqa_choose_txt_0"]["conversations"][1]["value"] == "B"
    assert by_id["iconqa_choose_img_1"]["conversations"][1]["value"] \
        == "image 1"
    assert len(by_id["iconqa_choose_img_1"]["images"]) == 3
    assert by_id["iconqa_fill_in_blank_2"]["conversations"][1]["value"] \
        == "3"


def test_coinstruct_merges_shared_images():
    rows = [
        {"image": "a.jpg",
         "conversations": [{"from": "human", "value": "<image>\nQ1"},
                           {"from": "gpt", "value": "A1"}]},
        {"image": "a.jpg",
         "conversations": [{"from": "human", "value": "Q2"},
                           {"from": "gpt", "value": "A2"}]},
        {"image": ["b.jpg", "c.jpg"],
         "conversations": [{"from": "human",
                            "value": "<image>\n<image>\nQ3"},
                           {"from": "gpt", "value": "A3"}]},
    ]
    exs = _check(conv_coin(rows), min_n=2)
    assert len(exs[0]["conversations"]) == 4  # merged two exchanges
    assert exs[0]["images"] == ["images/a.jpg"]
    assert len(exs[1]["images"]) == 2


def test_dream_sim():
    rows = [{"ref": "r.png", "img_left": "l.png", "img_right": "x.png",
             "left_is_closer": True} for _ in range(6)]
    exs = _check(conv_dream(rows), min_n=6)
    for ex in exs:
        ans = ex["conversations"][1]["value"]
        assert ans in ("A", "image 2")  # left is always closer here
        assert len(ex["images"]) == 3


def test_mementos():
    rows = [{"image_name": "ep1.gif", "gt_description": "A robot arm.",
             "frames": "0.jpg;1.jpg;2.jpg"}]
    exs = _check(conv_mem(rows, folder="single_image_robo"))
    assert exs[0]["conversations"][0]["value"].count("<image>") == 3
    assert exs[0]["images"][0].startswith("images/single_image_robo/ep1")


def test_llava_pretrain_plain_pairs():
    rows = [{"id": "x", "image": "00/1.jpg",
             "conversations": [
                 {"from": "human", "value": "<image>"},
                 {"from": "gpt", "value": "a cat on a mat"}]}]
    exs = _check(conv_lp(rows))
    assert exs[0]["conversations"][1]["value"] == "a cat on a mat"
    assert exs[0]["conversations"][0]["value"] == "<image>"


def fake_completion(messages, model_name, **kw):
    # deterministic stand-in for the LLM (judge protocol)
    text = messages[-1]["content"]
    if "multi-choice and short-answer" in text.lower() \
            or "Multi-choice" in text:
        return {"text": (
            'Multi-choice:\n{"question": "What moved?", '
            '"options": ["A: car", "B: person"], "answer": "A"}\n'
            'Short-answer:\n{"question": "What moved?", '
            '"options": [], "answer": "car"}'), "prompt_tokens": 0, "completion_tokens": 0}
    if "bird images" in text:
        return {"text": (
            '{"question": "Which bird is darker?", '
            '"options": ["A: first", "B: second"], "answer": "B"}'),
            "prompt_tokens": 0, "completion_tokens": 0}
    return {"text": (
        "Question: What links image 1 and image 2?\n"
        "Answer: Both show water.\n"
        "Question: Which image is brighter?\n"
        "Answer: image 2."), "prompt_tokens": 0, "completion_tokens": 0}


def test_spot_the_diff_llm_parsing(tmp_path):
    rows = [{"img_id": 17, "sentences": ["the car moved left"]}]
    exs = _check(conv_spot(rows, completion_fn=fake_completion,
                           cache_dir=str(tmp_path)),
                 min_n=2)  # one MC + one SA question
    assert exs[0]["conversations"][1]["value"] == "A"
    assert exs[1]["conversations"][1]["value"] == "car"
    assert parse_vqa("no json here") == []


def test_birds_to_words_llm(tmp_path):
    rows = [{"img1": "b1.jpg", "img2": "b2.jpg",
             "description": "the second is darker"}]
    exs = _check(conv_birds(rows, completion_fn=fake_completion,
                            cache_dir=str(tmp_path)))
    assert exs[0]["conversations"][1]["value"] == "B"


def test_multi_vqa_llm():
    assert len(parse_completion(
        "Question: q1? Answer: a1. Question: q2? Answer: a2.")) == 2
    groups = [{"images": ["i1.jpg", "i2.jpg"],
               "captions": ["a lake", "a bright sea"]}]
    exs = _check(conv_mvqa(groups, completion_fn=fake_completion,
                           cache_dir=None))
    conv = exs[0]["conversations"]
    assert conv[0]["value"].count("<image>") == 2
    assert len(conv) == 4  # two QA pairs


def test_contrastive_caption():
    groups = [{"images": ["a.jpg", "b.jpg", "c.jpg"],
               "captions": ["cap a", "cap b", "cap c"]}]
    exs = _check(conv_cc(groups))
    conv = exs[0]["conversations"]
    assert conv[0]["value"].count("<image>") == 3
    assert conv[3]["value"].startswith("image ")


def test_sharegpt4v_grouping():
    rows = [{"image": f"im{i}.jpg", "caption": f"caption {i}"}
            for i in range(7)]
    exs = _check(conv_sgpt(rows, group_range=(2, 3)))
    for ex in exs:
        assert 2 <= len(ex["images"]) <= 3
        assert len(ex["conversations"]) == 2 * len(ex["images"])


def test_write_dataset_roundtrip(tmp_path):
    exs = conv_lp([{"id": "x", "image": "1.jpg",
                    "conversations": [
                        {"from": "human", "value": "<image>"},
                        {"from": "gpt", "value": "cap"}]}])
    path = schema.write_dataset(exs, str(tmp_path))
    assert json.load(open(path))[0]["id"] == "x"


def test_imagecode():
    from mantis_tpu.data_prep.prepare_imagecode import convert

    rows = [{"image_set": "s1", "images": [f"im{i}.jpg" for i in range(10)],
             "description": "the dog jumps", "image_index": 3}
            for _ in range(4)]
    exs = _check(convert(rows), min_n=4)
    for ex in exs:
        ans = ex["conversations"][1]["value"]
        assert ans in ("Answer: Image 4", "Answer: D")
        assert len(ex["images"]) == 10


def test_lrv_llm(tmp_path):
    from mantis_tpu.data_prep.prepare_lrv import convert

    def fake(messages, model_name, **kw):
        return {"text": '[{"question": "Which image has more trees?", '
                        '"answer": "the first"}]',
                "prompt_tokens": 0, "completion_tokens": 0}

    pairs = [{"img1": "a.jpg", "qa1": [("q", "a")],
              "img2": "b.jpg", "qa2": [("q2", "a2")]}]
    exs = _check(convert(pairs, completion_fn=fake,
                         cache_dir=str(tmp_path)))
    assert exs[0]["conversations"][0]["value"].startswith(
        "<image> <image> ")


def test_obelics():
    from mantis_tpu.data_prep.prepare_obelics import convert

    docs = [{"images": [None, "i1.jpg", None, "i2.jpg"],
             "texts": ["intro text", None, "middle text", None]},
            {"images": ["only.jpg"], "texts": [None]}]  # <2 imgs: drop
    exs = _check(convert(docs))
    assert len(exs) == 1
    assert exs[0]["conversations"][1]["value"].count("<image>") == 2


def test_msrvtt():
    from mantis_tpu.data_prep.prepare_msrvtt import (
        convert_chat, convert_contrastive)

    data = {"videos": [{"video_id": "video1"}],
            "sentences": [{"video_id": "video1", "caption": "a cat"},
                          {"video_id": "video1", "caption": "a pet"}]}
    c = convert_contrastive(data)
    assert c[0]["video"].endswith("video1.mp4") and c[0]["text"] == "a cat"
    chat = convert_chat(data)
    assert chat[0]["conversations"][0]["value"].startswith("<video>")


def test_single_image_vqa():
    from mantis_tpu.data_prep.prepare_single_image_vqa import convert

    rows = [{"image": "c.png", "question": "What is the max value?",
             "answer": "42"},
            {"image": "d.png", "question": "Which label?",
             "answer": "dogs", "options": ["cats", "dogs"]}]
    exs = _check(convert(rows, "chartqa"), min_n=2)
    assert exs[0]["conversations"][1]["value"] == "42"
    assert exs[1]["conversations"][1]["value"] == "B"


def test_docmatrix_standalone(tmp_path):
    from mantis_tpu.data_prep.prepare_docmatrix import convert

    row = {"images": [{"bytes": b"\x89PNG-fake", "format": "png"}],
           "texts": [{"user": "What does the doc say?",
                      "assistant": "Rent is due."},
                     {"user": "When?", "assistant": "Friday."}]}
    rows = {"images": [row, row],
            "zero-shot-exp": [{"images": ["pre/extracted.jpg"],
                               "texts": [{"user": "Title?",
                                          "assistant": "Annual report."}]}]}
    exs = _check(convert(rows, sample_size=1, save_dir=str(tmp_path)),
                 min_n=2)
    # per-subset sampling: 1 from each subset despite 2 'images' rows;
    # ids are subset-prefixed with a global running index
    assert [e["id"] for e in exs] == ["images_0", "zero-shot-exp_1"]
    assert len(exs[0]["conversations"]) == 4
    assert exs[0]["conversations"][0]["value"].startswith("<image>")
    # byte payloads extracted to images/<index>_<i>.<ext>
    assert exs[0]["images"] == ["images/0_0.png"]
    assert (tmp_path / "images" / "0_0.png").read_bytes() == b"\x89PNG-fake"
    # pre-extracted path rows pass through untouched
    assert exs[1]["images"] == ["pre/extracted.jpg"]


def test_cauldron_docmatrix():
    from mantis_tpu.data_prep.prepare_cauldron import convert

    rows = [{"images": ["a.png"],
             "texts": [{"user": "What does the chart show?",
                        "assistant": "Sales rise."},
                       {"user": "By how much?",
                        "assistant": "Twenty percent."}]}]
    exs = _check(convert(rows, "docmatrix"))
    assert len(exs[0]["conversations"]) == 4
    assert exs[0]["conversations"][0]["value"].startswith("<image>")


def test_visual_web_instruct():
    from mantis_tpu.data_prep.prepare_visual_web_instruct import convert

    exs = _check(convert([{"question": "Solve x+1=2",
                           "answer": "x=1"}]))
    assert exs[0]["conversations"][1]["value"] == "x=1"
    assert exs[0]["images"][0].startswith("image/")


def test_llava_video():
    from mantis_tpu.data_prep.prepare_llava_video import convert

    exs = convert([{"id": "v1", "video": "v1.mp4",
                    "caption": "a dog runs"}])
    assert exs[0]["video"].endswith("v1.mp4")
    assert exs[0]["conversations"][0]["value"].startswith("<video>")


def test_mimicit_merges_related():
    from mantis_tpu.data_prep.prepare_mimicit import convert

    id_to_image = {"im1": "images/im1.jpg", "im2": "images/im2.jpg"}
    rows = [
        {"id": "a", "images": ["im1", "im2"],
         "instruction": "What differs?", "answer": "The colors.",
         "related instructions": []},
        {"id": "b", "images": ["im1", "im2"],
         "instruction": "Which is brighter?", "answer": "The first.",
         "related instructions": ["a"]},
        {"id": "c", "images": ["missing"],
         "instruction": "x", "answer": "y",
         "related instructions": []},
    ]
    exs = _check(convert(rows, id_to_image))
    assert len(exs) == 1  # b merged into a; c dropped (missing image)
    assert len(exs[0]["conversations"]) == 4
    assert exs[0]["conversations"][0]["value"].count("<image>") == 2


def test_mmmu_multi_image_filter(tmp_path):
    from PIL import Image as PILImage

    from mantis_tpu.data_prep.prepare_mmmu import convert

    def img():
        return PILImage.new("RGB", (8, 8), (10, 20, 30))

    rows = [
        {"id": "dev_1", "question": "Compare <image 1> and <image 2>.",
         "options": "['left', 'right']", "answer": "A",
         "image_1": img(), "image_2": img()},
        {"id": "dev_2", "question": "Single <image 1> only.",
         "options": "['x', 'y']", "answer": "B", "image_1": img()},
        {"id": "dev_3", "question": "Open <image 1> vs <image 2>?",
         "options": "[]", "answer": "42",
         "image_1": img(), "image_2": img()},
    ]
    items = convert(rows, str(tmp_path / "images"), str(tmp_path))
    assert [i["id"] for i in items] == ["MMMU_dev_1", "MMMU_dev_3"]
    assert items[0]["question_type"] == "multi-choice"
    assert items[1]["question_type"] == "short-answer"
    assert "<image 1>" not in items[0]["question"]
    assert items[0]["question"].count("<image>") == 2
    import os

    for it in items:
        for p in it["images"]:
            assert os.path.exists(tmp_path / p)


def test_flipped_vqa_nextqa_star_merge():
    from mantis_tpu.data_prep.prepare_flipped_vqa import (convert_nextqa,
                                                          convert_star)

    csv_rows = [
        {"video": "101", "question": "what is the man doing",
         "a0": "run", "a1": "walk", "a2": "sit", "a3": "eat",
         "a4": "jump", "answer": "1"},
        {"video": "101", "question": "where is he?",
         "a0": "park", "a1": "home", "a2": "car", "a3": "gym",
         "a4": "sea", "answer": "0"},
        {"video": "202", "question": "who appears",
         "a0": "dog", "a1": "cat", "a2": "man", "a3": "kid",
         "a4": "bird", "answer": "2"},
    ]
    exs = _check(convert_nextqa(csv_rows), min_n=2)
    assert len(exs) == 2  # merged by video id
    v101 = next(e for e in exs if e["id"] == "nextqa_101")
    assert len(v101["conversations"]) == 4  # two QAs merged
    assert len(v101["images"]) == 8
    assert v101["conversations"][1]["value"] == "B: walk"
    assert v101["conversations"][0]["value"].startswith(
        "What is the man doing?\n")

    star = [{"video_id": "S1", "question": "what did he take",
             "choices": [{"choice": c} for c in
                         ["cup", "bag", "book", "pen"]],
             "answer": "book"}]
    exs = _check(convert_star(star))
    assert exs[0]["conversations"][1]["value"] == "C: book"


def test_lrv_graph_segments_and_llm(tmp_path):
    from mantis_tpu.data_prep.prepare_lrv_graph import convert

    def fake(messages, model_name, **kw):
        return {"text": '[{"question": "Which has more trees?", '
                        '"answer": "the first"}]',
                "prompt_tokens": 0, "completion_tokens": 0}

    rows = [
        {"image_id": "11", "question": "q11a", "answer": "a11a"},
        {"image_id": "11", "question": "q11b", "answer": "a11b"},
        {"image_id": "22", "question": "q22a", "answer": "a22a"},
    ]
    exs = _check(convert(rows, completion_fn=fake,
                         cache_dir=str(tmp_path)))
    conv = exs[0]["conversations"]
    # segment 1 (2 QAs) + segment 2 (1 QA) + 1 LLM comparison QA
    assert len(conv) == (2 + 1 + 1) * 2
    assert conv[0]["value"].startswith("<image> q11a")
    assert conv[4]["value"].startswith(
        "<image> we now look at another image. ")
    assert conv[-2]["value"] == "Which has more trees?"
    assert exs[0]["images"] == ["image/11.jpg", "image/22.jpg"]


def test_synthetic_injectable_generator(tmp_path):
    from PIL import Image as PILImage

    from mantis_tpu.data_prep.prepare_synthetic import convert

    calls = []

    def synth(text):
        calls.append(text)
        return PILImage.new("RGB", (16, 16), (5, 5, 5))

    examples = [
        {"image_prompts": ["a cat", "a dog"],
         "conversation": [
             {"from": "human", "value": "<image> <image> compare"},
             {"from": "gpt", "value": "cat vs dog"}]},
    ]
    exs = convert(examples, synth, str(tmp_path / "img"),
                  str(tmp_path), mode="conv", resolution=(16, 16))
    _check(exs)
    assert calls == ["a cat", "a dog"]
    # eval mode
    ev = convert(
        [{"image_prompts": ["x"], "question": "q?",
          "options": ["a", "b"], "answer": "A",
          "knowledge_aspect": "color"}],
        synth, str(tmp_path / "img2"), str(tmp_path), mode="eval")
    assert ev[0]["question_type"] == "multi-choice"
    assert ev[0]["category"] == "color"


def test_video_eval_reroot_and_drop(tmp_path):
    import os

    from mantis_tpu.data_prep.prepare_video_eval import convert

    rows = [
        {"id": "p1", "images": ["p110367_0.jpg", "p110367_1.jpg"],
         "conversations": [
             {"from": "human", "value": "<image> <image> rate this"},
             {"from": "gpt", "value": "score 3"}]},
        {"id": "p2", "images": ["p2_0.jpg"],
         "conversations": [
             {"from": "human", "value": "<image> rate"},
             {"from": "gpt", "value": "4"}]},
    ]
    exs = _check(convert(rows), min_n=2)
    assert exs[0]["images"] == ["images/p110367/p110367_0.jpg",
                                "images/p110367/p110367_1.jpg"]
    # drop_missing against a root with only p1's frames
    os.makedirs(tmp_path / "images" / "p110367")
    for im in exs[0]["images"]:
        (tmp_path / im).write_bytes(b"x")
    kept = convert(rows, root=str(tmp_path), drop_missing=True)
    assert [e["id"] for e in kept] == ["p1"]


def test_upload_dataset_offline_build(tmp_path):
    """Everything before the hub push: suffix-probing image resolution
    + HF Dataset construction in the Mantis-Instruct column layout."""
    from PIL import Image as PILImage

    from mantis_tpu.data_prep.upload_dataset import (build_hf_dataset,
                                                     resolve_image_path)

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    PILImage.new("RGB", (8, 8)).save(img_dir / "a.png")
    # bare stem resolves by suffix probing
    assert resolve_image_path("a", str(img_dir)).endswith("a.png")

    examples = [{
        "id": "x0", "images": ["a"],
        "conversations": [
            {"from": "human", "value": "<image> what"},
            {"from": "gpt", "value": "thing"}],
    }]
    ds = build_hf_dataset(examples, str(img_dir), inline_bytes=True)
    assert len(ds) == 1
    row = ds[0]
    assert row["images"][0]["path"] == "a.png"
    assert row["images"][0]["bytes"]
    assert row["conversation"][1]["value"] == "thing"


def test_llava_665k_multi_merge(tmp_path):
    """prepare_llava_665k_multi (reference data/llava-instruct/
    prepare.py): runs of single-image items merge into multi-image
    conversations with positional renames + <image> token placement;
    text-only items pass through; long merges split into even-turn
    parts."""
    from mantis_tpu.data_prep.prepare_llava_665k_multi import convert

    rows = []
    for i in range(12):
        rows.append({
            "id": i, "image": f"coco/{i}.jpg",
            "conversations": [
                {"from": "human",
                 "value": f"<image>\nWhat is in the image number {i}?"},
                {"from": "gpt", "value": f"A thing numbered {i}."},
            ]})
    rows.append({"id": "t1", "model": "x", "conversations": [
        {"from": "human", "value": "Define entropy."},
        {"from": "gpt", "value": "A measure of disorder."}]})
    out = _check(convert(rows, seed=0), min_n=3)

    multi = [e for e in out if len(e["images"]) >= 2]
    assert multi, "seeded merge should produce a multi-image item"
    for ex in multi:
        k = len(ex["images"])
        n_tok = sum(t["value"].count("<image>")
                    for t in ex["conversations"])
        assert n_tok == k      # one token per image, prepended/appended
        # renamed positional references never keep a bare "<image>\n"
        assert all(t["from"] in ("human", "gpt")
                   for t in ex["conversations"])
    singles = [e for e in out if len(e["images"]) == 1]
    for ex in singles:
        assert sum(t["value"].count("<image>")
                   for t in ex["conversations"]) == 1
    text_only = [e for e in out if not e["images"]]
    assert any(e["id"] == "llava_665k_no_image_t1" for e in text_only)

    # context split: enormous conversations divide into even-turn parts
    big_rows = [{
        "id": 100 + j, "image": f"coco/b{j}.jpg",
        "conversations": [t for _ in range(40) for t in (
            {"from": "human", "value": "word " * 120},
            {"from": "gpt", "value": "reply " * 120})],
    } for j in range(2)]
    out2 = convert(big_rows, seed=1, content_length=1024)
    assert any("_part" in e["id"] for e in out2)
    for e in out2:
        assert len(e["conversations"]) % 2 == 0
