"""Eval harness tests: scoring rules, driver resume protocol, adapter
wiring over a tiny real model."""

import json

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from mantis_tpu.benchmark import eval as eval_lib
from mantis_tpu.benchmark.adapters import MantisTPUAdapter, merge_images
from mantis_tpu.benchmark.eval_on_mvbench import check_answer
from mantis_tpu.benchmark.scoring import (
    format_options,
    get_option,
    get_prediction,
    parse_answer,
)


def test_parse_answer_priority():
    assert parse_answer("blah Final Answer: (B)") == "(B)"
    assert parse_answer("I think the answer is C") == "C"
    assert parse_answer("Answer: D maybe") == "D maybe"
    assert parse_answer("nothing here") == "nothing here"


def test_get_option():
    assert get_option("Answer: B") == "B"
    assert get_option("(c) something") == "C"
    assert get_option("123") is None


def test_get_prediction_multichoice():
    r = get_prediction("multi-choice", "B", "(B)", ["x", "y", "z"], "d")
    assert r["correct"] and r["parsed_answer"] == "B"
    r = get_prediction("multi-choice", "A", "B", ["x", "y"], "d")
    assert not r["correct"]


def test_get_prediction_nlvr2_true_false():
    r = get_prediction("multi-choice", "the statement is true", "A",
                       ["True", "False"], "nlvr2")
    assert r["correct"]
    r = get_prediction("multi-choice", "false!", "A", ["True", "False"],
                       "nlvr2")
    assert not r["correct"]


def test_get_prediction_short_answer():
    r = get_prediction("short-answer", "Final Answer: Paris", "paris",
                       [], "d")
    assert r["correct"]


def test_format_options():
    q = format_options("Which?", ["cat", "dog"])
    assert q == "Which?\n (A) cat\n (B) dog"
    q2 = format_options("Which?", ["A. cat", "B. dog"])
    assert q2 == "Which?\n A. cat\n B. dog"


def test_build_messages_interleaved():
    imgs = [Image.new("RGB", (8, 8)) for _ in range(2)]
    msgs = eval_lib.build_messages("look <image> and <image> end", imgs,
                                   True)
    kinds = [m["type"] for m in msgs]
    assert kinds == ["text", "image", "text", "image", "text"]
    # back-fill when too few <image> markers
    msgs = eval_lib.build_messages("no markers", imgs, True)
    assert [m["type"] for m in msgs] == ["image", "image", "text"]
    # single-image models: images first, stripped text
    msgs = eval_lib.build_messages("a <image> b", imgs, False)
    assert [m["type"] for m in msgs] == ["image", "image", "text"]
    assert msgs[-1]["content"] == "a b"


def test_mvbench_check_answer():
    assert check_answer("(a) cat", "(a) cat.")
    assert check_answer("a", "(a) cat.")
    assert not check_answer("(b) dog", "(a) cat.")


@pytest.fixture
def mvbench_fixture(tmp_path):
    """Tiny MVBench layout using the frame-dir media type (Episodic
    Reasoning), so no video codec is needed."""
    json_dir = tmp_path / "json"
    json_dir.mkdir()
    video_dir = tmp_path / "videos"
    items = []
    for i in range(4):
        vd = video_dir / "tvqa/frames_fps3_hq" / f"vid{i}"
        vd.mkdir(parents=True)
        for f in range(6):
            Image.new("RGB", (48, 48), (i * 50, f * 40, 0)).save(
                vd / f"{f:05d}.jpg")
        items.append({"video": f"vid{i}", "question": f"What {i}?",
                      "candidates": ["cat", "dog"], "answer": "cat",
                      "start": 0.0, "end": 2.0})
    (json_dir / "episodic_reasoning.json").write_text(json.dumps(items))
    return str(json_dir), str(video_dir)


def test_mvbench_driver_end_to_end_resume_and_workers(
        mvbench_fixture, tmp_path):
    from mantis_tpu.benchmark import eval_on_mvbench

    json_dir, video_dir = mvbench_fixture
    res = str(tmp_path / "res")
    # random baseline answers "(A)" which letter-matches "(A) cat"
    per_task = eval_on_mvbench.main(
        model_name="random", json_dir=json_dir, video_dir=video_dir,
        num_frames=2, results_dir=res)
    assert per_task["Episodic Reasoning"] == (4, 4)

    # resume: a counting stub must see zero new work
    stub = StubModel("(B)")
    per_task2 = eval_on_mvbench.main(
        model_name="random", json_dir=json_dir, video_dir=video_dir,
        num_frames=2, results_dir=res, model_instance=stub)
    assert stub.calls == 0
    assert per_task2 == per_task

    # concurrent path on a concurrent_safe adapter (fresh results dir):
    # frames arrive in the messages, pool really overlaps
    conc = ConcurrentStub("(b) dog")
    per_task3 = eval_on_mvbench.main(
        model_name="random", json_dir=json_dir, video_dir=video_dir,
        num_frames=2, results_dir=str(tmp_path / "res2"),
        model_instance=conc, workers=2)
    assert conc.calls == 4 and conc.peak == 2
    assert per_task3["Episodic Reasoning"] == (0, 4)


def test_merge_images():
    a = Image.new("RGB", (10, 20), "red")
    b = Image.new("RGB", (30, 40), "blue")
    m = merge_images([a, b])
    assert m.height == 20 and m.width == 10 + 15


@pytest.fixture
def bench_fixture(tmp_path):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(2):
        Image.new("RGB", (32, 32), (200, i * 100, 0)).save(
            img_dir / f"q{i}.jpg")
    data = [
        {"id": "q0", "question": "pick A <image>",
         "question_type": "multi-choice", "options": ["yes", "no"],
         "answer": "A", "category": "t", "data_source": "test",
         "images": ["imgs/q0.jpg"]},
        {"id": "q1", "question": "say hi <image>",
         "question_type": "short-answer", "options": [],
         "answer": "hi", "category": "t", "data_source": "test",
         "images": ["imgs/q1.jpg"]},
    ]
    path = tmp_path / "bench.json"
    path.write_text(json.dumps(data))
    return str(path)


class StubModel:
    support_multi_image = True

    def __init__(self, reply="A"):
        self.reply = reply
        self.calls = 0

    def __call__(self, messages):
        self.calls += 1
        return self.reply


def test_eval_driver_end_to_end_and_resume(bench_fixture, tmp_path):
    stub = StubModel("A")
    summary, results = eval_lib.main(
        model_name="stub", dataset_path=bench_fixture,
        dataset_name="toy", results_dir=str(tmp_path / "res"),
        model_instance=stub)
    assert stub.calls == 2
    assert summary["multi-choice"] == 1.0  # picked A correctly
    assert summary["short-answer"] == 0.0  # "A" != "hi"

    # resume: second run consumes the cache, no new model calls
    stub2 = StubModel("B")
    summary2, _ = eval_lib.main(
        model_name="stub", dataset_path=bench_fixture,
        dataset_name="toy", results_dir=str(tmp_path / "res"),
        model_instance=stub2)
    assert stub2.calls == 0
    assert summary2 == summary


class ConcurrentStub(StubModel):
    """Stub that advertises engine-style thread safety and records the
    peak number of in-flight calls."""

    concurrent_safe = True

    def __init__(self, reply="A"):
        super().__init__(reply)
        import threading
        self._lock = threading.Lock()
        self.in_flight = 0
        self.peak = 0

    def __call__(self, messages):
        import time
        with self._lock:
            self.calls += 1
            self.in_flight += 1
            self.peak = max(self.peak, self.in_flight)
        time.sleep(0.05)  # long enough for workers to overlap
        with self._lock:
            self.in_flight -= 1
        return self.reply


def test_eval_driver_concurrent_workers(bench_fixture, tmp_path):
    """workers>1 on a concurrent_safe adapter: results land complete
    and in dataset order, and calls actually overlapped."""
    stub = ConcurrentStub("A")
    summary, results = eval_lib.main(
        model_name="stub-conc", dataset_path=bench_fixture,
        dataset_name="toyc", results_dir=str(tmp_path / "res"),
        model_instance=stub, workers=2)
    assert stub.calls == 2
    assert stub.peak == 2  # the pool really ran them concurrently
    assert [r["id"] for r in results] == ["q0", "q1"]
    assert summary["multi-choice"] == 1.0

    # non-concurrent adapters ignore workers (stay serial)
    stub2 = StubModel("A")
    eval_lib.main(
        model_name="stub-serial", dataset_path=bench_fixture,
        dataset_name="toyc2", results_dir=str(tmp_path / "res"),
        model_instance=stub2, workers=4)
    assert stub2.calls == 2


def test_eval_use_engine_matches_serial_adapter(bench_fixture, tmp_path):
    """--use_engine wraps the adapter in the continuous-batching
    engine; on CPU f32 the engine replies must be identical to the
    serial adapter's, so the scored JSONLs must agree line for line."""
    from mantis_tpu.benchmark.adapters import MantisTPUAdapter
    from tests.test_engine import _tiny_mantis

    model = _tiny_mantis()
    serial = MantisTPUAdapter("", max_new_tokens=4, model=model)
    _, serial_results = eval_lib.main(
        model_name="tiny-serial", dataset_path=bench_fixture,
        dataset_name="toye", results_dir=str(tmp_path / "res"),
        model_instance=serial)

    engine_side = MantisTPUAdapter("", max_new_tokens=4, model=model)
    _, engine_results = eval_lib.main(
        model_name="tiny-engine", dataset_path=bench_fixture,
        dataset_name="toye", results_dir=str(tmp_path / "res"),
        model_instance=engine_side, use_engine=True, workers=2,
        engine_opts=dict(max_slots=2, slot_ctx=128, chunk_tokens=3,
                         prefill_buckets=(32, 64)))
    assert [r["id"] for r in engine_results] == \
        [r["id"] for r in serial_results]
    for a, b in zip(serial_results, engine_results):
        assert a["prediction"]["raw_answer"] == \
            b["prediction"]["raw_answer"]


def test_random_baseline(bench_fixture, tmp_path):
    summary, results = eval_lib.main(
        model_name="random", dataset_path=bench_fixture,
        dataset_name="toy2", results_dir=str(tmp_path / "res"))
    assert len(results) == 2


def test_mantis_adapter_over_tiny_model(bench_fixture, tmp_path):
    """Full wiring: eval driver -> adapter -> tiny MantisLlava chat."""
    from mantis_tpu.models.configs import (
        LlamaConfig, LlavaConfig, VisionConfig)
    from mantis_tpu.models.mllava import model as mllava_model
    from mantis_tpu.models.mllava.chat import MantisLlava
    from mantis_tpu.models.mllava.processor import (
        ImageProcessorConfig, MantisImageProcessor, MLlavaProcessor)
    from mantis_tpu.utils.debug_tokenizer import build_tokenizer_from_texts

    tok = build_tokenizer_from_texts(
        ["pick A say hi yes no Answer with the option 's letter from "
         "the given choices directly USER ASSISTANT"])
    cfg = LlavaConfig(
        vision_config=VisionConfig(
            tower_type="clip", hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=2, image_size=28,
            patch_size=14),
        text_config=LlamaConfig(
            vocab_size=max(len(tok.get_vocab()) + 4, 64), hidden_size=32,
            intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            rope_theta=10000.0),
        image_token_index=tok.convert_tokens_to_ids("<image>"),
    )
    params = mllava_model.init_params(cfg, jax.random.PRNGKey(0))
    ip = MantisImageProcessor(ImageProcessorConfig.for_tower("clip", 28))
    proc = MLlavaProcessor(tok, ip, cfg.num_image_tokens)
    model = MantisLlava(cfg, params, proc, model_name="tiny-debug",
                        cache_dtype=jnp.float32)
    adapter = MantisTPUAdapter("", max_new_tokens=4, model=model)

    summary, results = eval_lib.main(
        model_name="mantis-tiny", dataset_path=bench_fixture,
        dataset_name="toy3", results_dir=str(tmp_path / "res"),
        model_instance=adapter)
    assert len(results) == 2
    for r in results:
        assert isinstance(r["prediction"]["raw_answer"], str)


def test_blink_conversion_and_eval(tmp_path):
    """BLINK rows -> local driver JSON -> scored run with the random
    baseline (the reference ran BLINK via an external fork;
    benchmark/README.md:14-16)."""
    from PIL import Image as PILImage

    from mantis_tpu.benchmark.prepare_blink import convert_rows

    rng = np.random.RandomState(0)
    rows = [{
        "idx": f"blink_{i}",
        "image_1": PILImage.fromarray(
            rng.randint(0, 255, (32, 32, 3), np.uint8)),
        "image_2": PILImage.fromarray(
            rng.randint(0, 255, (32, 32, 3), np.uint8)),
        "question": "Which image is brighter?",
        "choices": ["first", "second"],
        "answer": "(B)",
    } for i in range(3)]
    out_dir = str(tmp_path / "blink")
    items = convert_rows(rows, out_dir, subtask="vis_sim")
    import json as _json
    with open(f"{out_dir}/val.json", "w") as f:
        _json.dump(items, f)
    assert items[0]["answer"] == "B"
    assert len(items[0]["images"]) == 2
    summary, results = eval_lib.main(
        model_name="random", dataset_path=f"{out_dir}/val.json",
        dataset_name="blink-mini", results_dir=str(tmp_path / "res"))
    assert len(results) == 3


class FlakyStub(StubModel):
    """Fails on a specific example id's question text."""

    concurrent_safe = True

    def __init__(self, reply="A", fail_on="say hi"):
        super().__init__(reply)
        self.fail_on = fail_on

    def __call__(self, messages):
        self.calls += 1
        if any(self.fail_on in m["content"] for m in messages
               if m["type"] == "text"):
            raise ValueError("prompt exceeds the largest prefill bucket")
        return self.reply


def test_eval_per_example_error_containment(bench_fixture, tmp_path):
    """One failing example must not abort the run; the error is
    recorded (scored wrong) and RETRIED on resume."""
    stub = FlakyStub("A")
    summary, results = eval_lib.main(
        model_name="flaky", dataset_path=bench_fixture,
        dataset_name="toyf", results_dir=str(tmp_path / "res"),
        model_instance=stub, workers=2)
    assert stub.calls == 2
    assert len(results) == 2
    by_id = {r["id"]: r for r in results}
    assert "error" in by_id["q1"] and not by_id["q1"]["prediction"][
        "correct"]
    assert by_id["q0"]["prediction"]["correct"]

    # resume: only the errored example re-runs, and a now-healthy
    # model heals the record
    stub2 = FlakyStub("hi", fail_on="@@never@@")
    summary2, results2 = eval_lib.main(
        model_name="flaky", dataset_path=bench_fixture,
        dataset_name="toyf", results_dir=str(tmp_path / "res"),
        model_instance=stub2)
    assert stub2.calls == 1
    by_id2 = {r["id"]: r for r in results2}
    assert "error" not in by_id2["q1"]
    assert by_id2["q1"]["prediction"]["correct"]  # "hi" == answer


def test_mvbench_per_example_error_containment(mvbench_fixture,
                                               tmp_path):
    from mantis_tpu.benchmark import eval_on_mvbench

    json_dir, video_dir = mvbench_fixture

    class Boom(StubModel):
        def __call__(self, messages):
            self.calls += 1
            if self.calls == 2:
                raise RuntimeError("boom")
            return "(a) cat"

    boom = Boom()
    per_task = eval_on_mvbench.main(
        model_name="boom", json_dir=json_dir, video_dir=video_dir,
        num_frames=2, results_dir=str(tmp_path / "res"),
        model_instance=boom)
    assert boom.calls == 4
    assert per_task["Episodic Reasoning"] == (3, 4)  # errored one wrong

    # resume retries only the errored item
    heal = StubModel("(a) cat")
    per_task2 = eval_on_mvbench.main(
        model_name="boom", json_dir=json_dir, video_dir=video_dir,
        num_frames=2, results_dir=str(tmp_path / "res"),
        model_instance=heal)
    assert heal.calls == 1
    assert per_task2["Episodic Reasoning"] == (4, 4)
