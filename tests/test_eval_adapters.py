"""Eval-driver end-to-end over every per-arch adapter: each produces a
scored JSONL on a local mini-benchmark (VERDICT #5 done-criterion).
Mirrors the reference's adapter protocol (mantis/mllm_tools/
mllava_eval.py:10-78: support_multi_image + messages -> str)."""

import json

import numpy as np
import pytest
from PIL import Image

import jax

from mantis_tpu.benchmark import eval as eval_lib
from mantis_tpu.benchmark.adapters.chat_models import ARCH_CHAT_CLASSES
from mantis_tpu.train.archs import get_arch
from mantis_tpu.utils.debug_tokenizer import build_tokenizer_from_texts

ARCHS = sorted(ARCH_CHAT_CLASSES)


@pytest.fixture()
def bench_fixture(tmp_path):
    imgs_dir = tmp_path / "imgs"
    imgs_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(2):
        Image.fromarray(
            rng.randint(0, 255, (48, 40, 3), np.uint8)).save(
            imgs_dir / f"i{i}.png")
    data = [
        {"id": "q1", "question": "Is this <image> bright ?",
         "question_type": "multi-choice", "options": ["yes", "no"],
         "answer": "A", "images": ["imgs/i0.png"]},
        {"id": "q2", "question": "Compare <image> and <image> .",
         "question_type": "short-answer", "options": [],
         "answer": "same", "images": ["imgs/i0.png", "imgs/i1.png"]},
    ]
    path = tmp_path / "bench.json"
    path.write_text(json.dumps(data))
    return str(path)


def make_adapter(arch):
    tok = build_tokenizer_from_texts(
        ["Is this bright yes no Compare and same Answer with the "
         "option 's letter from the given choices directly USER "
         "ASSISTANT User Assistant"])
    spec = get_arch(arch)
    cfg = spec.debug_config(tok)
    params = spec.init_params(cfg, jax.random.PRNGKey(0), np.float32)
    processor = spec.make_processor(tok, cfg)
    cls = ARCH_CHAT_CLASSES[arch]
    import jax.numpy as jnp

    return cls(cfg, params, processor, max_new_tokens=4,
               cache_dtype=jnp.float32)


@pytest.mark.parametrize("arch", ARCHS)
def test_adapter_scored_jsonl(arch, bench_fixture, tmp_path):
    adapter = make_adapter(arch)
    summary, results = eval_lib.main(
        model_name=f"{arch}-tiny", dataset_path=bench_fixture,
        dataset_name=f"toy-{arch}", results_dir=str(tmp_path / "res"),
        model_instance=adapter)
    assert len(results) == 2
    for r in results:
        assert isinstance(r["prediction"]["raw_answer"], str)
    # the scored JSONL is on disk and resumable
    out = list((tmp_path / "res" / f"toy-{arch}").glob("*.jsonl"))
    assert out and len(out[0].read_text().strip().splitlines()) == 2


def test_load_video_frames_pads_short_clips():
    from mantis_tpu.benchmark.adapters.chat_models import (
        load_video_frames)

    rng = np.random.RandomState(0)
    clip = [Image.fromarray(rng.randint(0, 255, (16, 16, 3), np.uint8))
            for _ in range(3)]
    frames = load_video_frames(clip, 5)
    assert len(frames) == 5
    assert frames[3] is frames[2] and frames[4] is frames[2]
    assert len(load_video_frames(clip, 2)) == 2


def test_load_video_frames_uniform_sampling_and_errors():
    from mantis_tpu.benchmark.adapters.chat_models import (
        load_video_frames)

    rng = np.random.RandomState(1)
    clip = [Image.fromarray(rng.randint(0, 255, (8, 8, 3), np.uint8))
            for _ in range(8)]
    # long pre-decoded lists are sampled uniformly, not head-truncated
    out = load_video_frames(clip, 4)
    assert [clip.index(f) for f in out] == [0, 2, 4, 7]
    # undecodable inputs raise instead of silently dropping the video
    with pytest.raises(ValueError):
        load_video_frames([], 4)
    with pytest.raises(ValueError):
        load_video_frames("/nonexistent/clip.mp4", 4)


def test_generic_adapter_video_message_as_frames():
    """A ``video`` message on a frames-as-images arch becomes uniformly
    sampled frames (the MVBench protocol, reference
    mantis/mllm_tools/mllava_eval.py frames path)."""
    adapter = make_adapter("idefics3")
    adapter.video_num_frames = 2
    rng = np.random.RandomState(1)
    clip = [Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8))
            for _ in range(4)]
    out = adapter([{"type": "video", "content": clip},
                   {"type": "text", "content": "What happens ?"}])
    assert isinstance(out, str)
    # the prompt carries one <image> per sampled frame
    prompt, images = adapter.build_prompt(
        [{"type": "video", "content": clip},
         {"type": "text", "content": "x"}])
    assert len(images) == 2 and prompt.count("<image>") == 2
