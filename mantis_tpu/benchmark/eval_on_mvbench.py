"""MVBench video benchmark driver.

Behavioral port of the reference
(reference: mantis/benchmark/eval_on_mvbench.py:8-120 and
mvbench_eval_utils.py:430-577): 20 subtasks x 200 questions, uniform
``num_segments`` frame sampling with optional start/end bounds, frames
sent as interleaved images, letter-match scoring.  Video decode uses cv2
(decord is not in this image).
"""

from __future__ import annotations

import argparse
import json
import os
from pathlib import Path
from typing import List, Optional

import numpy as np
from PIL import Image

from mantis_tpu.benchmark.adapters import MLLM_Models

# (name, json file, video dir prefix, media type, has_bounds)
# (reference: eval_on_mvbench.py:23-45)
DATA_LIST = [
    ("Action Sequence", "action_sequence.json",
     "star/Charades_v1_480/", "video", True),
    ("Action Prediction", "action_prediction.json",
     "star/Charades_v1_480/", "video", True),
    ("Action Antonym", "action_antonym.json", "ssv2_video/", "video",
     False),
    ("Fine-grained Action", "fine_grained_action.json",
     "Moments_in_Time_Raw/videos/", "video", False),
    ("Unexpected Action", "unexpected_action.json", "FunQA_test/test/",
     "video", False),
    ("Object Existence", "object_existence.json",
     "clevrer/video_validation/", "video", False),
    ("Object Interaction", "object_interaction.json",
     "star/Charades_v1_480/", "video", True),
    ("Object Shuffle", "object_shuffle.json", "perception/videos/",
     "video", False),
    ("Moving Direction", "moving_direction.json",
     "clevrer/video_validation/", "video", False),
    ("Action Localization", "action_localization.json", "sta/sta_video/",
     "video", True),
    ("Scene Transition", "scene_transition.json", "scene_qa/video/",
     "video", False),
    ("Action Count", "action_count.json", "perception/videos/", "video",
     False),
    ("Moving Count", "moving_count.json", "clevrer/video_validation/",
     "video", False),
    ("Moving Attribute", "moving_attribute.json",
     "clevrer/video_validation/", "video", False),
    ("State Change", "state_change.json", "perception/videos/", "video",
     False),
    ("Fine-grained Pose", "fine_grained_pose.json", "nturgbd/", "video",
     False),
    ("Character Order", "character_order.json", "perception/videos/",
     "video", False),
    ("Egocentric Navigation", "egocentric_navigation.json", "vlnqa/",
     "video", False),
    ("Episodic Reasoning", "episodic_reasoning.json",
     "tvqa/frames_fps3_hq/", "frame", True),
    ("Counterfactual Inference", "counterfactual_inference.json",
     "clevrer/video_validation/", "video", False),
]


def get_frame_indices(num_segments: int, max_frame: int, fps: float,
                      bound=None, first_idx: int = 0) -> np.ndarray:
    """EXACT reference frame-index formula
    (reference: mvbench_eval_utils.py:496-507 get_index): bounds in
    seconds are rounded to frames, clamped to [first_idx, max_frame],
    and the segment centers are int(start + seg/2 + round(seg*i)).
    MVBench accuracy depends on byte-identical frame choices, so this
    is golden-pinned in tests/test_video_datasets.py."""
    if bound:
        start, end = bound[0], bound[1]
    else:
        start, end = -100000, 100000
    start_idx = max(first_idx, round(start * fps))
    end_idx = min(round(end * fps), max_frame)
    seg_size = float(end_idx - start_idx) / num_segments
    return np.array([
        int(start_idx + (seg_size / 2) + np.round(seg_size * i))
        for i in range(num_segments)])


def uniform_indices(num_segments: int, total: int, start: int = 0,
                    end: Optional[int] = None) -> np.ndarray:
    """Back-compat shim over get_frame_indices for unbounded uniform
    sampling over ``total`` decoded frames (max_frame = total-1 like
    the reference's decord len(vr)-1)."""
    del start, end
    return get_frame_indices(num_segments, total - 1, fps=1.0)


def read_video_frames(path: str, num_segments: int, bound=None,
                      resolution: int = 224) -> List[Image.Image]:
    import cv2

    cap = cv2.VideoCapture(path)
    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    # reference read_video: max_frame = len(vr) - 1, first_idx = 0
    idxs = get_frame_indices(num_segments, total - 1, fps, bound)
    frames = []
    for i in idxs:
        cap.set(cv2.CAP_PROP_POS_FRAMES, int(max(i, 0)))
        ok, frame = cap.read()
        if not ok:
            continue
        img = Image.fromarray(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        img = img.resize((resolution, resolution))
        frames.append(img)
    cap.release()
    if not frames:
        # a silently dropped video would let the model answer without
        # ever seeing it (same contract as chat_models.load_video_frames)
        raise ValueError(f"could not decode any frame from {path!r}")
    return frames


def read_frame_dir(path: str, num_segments: int, bound=None, fps: float = 3,
                   resolution: int = 224) -> List[Image.Image]:
    files = sorted(os.listdir(path))
    total = len(files)
    # reference read_frame: max_frame = len(listdir), first_idx = 1,
    # file for index i named f"{i:05d}.jpg" (files[i-1] when sorted)
    idxs = get_frame_indices(num_segments, total, fps, bound,
                             first_idx=1)
    frames = []
    for i in idxs:
        name = f"{int(i):05d}.jpg"
        fp = os.path.join(path, name)
        if not os.path.exists(fp):
            fp = os.path.join(
                path, files[int(np.clip(i - 1, 0, total - 1))])
        img = Image.open(fp).convert("RGB")
        frames.append(img.resize((resolution, resolution)))
    return frames


def check_answer(pred: str, gt: str) -> bool:
    """Letter-match scoring (reference: eval_on_mvbench.py:94-105)."""
    flag = False
    pred_list = pred.lower().split(" ")
    pred_option, _ = pred_list[0], " ".join(pred_list[1:])
    gt_list = gt.lower().split(" ")
    gt_option, gt_content = gt_list[0], " ".join(gt_list[1:])
    if gt_content.endswith("."):
        gt_content = gt_content[:-1]
    if pred_option.replace(".", "") in gt_option:
        flag = True
    elif gt_option in pred_option:
        flag = True
    return flag


def main(model_name: str, json_dir: str, video_dir: str,
         num_frames: int = 4, resolution: int = 224,
         results_dir: str = "results/mvbench", max_size=None,
         model_instance=None, workers: int = 1, use_engine: bool = False,
         engine_opts=None):
    """workers > 1 runs examples through a thread pool on a
    ``concurrent_safe`` adapter (see benchmark/eval.py — same
    protocol); frame decode (cv2, host-side) also overlaps.  Resume is
    keyed on (task, idx), so out-of-order JSONL lines are fine."""
    import threading

    model = model_instance or (MLLM_Models(model_name)()
                               if model_name != "random" else None)
    owned_engine = None
    if use_engine and model is not None:
        from mantis_tpu.serving.engine import wrap_adapter_in_engine

        model = wrap_adapter_in_engine(model, engine_opts)
        owned_engine = model.engine
    os.makedirs(results_dir, exist_ok=True)
    results_path = Path(results_dir) / (
        f"{model_name.replace('/', '_').replace(':', '_')}"
        f"_{num_frames}frames.jsonl")
    existing = {}
    if results_path.exists():
        with open(results_path) as f:
            for line in f:
                r = json.loads(line)
                if not r.get("error"):   # error records retry on resume
                    existing[(r["task"], r["idx"])] = r

    tasks = []    # (task, items) in DATA_LIST order, for the summary
    todo = []     # (task, idx, item, prefix, media, has_bounds)
    for task, json_file, prefix, media, has_bounds in DATA_LIST:
        jp = os.path.join(json_dir, json_file)
        if not os.path.exists(jp):
            continue
        with open(jp) as f:
            items = json.load(f)
        if max_size:
            items = items[:max_size]
        tasks.append((task, items))
        for idx, item in enumerate(items):
            if (task, idx) not in existing:
                todo.append((task, idx, item, prefix, media, has_bounds))

    results = dict(existing)
    with open(results_path, "a+") as out_f:
        write_lock = threading.Lock()

        def run_one(job):
            task, idx, item, prefix, media, has_bounds = job
            bound = None
            if has_bounds and "start" in item:
                bound = (item["start"], item["end"])
            question = item["question"]
            options = item["candidates"]
            q = question + "\nOptions:\n"
            answer_opt = None
            for i, c in enumerate(options):
                q += f"({chr(ord('A') + i)}) {c}\n"
                if str(c) == str(item["answer"]):
                    answer_opt = f"({chr(ord('A') + i)}) {c}"
            if answer_opt is None:
                # answer not an exact candidate match: score against
                # the raw answer string instead of crashing the run
                answer_opt = str(item["answer"])
            prompt = (
                "Carefully watch the video and pay attention to "
                "the cause and sequence of events, the detail and "
                "movement of objects, and the action and pose of "
                "persons. Based on your observations, select the "
                "best option that accurately addresses the "
                "question.\n" + q
                + "Only give the best option.\nBest option:(")
            error = None
            try:
                # frame decode inside the protected zone: a missing or
                # undecodable video records an error (and is retried on
                # resume) instead of either aborting the run or letting
                # the model answer BLIND on a text-only prompt
                vpath = os.path.join(video_dir, prefix, item["video"])
                if media == "frame":
                    frames = read_frame_dir(
                        vpath, num_frames, bound, resolution=resolution)
                else:
                    frames = read_video_frames(
                        vpath, num_frames, bound, resolution=resolution)
                messages = [{"type": "image", "content": fr}
                            for fr in frames]
                messages.append({"type": "text", "content": prompt})
                raw = model(messages) if model else "(A)"
            except Exception as e:
                # per-example containment (see benchmark/eval.py)
                print(f"[mvbench] {task}/{idx} failed: "
                      f"{type(e).__name__}: {e}", flush=True)
                raw, error = "", f"{type(e).__name__}: {e}"
            r = {"task": task, "idx": idx,
                 "pred": raw, "gt": answer_opt,
                 # "" would letter-match everything ("" in x is True)
                 "correct": bool(raw) and check_answer(raw, answer_opt)}
            if error is not None:
                r["error"] = error
            with write_lock:
                out_f.write(json.dumps(r) + "\n")
                out_f.flush()
                results[(task, idx)] = r

        try:
            if workers > 1 and getattr(model, "concurrent_safe", False):
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(max_workers=workers) as ex:
                    list(ex.map(run_one, todo))
            else:
                for job in todo:
                    run_one(job)
        finally:
            if owned_engine is not None:
                owned_engine.shutdown()

    per_task = {}
    for task, items in tasks:
        correct = sum(int(results[(task, i)]["correct"])
                      for i in range(len(items)))
        per_task[task] = (correct, len(items))

    print("MVBench results:")
    all_c = sum(c for c, _ in per_task.values())
    all_t = sum(t for _, t in per_task.values())
    for task, (c, t) in per_task.items():
        print(f"  {task}: {c}/{t} = {c / max(t, 1):.4f}")
    if all_t:
        print(f"Overall: {all_c}/{all_t} = {all_c / all_t:.4f}")
    return per_task


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--model_name", required=True)
    p.add_argument("--json_dir", required=True)
    p.add_argument("--video_dir", required=True)
    p.add_argument("--num_frames", type=int, default=4)
    p.add_argument("--resolution", type=int, default=224)
    p.add_argument("--results_dir", default="results/mvbench")
    p.add_argument("--max_size", type=int, default=None)
    p.add_argument("--workers", type=int, default=1,
                   help="concurrent examples (effective with "
                        "--use_engine; frame decode overlaps too)")
    p.add_argument("--use_engine", action="store_true",
                   help="wrap the adapter in the continuous-batching "
                        "engine (mantis-tpu family)")
    a = p.parse_args()
    main(**vars(a))
