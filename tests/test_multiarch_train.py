"""Smoke-train every architecture end-to-end through the generic CLI
(VERDICT #4 done-criterion: per-arch loss decreases on example data and
the checkpoint round-trips).  Mirrors the reference's
train_example_chat.sh debug recipe (reference: README.md:84-99)."""

import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHAT = os.path.join(REPO, "examples", "data", "chat", "train.json")
SV = os.path.join(REPO, "examples", "data", "siglip_video",
                  "train.json")

ARCHS = ["mllava", "idefics2", "idefics2_delta", "idefics3", "internvl",
         "qwen2_vl", "mfuyu", "openflamingo", "siglip_video",
         "videollava", "qwen2_vl_vae", "mllava_next"]


def _read_metrics(out_dir):
    with open(os.path.join(out_dir, "metrics.jsonl")) as f:
        return [json.loads(l) for l in f if l.strip()]


def _run(arch, out_dir, extra=()):
    from mantis_tpu.train.train import main

    data = SV if arch == "siglip_video" else CHAT
    main([
        "--arch", arch, "--init_random", "--data_path", data,
        "--output_dir", out_dir, "--max_steps", "8",
        "--batch_size", "2", "--learning_rate", "3e-3",
        "--lr_schedule", "constant", "--compute_dtype", "float32",
        "--max_seq_len", "1024", "--no_remat", "--save_steps", "8",
        "--num_frames", "2", "--mesh_data", "2", "--mesh_fsdp", "1",
        *extra,
    ])
    return _read_metrics(out_dir)


@pytest.mark.parametrize("arch", ARCHS)
def test_smoke_train_loss_decreases(arch, tmp_path):
    out = str(tmp_path / arch)
    metrics = _run(arch, out)
    losses = [m["loss"] for m in metrics]
    assert len(losses) == 8
    assert all(l == l and abs(l) < 1e9 for l in losses), losses  # finite
    assert losses[-1] < losses[0], (arch, losses)
    # checkpoint written and resumable: continuing adds steps on top
    ckpts = [d for d in os.listdir(out) if d.startswith("checkpoint-")]
    assert ckpts, os.listdir(out)
    metrics2 = _run(arch, out)  # resumes from checkpoint-8
    assert metrics2[-1]["step"] == 8  # already done; no extra steps run


def test_lora_smoke_qwen2_vl(tmp_path):
    out = str(tmp_path / "qwen_lora")
    metrics = _run("qwen2_vl", out,
                   extra=("--use_lora", "--lora_r", "4",
                          "--lora_alpha", "8", "--learning_rate",
                          "5e-3"))
    losses = [m["loss"] for m in metrics]
    assert losses[-1] < losses[0], losses


def test_internvl_context_parallel_smoke(tmp_path):
    """The reference's core long-context recipe (train_intern_vl_25.sh):
    internvl trained with ring-attention context parallelism + ring
    vision DP through the generic CLI."""
    out = str(tmp_path / "internvl_cp")
    metrics = _run("internvl", out,
                   extra=("--mesh_data", "1", "--mesh_fsdp", "2",
                          "--mesh_context", "2", "--ring_vision_dp",
                          "--max_seq_len", "1024"))
    losses = [m["loss"] for m in metrics]
    assert losses[-1] < losses[0], losses


def test_mesh_tensor_train_smoke(tmp_path):
    """--mesh_tensor on the training CLI (VERDICT r3 item 10): a
    (data=1, fsdp=2, tensor=2) step trains green on the CPU mesh and
    matches the data-parallel-only loss trajectory (TP is a layout
    choice, not a math change)."""
    out = str(tmp_path / "mllava_tp")
    metrics = _run("mllava", out,
                   extra=("--mesh_data", "1", "--mesh_fsdp", "2",
                          "--mesh_tensor", "2"))
    losses = [m["loss"] for m in metrics]
    assert losses[-1] < losses[0], losses

    ref = _run("mllava", str(tmp_path / "mllava_dp"))
    ref_losses = [m["loss"] for m in ref]
    assert losses == pytest.approx(ref_losses, rel=2e-4), (
        losses, ref_losses)


def test_optimizer_offload_train_smoke(tmp_path):
    """--optimizer_offload (zero3_offload equivalent, VERDICT r3 item
    2): the CLI path trains green and matches the on-device trajectory
    bit-for-bit.  On CPU host_memory_supported() is False so this
    exercises the graceful fallback; the real pinned_host residence is
    measured on TPU (bench.py bench_train_mfu, scripts/
    bench_mfu_honest.py)."""
    out = str(tmp_path / "mllava_off")
    metrics = _run("mllava", out, extra=("--optimizer_offload",))
    losses = [m["loss"] for m in metrics]
    ref = _run("mllava", str(tmp_path / "mllava_dev"))
    assert losses == [m["loss"] for m in ref], losses


def _write_tiny_videos(d, n=4, frames=6, size=32):
    """Synthesize tiny .avi clips + a chat_video train.json."""
    import cv2
    import numpy as np

    os.makedirs(d, exist_ok=True)
    items = []
    for i in range(n):
        path = os.path.join(d, f"clip{i}.avi")
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"),
                            5.0, (size, size))
        rng = np.random.RandomState(i)
        for _ in range(frames):
            w.write(rng.randint(0, 255, (size, size, 3), np.uint8))
        w.release()
        items.append({
            "id": f"v{i}",
            "video": f"clip{i}.avi",
            "conversations": [
                {"from": "human",
                 "value": f"<video> what happens in clip {i}?"},
                {"from": "gpt", "value": f"noise pattern {i} flickers"},
            ]})
    train = os.path.join(d, "train.json")
    with open(train, "w") as f:
        json.dump(items, f)
    return train


def test_videollava_video_encoder_smoke(tmp_path):
    """The reference recipe (train_videollava.py: use_video_encoder=True):
    frames go through the video tower; <video> expands to
    num_frames * (patches + 1) placeholder tokens."""
    data = _write_tiny_videos(str(tmp_path / "vids"))
    out = str(tmp_path / "videollava_enc")
    from mantis_tpu.train.train import main

    main([
        "--arch", "videollava", "--init_random", "--data_path", data,
        "--use_video_encoder", "--num_frames", "2",
        "--output_dir", out, "--max_steps", "8", "--batch_size", "2",
        "--learning_rate", "3e-3", "--lr_schedule", "constant",
        "--compute_dtype", "float32", "--max_seq_len", "512",
        "--no_remat", "--save_steps", "8", "--mesh_data", "2",
        "--mesh_fsdp", "1",
    ])
    metrics = _read_metrics(out)
    losses = [m["loss"] for m in metrics]
    assert len(losses) == 8 and losses[-1] < losses[0], losses


def _write_cls_data(d, n=8):
    """Items with images + float 'labels' dicts (the reference
    ClassificationDataset contract, data.py:1138-1349)."""
    from PIL import Image
    import numpy as np

    os.makedirs(os.path.join(d, "imgs"), exist_ok=True)
    items = []
    for i in range(n):
        rng = np.random.RandomState(i)
        img = Image.fromarray(
            rng.randint(0, 255, (32, 32, 3), np.uint8))
        rel = f"imgs/c{i}.png"
        img.save(os.path.join(d, rel))
        items.append({
            "id": f"c{i}",
            "images": [rel],
            "conversations": [
                {"from": "human", "value": "<image> rate this clip"},
                {"from": "gpt", "value": "ok"},
            ],
            # constant targets: the prompt text is identical across
            # items, so the (bias-free) score head can fit them and the
            # smoke loss decreases deterministically
            "labels": {"visual_quality": 0.7,
                       "temporal_consistency": 0.2},
        })
    train = os.path.join(d, "train.json")
    with open(train, "w") as f:
        json.dump(items, f)
    return train


@pytest.mark.parametrize("arch,ptype", [
    ("qwen2_vl", "regression"),
    ("idefics2", "multi_label_classification"),
])
def test_classification_training(arch, ptype, tmp_path):
    """--problem_type trains the sequence-classification head
    (reference: Idefics2/Qwen2VLForSequenceClassification +
    ClassificationDataset)."""
    data = _write_cls_data(str(tmp_path / "cls"))
    out = str(tmp_path / f"{arch}_{ptype}")
    from mantis_tpu.train.train import main

    main([
        "--arch", arch, "--init_random", "--data_path", data,
        "--problem_type", ptype,
        "--output_dir", out, "--max_steps", "8", "--batch_size", "2",
        "--learning_rate", "3e-3", "--lr_schedule", "constant",
        "--compute_dtype", "float32", "--max_seq_len", "512",
        "--no_remat", "--save_steps", "8", "--mesh_data", "2",
        "--mesh_fsdp", "1",
    ])
    metrics = _read_metrics(out)
    losses = [m["loss"] for m in metrics]
    assert len(losses) == 8 and losses[-1] < losses[0], losses


def test_export_hf_then_eval_adapter(tmp_path):
    """Train -> --export_hf -> the eval adapter consumes the run's own
    output (the reference loop: trainer.save_model -> mllm_tools
    from_pretrained)."""
    out = str(tmp_path / "idefics2_hf")
    _run("idefics2", out, extra=("--export_hf",))
    hf_dir = os.path.join(out, "hf")
    assert os.path.exists(os.path.join(hf_dir, "model.safetensors"))
    from mantis_tpu.benchmark.adapters import MLLM_Models

    adapter = MLLM_Models(f"idefics2:{hf_dir}")()
    adapter.max_new_tokens = 4
    ans = adapter([{"type": "text", "content": "hello there"}])
    assert isinstance(ans, str)


def test_qwen2_label_special_token_classification(tmp_path):
    """score_type=special_token: one <|LABEL_i|> token per label
    appended, logits pooled at those positions (reference
    data.py:1328-1332 + Qwen2VLForSequenceClassification)."""
    data = _write_cls_data(str(tmp_path / "cls"))
    out = str(tmp_path / "qwen2_special")
    from mantis_tpu.train.train import main

    main([
        "--arch", "qwen2_vl", "--init_random", "--data_path", data,
        "--problem_type", "multi_label_classification",
        "--use_label_special_tokens",
        "--output_dir", out, "--max_steps", "8", "--batch_size", "2",
        "--learning_rate", "3e-3", "--lr_schedule", "constant",
        "--compute_dtype", "float32", "--max_seq_len", "512",
        "--no_remat", "--save_steps", "8", "--mesh_data", "2",
        "--mesh_fsdp", "1",
    ])
    metrics = _read_metrics(out)
    losses = [m["loss"] for m in metrics]
    assert len(losses) == 8 and losses[-1] < losses[0], losses


def _export_ckpt(arch, tmp_path, data=None):
    import jax
    import jax.numpy as jnp

    from mantis_tpu.io.hf_export import save_checkpoint
    from mantis_tpu.train.archs import get_arch
    from mantis_tpu.utils.debug_tokenizer import (
        build_tokenizer_from_json_data)

    tok = build_tokenizer_from_json_data([data or CHAT])
    spec = get_arch(arch)
    cfg = spec.debug_config(tok)
    params = spec.init_params(cfg, jax.random.PRNGKey(1), jnp.float32)
    d = str(tmp_path / f"{arch}_ckpt")
    save_checkpoint(arch, params, cfg, d)
    tok.save_pretrained(d)
    return d


def test_finetune_from_hf_checkpoint(tmp_path):
    """--model_path fine-tunes from an HF checkpoint (the reference's
    from_pretrained flow) through the generic trainer."""
    from mantis_tpu.train.train import main

    ck = _export_ckpt("idefics3", tmp_path)
    out = str(tmp_path / "out")
    main(["--arch", "idefics3", "--model_path", ck,
          "--data_path", CHAT, "--output_dir", out,
          "--max_steps", "4", "--batch_size", "2",
          "--learning_rate", "3e-3", "--lr_schedule", "constant",
          "--compute_dtype", "float32", "--max_seq_len", "1024",
          "--no_remat", "--save_steps", "4", "--mesh_data", "2"])
    losses = [m["loss"] for m in _read_metrics(out)]
    assert len(losses) == 4
    assert losses[-1] < losses[0], losses


def test_wrong_arch_checkpoint_rejected(tmp_path):
    from mantis_tpu.train.train import main

    ck = _export_ckpt("idefics3", tmp_path)
    with pytest.raises(SystemExit, match="idefics3"):
        main(["--arch", "qwen2_vl", "--model_path", ck,
              "--data_path", CHAT,
              "--output_dir", str(tmp_path / "o"), "--max_steps", "1"])


def test_classification_from_hf_checkpoint(tmp_path):
    """Checkpoint backbone + FRESH classification head (the reference's
    from_pretrained + num_labels flow, train_qwen2_vl.py)."""
    from mantis_tpu.train.train import main

    data = _write_cls_data(tmp_path)
    ck = _export_ckpt("qwen2_vl", tmp_path, data=data)
    out = str(tmp_path / "out_cls")
    main(["--arch", "qwen2_vl", "--model_path", ck,
          "--data_path", data, "--output_dir", out,
          "--problem_type", "multi_label_classification",
          "--max_steps", "4", "--batch_size", "2",
          "--learning_rate", "3e-3", "--lr_schedule", "constant",
          "--compute_dtype", "float32", "--max_seq_len", "512",
          "--no_remat", "--save_steps", "4", "--mesh_data", "2"])
    losses = [m["loss"] for m in _read_metrics(out)]
    assert len(losses) == 4
    assert all(l == l for l in losses)


def test_xattn_pretrain_trains_the_cross_attn_branch(tmp_path):
    """--xattn_pretrain must actually train SOMETHING: the config's
    cross-attn branch is enabled, the subtree exists (cloned from
    self-attn, zero gates), only it is trainable, and the loss moves
    (the gates must open for anything to change)."""
    out = str(tmp_path / "internvl_xattn")
    metrics = _run("internvl", out, extra=("--xattn_pretrain",))
    losses = [m["loss"] for m in metrics]
    assert len(losses) == 8
    assert all(l == l and abs(l) < 1e9 for l in losses), losses
    assert losses[-1] != losses[0], (
        "cross-attn pretrain changed nothing", losses)


def test_adamw8bit_in_backward_cli_smoke(tmp_path):
    """--adamw8bit --unstacked_layers --mlp_chunk through the generic
    CLI (the single-chip measured-MFU training mode, docs/PERF.md):
    per-layer custom_vjp in-backward updates + int8 moments + chunked
    MLP + chunked CE, loss decreases on example data."""
    out = str(tmp_path / "mllava_8bit")
    metrics = _run("mllava", out,
                   extra=("--adamw8bit", "--unstacked_layers",
                          "--grad_clip", "0", "--mlp_chunk", "2",
                          "--loss_chunk_size", "256",
                          "--mesh_data", "1"))
    losses = [m["loss"] for m in metrics]
    assert len(losses) == 8
    assert losses[-1] < losses[0], losses


def test_adamw8bit_guards(tmp_path):
    """Loud refusals: unstacked layers reject sharded meshes, and
    in-backward rejects same-step grad clipping."""
    import pytest as _pytest

    with _pytest.raises(SystemExit, match="unstacked_layers"):
        _run("mllava", str(tmp_path / "x"),
             extra=("--adamw8bit", "--unstacked_layers",
                    "--grad_clip", "0", "--mesh_data", "1",
                    "--mesh_fsdp", "2"))
    with _pytest.raises(ValueError, match="grad_clip"):
        _run("mllava", str(tmp_path / "y"),
             extra=("--adamw8bit", "--mesh_data", "1"))


def test_adamw8bit_data_parallel_smoke(tmp_path):
    """adamw8bit-in-backward under a 2-way DATA mesh: grads arrive
    psum-reduced and replicated, the fused update kernel runs
    identically on every device, and the unstacked per-layer hook
    composes with pjit batch sharding (the mode's documented
    multi-device envelope: pure data parallel)."""
    out = str(tmp_path / "mllava_8bit_dp")
    metrics = _run("mllava", out,
                   extra=("--adamw8bit", "--unstacked_layers",
                          "--grad_clip", "0", "--mlp_chunk", "2",
                          "--mesh_data", "2"))
    losses = [m["loss"] for m in metrics]
    assert losses[-1] < losses[0], losses
