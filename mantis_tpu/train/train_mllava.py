"""MLlava SFT entry point.

TPU-native equivalent of the reference trainer CLI
(reference: mantis/train/train_mllava.py:29-355 + scripts/train_mllava.sh):
same workflow — args -> load model (init/HF; LoRA/freezing policy) ->
conv-template pick -> YAML data config -> train loop with auto-resume,
periodic checkpoints and final save — but executed as a pjit-sharded JAX
step over a named mesh instead of HF Trainer + DeepSpeed.

Usage:
  python -m mantis_tpu.train.train_mllava \
      --model_path /ckpts/Mantis-8B-siglip-llama3 \
      --data_config_path examples/data_config_example.yaml \
      --output_dir /tmp/mantis_sft --max_steps 100 --batch_size 4
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from mantis_tpu.models.configs import LlamaConfig, LlavaConfig, VisionConfig
from mantis_tpu.models.conversation import conv_templates
from mantis_tpu.models.mllava import model as mllava_model
from mantis_tpu.models.mllava.processor import (
    ImageProcessorConfig, MantisImageProcessor, MLlavaProcessor)
from mantis_tpu.parallel.mesh import create_mesh
from mantis_tpu.parallel.sharding import batch_sharding, shard_params
from mantis_tpu.train import data as data_lib
from mantis_tpu.train import trainer as trainer_lib
from mantis_tpu.train.checkpoints import CheckpointManager
from mantis_tpu.train.lora import LoraConfig, init_lora_params
from mantis_tpu.utils.metrics import MetricsLogger, estimate_train_flops


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    # model
    p.add_argument("--model_path", type=str, default=None,
                   help="local HF checkpoint dir (Mantis/LLaVA layout)")
    p.add_argument("--init_random", action="store_true",
                   help="random-init a model instead of loading (debug)")
    p.add_argument("--tower_type", default="siglip",
                   choices=["clip", "siglip"])
    p.add_argument("--conv_template", default=None)
    p.add_argument("--param_dtype", default="float32")
    # lora / freezing (reference defaults: r=128 a=256, vision frozen)
    p.add_argument("--use_lora", action="store_true")
    p.add_argument("--use_qlora", action="store_true")
    p.add_argument("--use_dora", action="store_true")
    p.add_argument("--lora_r", type=int, default=128)
    p.add_argument("--lora_alpha", type=float, default=256.0)
    p.add_argument("--train_vision", action="store_true")
    p.add_argument("--do_pretrain", action="store_true",
                   help="stage-1: train projector only (lr 1e-3 recipe)")
    # data
    p.add_argument("--data_config_path", type=str, required=False)
    p.add_argument("--max_seq_len", type=int, default=8192)
    p.add_argument("--packing", action="store_true")
    p.add_argument("--batch_size", type=int, default=1,
                   help="per-micro-step global batch")
    p.add_argument("--gradient_accumulation_steps", type=int, default=1,
                   help="micro-batches per optimizer step (effective "
                   "batch = batch_size * this; reference arithmetic "
                   "train_mllava.sh:135-137)")
    # optimization (reference: lr 1e-5 cosine, warmup 3%, wd 0, bf16)
    p.add_argument("--learning_rate", type=float, default=1e-5)
    p.add_argument("--lr_schedule", default="cosine")
    p.add_argument("--warmup_ratio", type=float, default=0.03)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--max_steps", type=int, default=-1)
    p.add_argument("--num_epochs", type=float, default=1.0)
    p.add_argument("--grad_clip", type=float, default=1.0)
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--no_remat", action="store_true")
    p.add_argument("--remat_policy", default="nothing",
                   choices=["nothing", "dots"])
    p.add_argument("--loss_chunk_size", type=int, default=0,
                   help="chunked cross-entropy (liger equivalent): "
                   "never materialize [B,S,vocab] logits; needed for "
                   "vocab-128k SFT at seq 8192 on 16 GB chips")
    # mesh
    p.add_argument("--mesh_data", type=int, default=-1)
    p.add_argument("--mesh_fsdp", type=int, default=1)
    p.add_argument("--mesh_context", type=int, default=1)
    p.add_argument("--ring_vision_dp", action="store_true",
                   help="shard image encoding over the context/ring "
                        "group (reference "
                        "modeling_internvl_chat.py:200-228)")
    p.add_argument("--mesh_tensor", type=int, default=1)
    # io
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--save_steps", type=int, default=500)
    p.add_argument("--save_total_limit", type=int, default=1)
    p.add_argument("--logging_steps", type=int, default=1)
    p.add_argument("--resume", action="store_true", default=True)
    p.add_argument("--seed", type=int, default=42)
    return p.parse_args(argv)


def tiny_debug_config() -> LlavaConfig:
    return LlavaConfig(
        vision_config=VisionConfig(
            tower_type="clip", hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, image_size=56,
            patch_size=14),
        text_config=LlamaConfig(
            vocab_size=2048, hidden_size=128, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, rope_theta=10000.0),
        image_token_index=2047,
    )


def load_model(args):
    """Model + processor (reference load_model, train_mllava.py:130-263)."""
    if args.model_path and not args.init_random:
        from mantis_tpu.io.hf_loader import load_llava

        cfg, params = load_llava(
            args.model_path, dtype=jnp.dtype(args.param_dtype))
        processor = MLlavaProcessor.from_pretrained(
            args.model_path, num_image_tokens=cfg.num_image_tokens,
            tower_type=cfg.vision_config.tower_type,
            image_size=cfg.vision_config.image_size)
        name = args.model_path
    else:
        # Debug path (the reference's train_example_* smoke recipe):
        # tiny random model + a tokenizer synthesized from the data.
        import yaml

        from mantis_tpu.utils.debug_tokenizer import (
            build_tokenizer_from_json_data)

        with open(args.data_config_path) as f:
            dcfg = yaml.safe_load(f)
        paths = [e["path"] for e in dcfg.get("data", [])
                 if os.path.exists(e["path"])]
        tok = build_tokenizer_from_json_data(paths)
        base = tiny_debug_config()
        vocab = max(len(tok.get_vocab()) + 8, 64)
        cfg = dataclasses.replace(
            base,
            text_config=dataclasses.replace(
                base.text_config, vocab_size=vocab),
            image_token_index=tok.convert_tokens_to_ids("<image>"),
        )
        params = mllava_model.init_params(
            cfg, jax.random.PRNGKey(args.seed),
            dtype=jnp.dtype(args.param_dtype))
        ip = MantisImageProcessor(ImageProcessorConfig.for_tower(
            args.tower_type, cfg.vision_config.image_size))
        processor = MLlavaProcessor(tok, ip, cfg.num_image_tokens)
        name = "debug-random"
    return cfg, params, processor, name


def pick_conv(args, model_name: str):
    if args.conv_template:
        return conv_templates[args.conv_template]
    if "llama-3" in model_name.lower() or "llama3" in model_name.lower():
        return conv_templates["llama_3"]
    return conv_templates["mllava_v1"]


def main(argv=None):
    args = parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)

    mesh = create_mesh(data=args.mesh_data, fsdp=args.mesh_fsdp,
                       context=args.mesh_context, tensor=args.mesh_tensor)
    print(f"mesh: {dict(mesh.shape)} over {len(jax.devices())} devices")

    cfg, params, processor, model_name = load_model(args)
    conv = pick_conv(args, model_name)

    cp = args.mesh_context
    data_args = {
        "max_seq_len": args.max_seq_len,
        "image_size": cfg.vision_config.image_size,
    }
    if cp > 1:
        # ring attention needs seq multiples of 2*W*128 (zigzag chunks)
        data_args["ensure_seq_len_multiple_of"] = 2 * cp * 128
        data_args["seq_buckets"] = tuple(
            b for b in (512, 1024, 2048, 4096, 8192)
            if b % (2 * cp * 128) == 0) or (args.max_seq_len,)
    if args.packing:
        data_args["max_self_attn_len"] = args.max_seq_len
    train_ds, _, _, collator = data_lib.load_data_from_config(
        args.data_config_path, processor, conv, data_args)
    if cp > 1:
        collator.cp = cp
    data_lib.set_default_image_token_id(processor.image_token_index)
    loader = data_lib.DataLoader(
        train_ds, collator, args.batch_size, shuffle=True, seed=args.seed)

    accum = max(args.gradient_accumulation_steps, 1)
    steps_per_epoch = max(len(loader) // accum, 1)  # optimizer steps
    max_steps = (args.max_steps if args.max_steps > 0
                 else int(steps_per_epoch * args.num_epochs))
    micro_steps = max_steps * accum

    lora_cfg = None
    if args.use_lora or args.use_qlora or args.use_dora:
        lora_cfg = LoraConfig(r=args.lora_r, alpha=args.lora_alpha,
                              use_dora=args.use_dora)
    tcfg = trainer_lib.TrainConfig(
        learning_rate=(1e-3 if args.do_pretrain else args.learning_rate),
        lr_schedule=args.lr_schedule, warmup_ratio=args.warmup_ratio,
        max_steps=max_steps, weight_decay=args.weight_decay,
        gradient_accumulation_steps=accum,
        grad_clip=args.grad_clip, compute_dtype=args.compute_dtype,
        use_remat=False if args.no_remat else args.remat_policy,
        loss_chunk_size=args.loss_chunk_size,
        tune_projector_only=args.do_pretrain,
        freeze_vision=not args.train_vision, lora=lora_cfg)

    ctx_attn = None
    if cp > 1:
        from mantis_tpu.ops.ring_attention import make_context_attention

        ctx_attn = make_context_attention(mesh, "context")

    opt, sched = trainer_lib.make_optimizer(tcfg)
    if lora_cfg is not None:
        if args.use_qlora:
            # 4-bit frozen base (reference: bnb NF4, train_mllava.py:134-142)
            from mantis_tpu.ops.quant import quantize_tree

            params = quantize_tree(params, bits=4)
        base = shard_params(params, mesh)
        trainable = init_lora_params(
            params, lora_cfg, jax.random.PRNGKey(args.seed + 1))
        if lora_cfg.use_dora:
            from mantis_tpu.train.lora import init_dora_magnitudes

            trainable = init_dora_magnitudes(params, trainable)
        trainable = shard_params(trainable, mesh)
        frozen = None
        step_fn = trainer_lib.make_train_step(
            mllava_model.forward, cfg, tcfg, opt, frozen,
            base_params_for_lora=base, context_attention=ctx_attn,
            labels_preshifted=cp > 1,
            vision_dp_mesh=mesh if args.ring_vision_dp else None)
    else:
        pred = lambda p: trainer_lib.default_trainable_pred(  # noqa: E731
            p, freeze_vision=tcfg.freeze_vision,
            tune_projector_only=tcfg.tune_projector_only)
        trainable, frozen = trainer_lib.partition_params(params, pred)
        trainable = shard_params(trainable, mesh)
        frozen = shard_params(frozen, mesh)
        step_fn = trainer_lib.make_train_step(
            mllava_model.forward, cfg, tcfg, opt, frozen,
            context_attention=ctx_attn, labels_preshifted=cp > 1,
            vision_dp_mesh=mesh if args.ring_vision_dp else None)

    state = trainer_lib.create_train_state(trainable, opt)
    mgr = CheckpointManager(args.output_dir, args.save_total_limit)
    if args.resume:
        restored, start_step = mgr.restore_latest(state)
        if restored is not None:
            state = restored
            print(f"resumed from checkpoint-{start_step}")

    bs = batch_sharding(mesh)
    from jax.sharding import NamedSharding, PartitionSpec

    def put_batch(batch):
        out = {}
        for k, v in batch.items():
            # pixel_values never takes the [B, S] spec: dim 1 is
            # channels (invalid under context>1) and ring vision DP
            # must win even when image count == batch size
            if k == "pixel_values":
                if args.ring_vision_dp:
                    spec = PartitionSpec("context")
                elif v.shape[0] == args.batch_size:
                    spec = PartitionSpec(("data", "fsdp"))
                else:
                    spec = PartitionSpec()
                out[k] = jax.device_put(v, NamedSharding(mesh, spec))
            elif v.ndim >= 2 and v.shape[0] == args.batch_size:
                out[k] = jax.device_put(v, bs)
            else:
                out[k] = jax.device_put(
                    v, NamedSharding(mesh, PartitionSpec()))
        return out

    logger = MetricsLogger(os.path.join(args.output_dir, "metrics.jsonl"))
    flops_per_token = estimate_train_flops(cfg)
    step = int(state.step)
    t_last = time.perf_counter()
    tokens_acc = 0
    skip = 0
    if step:   # resume the data position (see train.py)
        loader.epoch, skip = divmod(step, max(len(loader), 1))
    print(f"training: {max_steps} optimizer steps "
          f"(x{accum} accumulation), {steps_per_epoch}/epoch")
    while step < micro_steps:
        for batch in loader:
            if skip:
                skip -= 1
                continue
            if step >= micro_steps:
                break
            batch = put_batch(batch)
            tokens_acc += int(np.prod(batch["input_ids"].shape))
            state, metrics = step_fn(state, batch)
            step += 1
            if step % args.logging_steps == 0:
                loss = float(metrics["loss"])
                dt = time.perf_counter() - t_last
                t_last = time.perf_counter()
                # all tokens since the last log over the same window
                tok_s = tokens_acc / dt
                tokens_acc = 0
                mfu = (flops_per_token * tok_s) / (
                    197e12 * len(jax.devices()))
                logger.log(step=step, loss=loss,
                           grad_norm=float(metrics["grad_norm"]),
                           lr=float(sched(step // accum)),
                           tokens_per_sec=tok_s,
                           mfu=mfu, step_time_s=dt)
            if step % args.save_steps == 0:
                mgr.save(step, state)
    mgr.save(step, state)
    print(f"done at step {step}; final checkpoint saved to "
          f"{args.output_dir}")


if __name__ == "__main__":
    main()
