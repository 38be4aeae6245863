"""Multi-architecture SFT trainer CLI.

One entry covering the reference's per-arch trainer scripts
(reference: mantis/train/train_idefics2.py, train_idefics3.py,
train_qwen2_vl.py, train_intern_vl_25.py, train_openflamingo.py,
train_siglip_video.py, train_fuyu.py — all sharing the skeleton of
train_mllava.py:266-349).  Pick the family with ``--arch``; per-arch
freezing/LoRA/data policies come from mantis_tpu.train.archs.

Debug/smoke usage (the reference's train_example_* recipe):
  python -m mantis_tpu.train.train --arch idefics2 --init_random \
      --data_path examples/data/chat/train.json \
      --output_dir /tmp/sft --max_steps 20 --batch_size 2

The flagship MLlava keeps its dedicated CLI (train_mllava.py) with HF
checkpoint loading; this entry accepts --arch mllava too.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from mantis_tpu.models.conversation import conv_templates
from mantis_tpu.parallel.mesh import create_mesh
from mantis_tpu.parallel.sharding import batch_sharding, shard_params
from mantis_tpu.train import archs as archs_lib
from mantis_tpu.train import data as data_lib
from mantis_tpu.train import trainer as trainer_lib
from mantis_tpu.train.checkpoints import CheckpointManager
from mantis_tpu.train.lora import LoraConfig, init_lora_params
from mantis_tpu.utils.metrics import MetricsLogger, estimate_train_flops


def parse_args(argv=None, default_arch=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--arch", default=default_arch, required=not
                   default_arch, choices=sorted(archs_lib.ARCHS))
    p.add_argument("--model_path", type=str, default=None,
                   help="HF checkpoint directory to fine-tune from "
                        "(io/hf_loader.load_checkpoint dispatches on "
                        "config.json; the reference's from_pretrained)")
    p.add_argument("--init_random", action="store_true",
                   help="random-init a tiny debug model (smoke recipe)")
    p.add_argument("--conv_template", default=None)
    p.add_argument("--param_dtype", default="float32")
    # peft / freezing
    p.add_argument("--use_lora", action="store_true")
    p.add_argument("--use_qlora", action="store_true")
    p.add_argument("--use_dora", action="store_true")
    p.add_argument("--lora_r", type=int, default=128)
    p.add_argument("--lora_alpha", type=float, default=256.0)
    p.add_argument("--train_vision", action="store_true")
    p.add_argument("--xattn_pretrain", action="store_true",
                   help="internvl: clone self-attn into cross-attn, "
                   "train the cross-attn branch only "
                   "(reference train_intern_vl_25.py:302-332)")
    # data
    p.add_argument("--data_path", type=str, default=None,
                   help="single chat JSON/JSONL (or siglip_video JSON)")
    p.add_argument("--data_config_path", type=str, default=None,
                   help="YAML mixture (chat format entries)")
    p.add_argument("--max_seq_len", type=int, default=8192)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--num_frames", type=int, default=4)
    p.add_argument("--problem_type", default="generation",
                   choices=["generation", "regression",
                            "single_label_classification",
                            "multi_label_classification"],
                   help="non-generation trains the arch's sequence-"
                        "classification head on item 'labels' dicts "
                        "(reference train_qwen2_vl.py:136)")
    p.add_argument("--use_label_special_tokens", action="store_true",
                   help="qwen2_vl classification: append one <|LABEL_i|>"
                        " token per label and pool at those positions "
                        "(reference data.py:1328-1332, score_type="
                        "special_token)")
    p.add_argument("--use_video_encoder", action="store_true",
                   help="chat_video data through the arch's video "
                        "encoder (<video> token path, reference "
                        "data.py:763-799) instead of frames-as-images")
    # optimization
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
                   choices=["nothing", "dots"],
                   help="remat save policy (ops/remat.py): nothing = "
                        "min memory; dots = save matmul outputs "
                        "(faster, more activation memory)")
    p.add_argument("--optimizer_offload", action="store_true",
                   help="keep Adam moments in pinned host memory, "
                        "streamed over PCIe at the update (the "
                        "reference's zero3_offload.json; frees "
                        "8 bytes/param of HBM)")
    p.add_argument("--optimizer_in_backward", action="store_true",
                   help="apply the AdamW update inside the backward "
                        "pass as each gradient is produced (no grad "
                        "tree is ever materialized; requires "
                        "--grad_clip 0, no grad accumulation, no LoRA)")
    p.add_argument("--adamw8bit", action="store_true",
                   help="blockwise-int8 Adam moments (1 byte/param, "
                        "the bitsandbytes-AdamW8bit equivalent, "
                        "ops/adam8bit.py); implies "
                        "--optimizer_in_backward.  With "
                        "--unstacked_layers this is the configuration "
                        "that fits a full fwd+bwd+update program at "
                        "flagship depth on one 16 GB chip "
                        "(docs/PERF.md, MFU 0.46 measured)")
    p.add_argument("--unstacked_layers", action="store_true",
                   help="run decoder layers as an unrolled loop over "
                        "per-layer param trees so each layer's grad "
                        "frees as its in-backward update consumes it "
                        "(models/llama.py unstack_layers).  Single-"
                        "chip / pure-data-parallel only: the FSDP/TP "
                        "sharding rules address the stacked layout")
    p.add_argument("--mlp_chunk", type=int, default=0,
                   help="sequence-chunk each decoder layer's MLP into "
                        "N exact pieces (shrinks the per-layer "
                        "backward working set ~N-fold; "
                        "models/llama.py decoder_block)")
    p.add_argument("--loss_chunk_size", type=int, default=0,
                   help="chunked cross-entropy (liger equivalent, "
                        "ops/chunked_ce.py): never materializes the "
                        "full [B,S,V] logits")
    # mesh
    p.add_argument("--mesh_data", type=int, default=-1)
    p.add_argument("--mesh_fsdp", type=int, default=1)
    p.add_argument("--mesh_context", type=int, default=1,
                   help="ring-attention context parallelism "
                        "(mllava/internvl; the reference recipe is "
                        "train_intern_vl_25.sh)")
    p.add_argument("--mesh_tensor", type=int, default=1,
                   help="megatron-style tensor parallelism over the "
                        "innermost ICI axis (parallel/sharding.py "
                        "tp_spec; a TPU-native superset — the "
                        "reference has no TP)")
    p.add_argument("--ring_vision_dp", action="store_true",
                   help="shard image encoding over the ring group "
                        "(reference modeling_internvl_chat.py:200-228)")
    # io
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--export_hf", action="store_true",
                   help="also write the final model as an HF-layout "
                        "checkpoint under <output_dir>/hf (what the "
                        "reference's trainer.save_model emits); LoRA "
                        "adapters are merged into the base first")
    p.add_argument("--save_steps", type=int, default=500)
    p.add_argument("--save_total_limit", type=int, default=1)
    p.add_argument("--logging_steps", type=int, default=1)
    p.add_argument("--resume", action="store_true", default=True)
    p.add_argument("--seed", type=int, default=42)
    return p.parse_args(argv)


def _data_paths(args):
    if args.data_path:
        return [args.data_path]
    import yaml

    with open(args.data_config_path) as f:
        dcfg = yaml.safe_load(f)
    return [e["path"] for e in dcfg.get("data", [])]


def _overlay(init_tree, loaded_tree):
    """Prefer checkpoint values; keep freshly initialized leaves where
    the checkpoint has no counterpart (e.g. a new classification head
    on a base checkpoint — the reference's from_pretrained +
    num_labels flow, train_qwen2_vl.py)."""
    if isinstance(init_tree, dict):
        return {
            k: (_overlay(v, loaded_tree[k])
                if isinstance(loaded_tree, dict) and k in loaded_tree
                else v)
            for k, v in init_tree.items()
        }
    return loaded_tree


def build_model_and_data(args, spec):
    from mantis_tpu.utils.debug_tokenizer import (
        build_tokenizer_from_json_data)

    paths = _data_paths(args)
    loaded = None
    if not args.init_random:
        if not args.model_path:
            raise SystemExit(
                "pass --model_path <hf_checkpoint_dir> or "
                "--init_random (debug recipe)")
        import transformers

        from mantis_tpu.io.hf_loader import load_checkpoint

        ck_arch, cfg, loaded = load_checkpoint(
            args.model_path, dtype=jnp.dtype(args.param_dtype))
        if ck_arch != spec.name:
            raise SystemExit(
                f"checkpoint {args.model_path} is {ck_arch!r}, "
                f"--arch is {spec.name!r}")
        tok = transformers.AutoTokenizer.from_pretrained(
            args.model_path)
    elif spec.dataset_format == "siglip_video":
        def texts():
            for p in paths:
                for item in data_lib._load_json_data(p):
                    yield item.get("text", item.get("caption", ""))
        from mantis_tpu.utils.debug_tokenizer import (
            build_tokenizer_from_texts)

        tok = build_tokenizer_from_texts(texts())
    else:
        tok = build_tokenizer_from_json_data(paths)
    if loaded is None:
        cfg = spec.debug_config(tok)
    label_names = None
    if args.problem_type != "generation":
        if spec.init_cls_params is None:
            raise SystemExit(
                f"--problem_type: {spec.name} has no classification "
                "head (supported: qwen2_vl, idefics2)")
        import dataclasses as dc

        names = set()
        for p in paths:
            # shared loader: handles .json AND .jsonl like the datasets
            for item in data_lib._load_json_data(p):
                names.update((item.get("labels") or {}).keys())
        label_names = sorted(names)
        if args.use_label_special_tokens:
            if loaded is not None:
                raise SystemExit(
                    "--use_label_special_tokens grows the vocabulary "
                    "beyond the checkpoint's embedding; resize is not "
                    "supported from --model_path — start from "
                    "--init_random or resize offline")
            # grow the vocab BEFORE sizing the embedding (the dataset
            # re-adds them later, a no-op)
            tok.add_special_tokens({"additional_special_tokens": [
                f"<|LABEL_{i}|>" for i in range(len(label_names))]})
            cfg = dc.replace(spec.debug_config(tok),
                             score_type="special_token")
        cfg = dc.replace(cfg, num_labels=max(len(label_names), 1))
        params = spec.init_cls_params(
            cfg, jax.random.PRNGKey(args.seed),
            jnp.dtype(args.param_dtype))
        if loaded is not None:
            # checkpoint backbone + fresh head
            params = _overlay(params, loaded)
    elif loaded is not None:
        params = loaded
    else:
        params = None   # plain random init resolved below
    if args.xattn_pretrain:
        if not hasattr(cfg, "enable_cross_attention"):
            raise SystemExit(
                f"--xattn_pretrain: {spec.name} has no cross-attention "
                "branch (supported: internvl)")
        if args.problem_type != "generation":
            raise SystemExit(
                "--xattn_pretrain is a generation recipe (it sizes a "
                "fresh cross-attn LM tree)")
        # the branch must EXIST to be trained: flip the config flag
        # (never on in debug/checkpoint configs) before sizing params,
        # and graft a fresh cross-attn subtree under a checkpoint
        # backbone (reference: train_intern_vl_25.py:302-318 clones
        # into a model built with cross-attn enabled)
        import dataclasses as dc

        cfg = dc.replace(cfg, enable_cross_attention=True)
        fresh = spec.init_params(cfg, jax.random.PRNGKey(args.seed),
                                 jnp.dtype(args.param_dtype))
        params = _overlay(fresh, params) if params is not None else fresh
    elif params is None:
        params = spec.init_params(cfg, jax.random.PRNGKey(args.seed),
                                  jnp.dtype(args.param_dtype))
    if spec.prepare_params is not None and args.xattn_pretrain:
        params = spec.prepare_params(params, cfg)
        assert "cross_attention" in params
    processor = spec.make_processor(tok, cfg)

    conv = conv_templates[args.conv_template or spec.conv_template]
    if spec.dataset_format == "siglip_video":
        datasets = [data_lib.SiglipVideoDataset(
            p, processor.tokenizer, processor.image_processor,
            num_frames=args.num_frames) for p in paths]
    elif args.problem_type != "generation":
        # classification: LM labels masked, float targets from item
        # 'labels' dicts (reference ClassificationDataset,
        # data.py:1138-1349)
        data_lib.set_default_image_token_id(processor.image_token_index)
        if args.use_label_special_tokens:
            datasets = [data_lib.Qwen2VideoClassificationDataset(
                p, processor, conv, max_seq_len=args.max_seq_len,
                label_names=label_names, num_frames=args.num_frames,
                use_label_special_tokens=True) for p in paths]
        else:
            datasets = [data_lib.ClassificationDataset(
                p, processor, conv, max_seq_len=args.max_seq_len,
                label_names=label_names) for p in paths]
    elif args.use_video_encoder:
        data_lib.set_default_image_token_id(processor.image_token_index)
        nvt = (spec.num_video_tokens_fn(cfg)
               if spec.num_video_tokens_fn else 64)
        datasets = [data_lib.ChatVideoDataset(
            p, processor, conv, max_seq_len=args.max_seq_len,
            num_frames=args.num_frames, use_video_encoder=True,
            num_video_tokens=nvt) for p in paths]
    else:
        data_lib.set_default_image_token_id(processor.image_token_index)
        datasets = [data_lib.ChatDataset(
            p, processor, conv, max_seq_len=args.max_seq_len,
            media_transform=spec.media_transform)
            for p in paths]
    ds = (datasets[0] if len(datasets) == 1
          else data_lib.DatasetCollection(datasets))
    cp = args.mesh_context
    ladder = (256, 512, 1024, 2048, 4096, 8192)
    if args.max_seq_len not in ladder and args.max_seq_len > 0:
        # honor a non-ladder --max_seq_len (e.g. 16384) as the top
        # bucket instead of silently truncating at 8192
        ladder = tuple(sorted(set(ladder) | {args.max_seq_len}))
    buckets = tuple(
        b for b in ladder
        if b <= args.max_seq_len
        and (cp <= 1 or b % (2 * cp * 128) == 0))
    collator = spec.make_collator(processor, cfg, {
        "seq_buckets": buckets or (args.max_seq_len,),
        "context_parallel_size": cp,
    })
    return cfg, params, processor, ds, collator


def main(argv=None, default_arch=None):
    args = parse_args(argv, default_arch)
    spec = archs_lib.get_arch(args.arch)
    os.makedirs(args.output_dir, exist_ok=True)
    devices = None
    cp = args.mesh_context
    if cp > 1 and args.arch not in ("mllava", "internvl"):
        raise SystemExit(
            f"--mesh_context: {args.arch} has no ring-attention wiring")
    if args.mesh_data > 0:
        n = args.mesh_data * args.mesh_fsdp * cp * args.mesh_tensor
        if n < len(jax.devices()):  # explicit sub-mesh
            devices = jax.devices()[:n]
    mesh = create_mesh(data=args.mesh_data, fsdp=args.mesh_fsdp,
                       context=cp, tensor=args.mesh_tensor,
                       devices=devices)

    cfg, params, processor, ds, collator = build_model_and_data(
        args, spec)
    loader = data_lib.DataLoader(ds, collator, args.batch_size,
                                 shuffle=True, seed=args.seed)

    accum = max(args.gradient_accumulation_steps, 1)
    steps_per_epoch = max(len(loader) // accum, 1)
    max_steps = (args.max_steps if args.max_steps > 0
                 else int(steps_per_epoch * args.num_epochs))
    micro_steps = max_steps * accum

    lora_cfg = None
    if args.use_lora or args.use_qlora or args.use_dora:
        lora_cfg = LoraConfig(r=args.lora_r, alpha=args.lora_alpha,
                              use_dora=args.use_dora,
                              exclude_prefixes=spec.lora_exclude)
    in_backward = args.optimizer_in_backward or args.adamw8bit
    tcfg = trainer_lib.TrainConfig(
        learning_rate=args.learning_rate, lr_schedule=args.lr_schedule,
        warmup_ratio=args.warmup_ratio, max_steps=max_steps,
        weight_decay=args.weight_decay,
        gradient_accumulation_steps=accum, grad_clip=args.grad_clip,
        compute_dtype=args.compute_dtype,
        use_remat=False if args.no_remat else args.remat_policy,
        optimizer_offload=args.optimizer_offload,
        optimizer_in_backward=in_backward,
        optimizer_moments_int8=args.adamw8bit,
        mlp_chunk=args.mlp_chunk or None,
        loss_chunk_size=args.loss_chunk_size or None,
        lora=lora_cfg)
    if args.unstacked_layers:
        if args.mesh_fsdp > 1 or args.mesh_tensor > 1:
            raise SystemExit(
                "--unstacked_layers: the FSDP/TP sharding rules "
                "address the stacked layer layout; use it on single-"
                "chip or pure data-parallel meshes")
        if not isinstance(params.get("language_model"), dict) or \
                "layers" not in params.get("language_model", {}):
            raise SystemExit(
                "--unstacked_layers: this arch has no "
                "language_model.layers subtree to unstack")
        from mantis_tpu.models import llama as _llama

        params = dict(params, language_model=_llama.unstack_layers(
            params["language_model"]))

    compute_loss = spec.compute_loss
    if args.problem_type != "generation":
        if cp > 1 or args.ring_vision_dp:
            raise SystemExit(
                "--problem_type: classification is not wired for "
                "context parallelism / ring vision DP")
        import functools

        compute_loss = functools.partial(
            spec.compute_cls_loss, problem_type=args.problem_type)

    ctx_attn = None
    if cp > 1:
        from mantis_tpu.ops.ring_attention import make_context_attention

        ctx_attn = make_context_attention(mesh, "context")
    opt, sched = trainer_lib.make_optimizer(tcfg)
    if lora_cfg is not None:
        if args.use_qlora:
            from mantis_tpu.ops.quant import quantize_tree

            params = quantize_tree(params, bits=4)
        base = shard_params(params, mesh)
        trainable = init_lora_params(
            params, lora_cfg, jax.random.PRNGKey(args.seed + 1))
        if lora_cfg.use_dora:
            from mantis_tpu.train.lora import init_dora_magnitudes

            trainable = init_dora_magnitudes(params, trainable)
        trainable = shard_params(trainable, mesh)
        step_fn = trainer_lib.make_train_step(
            None, cfg, tcfg, opt, None, base_params_for_lora=base,
            compute_loss=compute_loss,
            context_attention=ctx_attn, labels_preshifted=cp > 1,
            vision_dp_mesh=mesh if args.ring_vision_dp else None)
    else:
        if args.xattn_pretrain:
            # train only the cross-attn branch (+ gates)
            pred = lambda p: p.startswith("cross_attention")  # noqa
        elif args.train_vision:
            pred = lambda p: True  # noqa: E731
        else:
            pred = spec.trainable_pred
        trainable, frozen = trainer_lib.partition_params(params, pred)
        trainable = shard_params(trainable, mesh)
        frozen = shard_params(frozen, mesh)
        step_fn = trainer_lib.make_train_step(
            None, cfg, tcfg, opt, frozen,
            compute_loss=compute_loss,
            context_attention=ctx_attn, labels_preshifted=cp > 1,
            vision_dp_mesh=mesh if args.ring_vision_dp else None)

    state = trainer_lib.create_train_state(
        trainable, opt, optimizer_offload=args.optimizer_offload,
        mesh=mesh, moments_int8=args.adamw8bit)
    mgr = CheckpointManager(args.output_dir, args.save_total_limit)
    if args.resume:
        restored, start_step = mgr.restore_latest(state)
        if restored is not None:
            state = restored
            if args.optimizer_offload:
                # Orbax restores into device memory; move the moments
                # back to pinned host so the resumed step keeps the
                # offloaded memory profile
                from mantis_tpu.parallel.offload import (
                    offload_tree_to_host)

                state = state.replace(opt_state=offload_tree_to_host(
                    state.opt_state, mesh))
            print(f"resumed from checkpoint-{start_step}")

    bs = batch_sharding(mesh)  # rows over (data,fsdp), seq over context
    from jax.sharding import NamedSharding, PartitionSpec

    def put_batch(batch):
        out = {}
        for k, v in batch.items():
            # [B, S] rows shard over (data, fsdp) + seq over context.
            # pixel_values NEVER takes the sequence spec (dim 1 is
            # channels/images — with context>1 that sharding is
            # invalid, and it must not shadow ring vision DP even when
            # the image count equals the batch size); other per-image
            # tensors and qwen2's [3, B, S] M-RoPE positions replicate.
            if k == "pixel_values":
                if args.ring_vision_dp:
                    spec = PartitionSpec("context")
                elif v.shape[0] == args.batch_size:
                    spec = PartitionSpec(("data", "fsdp"))
                else:
                    spec = PartitionSpec()
                out[k] = jax.device_put(v, NamedSharding(mesh, spec))
            elif v.ndim >= 2 and v.shape[0] == args.batch_size \
                    and not (k == "positions" and v.ndim == 3):
                out[k] = jax.device_put(v, bs)
            else:
                out[k] = jax.device_put(
                    v, NamedSharding(mesh, PartitionSpec()))
        return out

    logger = MetricsLogger(os.path.join(args.output_dir,
                                        "metrics.jsonl"))
    try:
        flops_per_token = estimate_train_flops(cfg)
    except Exception:
        flops_per_token = 0.0
    step = int(state.step)
    t_last = time.perf_counter()
    tokens_acc = 0
    # resume restores the DATA position too: re-enter the interrupted
    # epoch's permutation and skip its already-consumed batches (the
    # HF Trainer semantics this replaces; without it a resumed run
    # re-trains early batches and never sees the epoch's tail)
    skip = 0
    if step:
        loader.epoch, skip = divmod(step, max(len(loader), 1))
    print(f"training {spec.name}: {max_steps} optimizer steps "
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
                # ALL tokens since the last log over the same window
                # (a single batch over a logging_steps window would
                # under-report by ~logging_steps x)
                tok_s = tokens_acc / dt
                tokens_acc = 0
                mfu = (flops_per_token * tok_s) / (
                    197e12 * len(jax.devices()))
                logger.log(step=step, loss=loss,
                           grad_norm=float(metrics["grad_norm"]),
                           lr=float(sched(step // accum)),
                           tokens_per_sec=tok_s, mfu=mfu,
                           step_time_s=dt)
            if step % args.save_steps == 0:
                mgr.save(step, state)
    mgr.save(step, state)
    print(f"done at step {step}; final checkpoint saved to "
          f"{args.output_dir}")

    if args.export_hf:
        # final save in HF layout (the reference's trainer.save_model
        # emits HF checkpoints, train_mllava.py:330-345) so the eval
        # adapters consume the run's output directly
        from mantis_tpu.io.hf_export import _EXPORTERS, save_checkpoint

        if spec.name not in _EXPORTERS:
            print(f"--export_hf: no HF exporter for {spec.name}; "
                  "kept Orbax checkpoint only")
        else:
            trained = jax.device_get(state.params)
            if args.use_qlora:
                print("--export_hf: QLoRA base is quantized; merge-"
                      "export unsupported — kept Orbax checkpoint only")
                return
            if lora_cfg is not None:
                from mantis_tpu.train.lora import merge_lora_into_params

                full = merge_lora_into_params(
                    jax.device_get(base), trained, lora_cfg)
            else:
                full = trainer_lib.combine_params(
                    trained, jax.device_get(frozen))
            hf_dir = os.path.join(args.output_dir, "hf")
            save_checkpoint(spec.name, full, cfg, hf_dir,
                            processor=processor)
            print(f"HF checkpoint exported to {hf_dir}")


if __name__ == "__main__":
    main()
