"""SFT trainer: pjit-sharded train step, mixed precision, freezing, LoRA.

Replaces the reference's HF Trainer + DeepSpeed ZeRO stack
(reference: mantis/train/train_mllava.py:266-349).  Semantics kept:
  - vision tower frozen by default (train_mllava.py:239-242);
  - LoRA targets exclude projector/vision/lm_head (:116-128);
  - lr schedule: cosine with warmup ratio, AdamW (train_mllava.sh:158-176);
  - bf16 compute with f32 master weights (ZeRO bf16 + f32 optimizer moments
    equivalent).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import optax
from flax import struct

from mantis_tpu.train.lora import LoraConfig, apply_lora


# ---------------------------------------------------------------------------
# Param partitioning (trainable vs frozen)
# ---------------------------------------------------------------------------

# ``None`` marks a slot owned by the other partition.  jax treats None
# as an empty subtree, so optimizers/grads simply skip those slots;
# combine_params re-zips the two halves with is_leaf=None-aware mapping.


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
    return "/".join(parts)


def partition_params(params: Any, trainable_pred: Callable[[str], bool]
                     ) -> Tuple[Any, Any]:
    """Split into (trainable, frozen) trees of identical structure with
    FROZEN sentinels in the opposite slots."""
    def pick(path, leaf, want_trainable):
        t = trainable_pred(_path_str(path))
        return leaf if t == want_trainable else None

    train = jax.tree_util.tree_map_with_path(
        lambda p, l: pick(p, l, True), params)
    frozen = jax.tree_util.tree_map_with_path(
        lambda p, l: pick(p, l, False), params)
    return train, frozen


def combine_params(trainable: Any, frozen: Any) -> Any:
    return jax.tree.map(
        lambda a, b: b if a is None else a,
        trainable, frozen,
        is_leaf=lambda x: x is None)


def default_trainable_pred(path: str, freeze_vision: bool = True,
                           tune_projector_only: bool = False) -> bool:
    """Reference freezing policy (train_mllava.py:239-242; --do_pretrain
    trains the projector only, train_mllava.py:95-98)."""
    if tune_projector_only:
        return path.startswith("multi_modal_projector")
    if freeze_vision and path.startswith("vision_tower"):
        return False
    return True


# ---------------------------------------------------------------------------
# Config / state
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-5
    lr_schedule: str = "cosine"          # 'cosine' | 'linear' | 'constant'
    warmup_ratio: float = 0.03
    max_steps: int = 1000                # OPTIMIZER steps (not micro)
    # micro-batches averaged per optimizer step (reference global-batch
    # arithmetic: train_mllava.sh:135-137, global batch 128)
    gradient_accumulation_steps: int = 1
    weight_decay: float = 0.0
    grad_clip: float = 1.0
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    freeze_vision: bool = True
    tune_projector_only: bool = False
    compute_dtype: str = "bfloat16"
    # False | True ("nothing") | a policy name from ops/remat.py —
    # "dots" saves matmul outputs (MFU 0.510 -> 0.547 measured,
    # docs/PERF.md) at ~1.2 GB/layer activation cost
    use_remat: Union[bool, str] = True
    # chunked CE (ops/chunked_ce.py); 0 = standard logits+CE
    loss_chunk_size: int = 0
    # Adam moments in pinned host memory, streamed over PCIe during the
    # update (the reference's zero3_offload.json equivalent — it keeps
    # optimizer state in host RAM, ref train/zero_configs/
    # zero3_offload.json).  Frees 8 bytes/param of HBM; XLA's latency-
    # hiding scheduler overlaps the transfers with the backward.
    optimizer_offload: bool = False
    lora: Optional[LoraConfig] = None


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any          # trainable tree (base subtree or LoRA tree)
    opt_state: Any


def make_lr_schedule(cfg: TrainConfig):
    warmup = max(int(cfg.max_steps * cfg.warmup_ratio), 1)
    if cfg.lr_schedule == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, cfg.learning_rate, warmup, cfg.max_steps)
    if cfg.lr_schedule == "linear":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, cfg.learning_rate, warmup),
             optax.linear_schedule(cfg.learning_rate, 0.0,
                                   cfg.max_steps - warmup)],
            [warmup])
    return lambda step: cfg.learning_rate


def make_optimizer(cfg: TrainConfig):
    sched = make_lr_schedule(cfg)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip) if cfg.grad_clip
        else optax.identity(),
        optax.adamw(sched, b1=cfg.adam_b1, b2=cfg.adam_b2,
                    eps=cfg.adam_eps, weight_decay=cfg.weight_decay),
    )
    if cfg.gradient_accumulation_steps > 1:
        # grads averaged over k micro-batches; the inner optimizer (and
        # its lr schedule) advances once per k calls, so cfg.max_steps
        # keeps meaning optimizer steps.
        tx = optax.MultiSteps(
            tx, every_k_schedule=cfg.gradient_accumulation_steps)
    return tx, sched


# ---------------------------------------------------------------------------
# Train step
# ---------------------------------------------------------------------------

def make_train_step(
    model_forward: Callable,
    model_cfg,
    train_cfg: TrainConfig,
    optimizer,
    frozen_params: Any,
    base_params_for_lora: Any = None,
    context_attention=None,
    labels_preshifted: bool = False,
    compute_loss: Optional[Callable] = None,
    vision_dp_mesh=None,
):
    """Build the jitted train step.

    Full/partial finetune: state.params is the trainable subtree, combined
    with ``frozen_params`` each step.  LoRA: state.params is the adapter
    tree; ``base_params_for_lora`` is the full (frozen) base.

    compute_loss: optional arch adapter ``(params, cfg, batch, train_cfg)
    -> loss`` replacing the default batch->forward mapping (used by the
    multi-arch trainer, mantis_tpu.train.archs).
    """
    compute_dtype = jnp.dtype(train_cfg.compute_dtype)

    def build_full_params(trainable, frozen):
        if train_cfg.lora is not None:
            return apply_lora(frozen, trainable, train_cfg.lora)
        return combine_params(trainable, frozen)

    def cast(p):
        return jax.tree.map(
            lambda x: x.astype(compute_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, p)

    def loss_fn(trainable, batch, frozen):
        params = cast(build_full_params(trainable, frozen))
        if compute_loss is not None:
            kw = {}
            if context_attention is not None:
                kw.update(context_attention=context_attention,
                          labels_preshifted=labels_preshifted)
            if vision_dp_mesh is not None:
                kw.update(vision_dp_mesh=vision_dp_mesh)
            return compute_loss(params, model_cfg, batch, train_cfg,
                                **kw)
        kwargs = {}
        if context_attention is not None:
            kwargs.update(context_attention=context_attention,
                          labels_preshifted=labels_preshifted)
        if batch.get("image_feature_idx") is not None:
            kwargs.update(image_feature_idx=batch["image_feature_idx"])
        if vision_dp_mesh is not None:
            kwargs.update(vision_dp_mesh=vision_dp_mesh)
        if train_cfg.loss_chunk_size:
            kwargs.update(loss_chunk_size=train_cfg.loss_chunk_size)
        _, loss, _ = model_forward(
            params, model_cfg,
            input_ids=batch["input_ids"],
            pixel_values=batch.get("pixel_values"),
            positions=batch.get("positions"),
            segment_ids=batch.get("segment_ids"),
            labels=batch["labels"],
            use_remat=train_cfg.use_remat,
            **kwargs,
        )
        return loss

    offloading = False
    if train_cfg.optimizer_offload:
        from mantis_tpu.parallel import offload as _offload

        offloading = _offload.host_memory_supported()

    def train_step(state: TrainState, batch: Dict, frozen) -> Tuple[
            TrainState, Dict]:
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch,
                                                  frozen)
        opt_in = (_offload.to_device(state.opt_state) if offloading
                  else state.opt_state)
        updates, opt_state = optimizer.update(
            grads, opt_in, state.params)
        if offloading:
            opt_state = _offload.to_host(opt_state)
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
        }
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state), metrics

    # frozen/base params enter as a jit ARGUMENT, not a closure: closed-
    # over arrays are baked into the HLO as literal constants, and a
    # frozen so400m tower (0.86 GB) blows past the compile service's
    # request-size limit (observed HTTP 413) besides bloating every
    # program.  The public call signature stays (state, batch).
    jitted = jax.jit(train_step, donate_argnums=(0,))
    frozen_arg = (base_params_for_lora if train_cfg.lora is not None
                  else frozen_params)

    def step(state: TrainState, batch: Dict):
        return jitted(state, batch, frozen_arg)

    return step


def create_train_state(trainable_params, optimizer,
                       optimizer_offload: bool = False,
                       mesh=None) -> TrainState:
    """``optimizer_offload`` initializes the optimizer state DIRECTLY
    into pinned host memory via jit out_shardings (materializing it in
    HBM first would transiently need the full 8 bytes/param the offload
    exists to avoid).  Pass the TRAINING mesh on multi-device setups
    (parallel/offload.py host_sharding)."""
    from mantis_tpu.parallel.offload import (
        host_memory_supported, host_sharding)

    if optimizer_offload and host_memory_supported():
        sh = host_sharding(mesh)
        shapes = jax.eval_shape(optimizer.init, trainable_params)
        out_sh = jax.tree.map(lambda _: sh, shapes)
        opt_state = jax.jit(
            optimizer.init, out_shardings=out_sh)(trainable_params)
    else:
        opt_state = optimizer.init(trainable_params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=trainable_params,
        opt_state=opt_state,
    )
