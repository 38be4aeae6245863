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
    # perform the adamw update INSIDE the backward pass (see
    # make_adamw_in_backward): never materializes the grad tree and
    # paces host-moment streaming across the backward window — the
    # single-chip full-depth measured-MFU configuration.  Requires
    # grad_clip=0 (grads are consumed before a global norm exists).
    optimizer_in_backward: bool = False
    # with optimizer_in_backward: keep the Adam moments ON DEVICE as
    # blockwise-int8 (8-bit AdamW — bitsandbytes-AdamW8bit equivalent,
    # ops/adam8bit.py) instead of streaming f32 moments from host
    # memory.  1 byte/param of HBM; pair with unstacked decoder layers
    # (models/llama.py unstack_layers) so per-layer grads free as they
    # are consumed.
    optimizer_moments_int8: bool = False
    # sequence-chunk each decoder layer's MLP into N pieces (exact; see
    # models/llama.py decoder_block).  Shrinks the per-layer backward
    # working set ~N-fold for ~1%/step of extra weight re-streaming —
    # used by the single-chip measured full-depth step.
    mlp_chunk: Optional[int] = None
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
# Fused offloaded update
# ---------------------------------------------------------------------------

def _locate_adam_state(opt_state):
    """Find the single ScaleByAdamState inside make_optimizer's optax
    chain; returns (flat_states, treedef, index, state)."""
    import optax

    is_state = lambda x: isinstance(  # noqa: E731
        x, (optax.ScaleByAdamState, optax.ScaleByScheduleState,
            optax.EmptyState))
    flat, treedef = jax.tree_util.tree_flatten(opt_state,
                                               is_leaf=is_state)
    adam_i = [i for i, x in enumerate(flat)
              if isinstance(x, optax.ScaleByAdamState)]
    assert len(adam_i) == 1, \
        "offloaded update paths expect one adamw in the chain"
    return flat, treedef, adam_i, flat[adam_i[0]]


def _rebuild_opt_state(flat, treedef, adam_i, host_count, mu, nu):
    import optax

    new_flat = []
    for i, x in enumerate(flat):
        if i == adam_i[0]:
            new_flat.append(optax.ScaleByAdamState(
                count=host_count, mu=mu, nu=nu))
        elif isinstance(x, optax.ScaleByScheduleState):
            new_flat.append(optax.ScaleByScheduleState(
                count=host_count))
        else:
            new_flat.append(x)
    return jax.tree_util.tree_unflatten(treedef, new_flat)


def fused_offload_adamw_update(train_cfg: TrainConfig, sched, grads,
                               opt_state, params):
    """clip_by_global_norm + adamw applied LEAF-BY-LEAF with pinned-
    host moments.

    Matches make_optimizer's optax chain step-for-step (parity-tested
    in tests/test_trainer.py) but never materializes the clipped-grads
    or updates trees — each leaf's chain
    (scale -> moment update -> bias correction -> decayed step) fuses
    into one elementwise kernel whose output aliases the donated param
    buffer, and each moment leaf streams over PCIe only while its leaf
    updates.  That drops the full-step peak from params+grads+updates
    (~18.6 GB at flagship depth 8 — the OOM that forced round 3's
    composed MFU) to params+grads+one-leaf staging, which fits 16 GB.
    Returns (new_params, new_opt_state, grad_norm); opt_state keeps
    the exact optax chain structure so checkpoints and the generic
    path interoperate."""
    import optax

    from mantis_tpu.parallel import offload as O

    flat, treedef, adam_i, st = _locate_adam_state(opt_state)
    count = O.to_device(st.count)
    count_inc = optax.safe_int32_increment(count)

    gnorm = optax.global_norm(grads)
    if train_cfg.grad_clip:
        # optax.clip_by_global_norm's exact formula
        scale = train_cfg.grad_clip / jnp.maximum(gnorm,
                                                  train_cfg.grad_clip)
    else:
        scale = jnp.ones_like(gnorm)
    # scale_by_schedule evaluates lr at the PRE-increment count
    lr = sched(count)
    b1, b2, eps = (train_cfg.adam_b1, train_cfg.adam_b2,
                   train_cfg.adam_eps)
    bc1 = 1.0 - b1 ** count_inc.astype(jnp.float32)
    bc2 = 1.0 - b2 ** count_inc.astype(jnp.float32)

    def upd(p, g, m, v):
        g = g * scale.astype(g.dtype)
        m_dev = O.to_device(m)
        v_dev = O.to_device(v)
        m1 = b1 * m_dev + (1.0 - b1) * g
        v1 = b2 * v_dev + (1.0 - b2) * jnp.square(g)
        mhat = m1 / bc1.astype(m1.dtype)
        vhat = v1 / bc2.astype(v1.dtype)
        step = mhat / (jnp.sqrt(vhat) + eps)
        if train_cfg.weight_decay:
            step = step + train_cfg.weight_decay * p
        p1 = (p - lr * step).astype(p.dtype)
        return p1, O.to_host(m1), O.to_host(v1)

    # leaves update in SERIAL order, enforced by threading a token
    # through optimization_barriers: without this XLA schedules every
    # leaf's update concurrently and the staged moments + new-param
    # temps for all leaves co-reside (measured 18.7 GB at flagship
    # depth 8 — the serialized schedule holds one leaf's staging at a
    # time and frees each grad leaf as its update consumes it)
    leaves_p, tdef_p = jax.tree_util.tree_flatten(params)
    leaves_g = jax.tree_util.tree_flatten(grads)[0]
    leaves_m = jax.tree_util.tree_flatten(st.mu)[0]
    leaves_v = jax.tree_util.tree_flatten(st.nu)[0]
    token = gnorm
    out_p, out_m, out_v = [], [], []
    for p, g, m, v in zip(leaves_p, leaves_g, leaves_m, leaves_v):
        # the host-resident moment leaves MUST pass through the
        # barrier too — their PCIe copy-starts carry no data dependency
        # on the token otherwise, and the scheduler prefetches every
        # leaf's moments at once (measured: the full 22.6 GB of
        # in-flight staging re-creates the OOM the barrier exists to
        # prevent)
        g, m, v, token = jax.lax.optimization_barrier((g, m, v, token))
        p1, m1, v1 = upd(p, g, m, v)
        token = jax.lax.optimization_barrier((token, p1))[0]
        out_p.append(p1)
        out_m.append(m1)
        out_v.append(v1)
    new_params = jax.tree_util.tree_unflatten(tdef_p, out_p)
    new_mu = jax.tree_util.tree_unflatten(tdef_p, out_m)
    new_nu = jax.tree_util.tree_unflatten(tdef_p, out_v)
    host_count = O.to_host(count_inc)
    return (new_params,
            _rebuild_opt_state(flat, treedef, adam_i, host_count,
                               new_mu, new_nu), gnorm)


def make_adamw_in_backward(b1: float, b2: float, eps: float, wd: float):
    """Optimizer-IN-BACKWARD: a custom_vjp identity whose backward
    rule PERFORMS the adamw update the moment a leaf's gradient is
    produced, emitting (new_param, new_mu, new_nu) as the "cotangent"
    of the (param, mu, nu, ...) triple.

    Why: on one 16 GB chip the flagship full step cannot hold
    params+grads+moments (+update temps) — and with host-offloaded
    moments a post-backward update serializes ~22.6 GB of PCIe traffic
    (~11 GB/s measured) behind the compute.  Updating inside the
    backward (a) never materializes the grad tree — each leaf's grad
    is consumed into its update and freed, and (b) paces the moment
    streaming across the whole backward window, where the
    latency-hiding scheduler can overlap it with compute.  This is the
    TPU-native analogue of torch's apply-optimizer-in-backward +
    ZeRO-offload, and like those it cannot do same-step global-norm
    clipping (grads are consumed before the full norm exists) — the
    trainer refuses the combination loudly.
    """

    @jax.custom_vjp
    def attach(p, m, v, lr, bc1, bc2):
        return p

    def fwd(p, m, v, lr, bc1, bc2):
        return p, (p, m, v, lr, bc1, bc2)

    def bwd(res, g):
        from mantis_tpu.parallel import offload as O

        p, m, v, lr, bc1, bc2 = res
        m_dev = O.to_device(m)
        v_dev = O.to_device(v)
        m1 = b1 * m_dev + (1.0 - b1) * g
        v1 = b2 * v_dev + (1.0 - b2) * jnp.square(g)
        step = (m1 / bc1.astype(m1.dtype)) / (
            jnp.sqrt(v1 / bc2.astype(v1.dtype)) + eps)
        if wd:
            step = step + wd * p
        p1 = (p - lr * step).astype(p.dtype)
        return (p1, O.to_host(m1), O.to_host(v1),
                jnp.zeros_like(lr), jnp.zeros_like(bc1),
                jnp.zeros_like(bc2))

    attach.defvjp(fwd, bwd)
    return attach


def init_moments_int8(params):
    """Blockwise-int8 zero moments matching ``params``: each leaf ->
    (packed f32 bitcast of int8, per-block f32 scales) at 1 byte/param
    + 1/2048 scale overhead, never materializing dense f32 zeros
    (ops/adam8bit.py)."""
    from mantis_tpu.ops import adam8bit as Q8

    return jax.tree.map(Q8.zeros_like_quantized, params)


def _token_thread_order(paths):
    """Leaf order for threading the in-backward scheduling token:
    REVERSE of expected grad-arrival order, so the serialized updates
    run in arrival order (see make_adamw_in_backward8).

    Arrival heuristic for transformer trees: lm_head + final norm
    first (top of the backward), decoder layers deep->shallow, stacked
    scan-layer grads complete at the end of the scan backward, then
    embeddings, then projector/vision (used earliest in the forward).
    Exact order is a SCHEDULING hint only — any order is correct."""
    import re

    def arrival(path):
        if "lm_head" in path:
            return 0
        if re.search(r"\['norm'\]$", path):
            return 1
        m = re.search(r"\['layers'\]\[(\d+)\]", path)
        if m:
            return 10 + 100_000 - int(m.group(1))
        if "['layers']" in path:      # stacked: grads land at scan end
            return 200_000
        if "embed" in path:
            return 300_000
        return 400_000                # projector / vision / other

    idx = sorted(range(len(paths)), key=lambda i: arrival(paths[i]))
    return list(reversed(idx))


def make_adamw_in_backward8(b1: float, b2: float, eps: float, wd: float,
                            host_moments: bool = False):
    """Optimizer-in-backward with BLOCKWISE-INT8 moments (8-bit AdamW,
    the bitsandbytes-AdamW8bit equivalent — ops/adam8bit.py).

    Same custom_vjp smuggling as make_adamw_in_backward, but the
    moments live ON DEVICE at 1 byte/param and each leaf's backward
    rule is ONE fused Pallas kernel pass (dequant -> adamw -> requant,
    ops/adam8bit.py fused_adamw_update — the XLA composition of
    quantize/dequantize relayouts every byte shuffle in HBM, measured
    35x off bandwidth).  With host-offloaded moments the update costs
    ~2 s/step of PCIe at flagship depth (measured ~11 GB/s); the
    on-device kernel runs in VPU/HBM time that overlaps the MXU-bound
    backward.  The moments ride the cotangents as f32 BITCAST
    containers because integer primals get the float0 tangent space
    (see ops/adam8bit.py docstring).
    """
    from mantis_tpu.ops import adam8bit as Q8

    # (p, ..., tok) -> (p, tok): tok is a scalar SCHEDULING token.  The
    # forward threads it through every leaf (identity, free); in the
    # backward each leaf's token-cotangent is barrier-tied to its own
    # update, so updates serialize leaf-by-leaf in REVERSE flatten
    # order — which is grad-arrival order (lm_head/norm first,
    # embed_tokens last).  Without this every leaf's dequant+update
    # temps co-reside (measured 27.2 GB unpadded at depth 8: the
    # latency-hiding scheduler runs all updates concurrently).
    @jax.custom_vjp
    def attach8(p, mq, ms, vq, vs, lr, bc1, bc2, tok):
        return p, tok

    def fwd(p, mq, ms, vq, vs, lr, bc1, bc2, tok):
        return (p, tok), (p, mq, ms, vq, vs, lr, bc1, bc2)

    def bwd(res, g):
        p, mq, ms, vq, vs, lr, bc1, bc2 = res
        g, g_tok = g
        # pin the incoming grad as ONE materialized buffer: without the
        # barrier XLA remats its producer per consumer fusion, and the
        # two 1 GB embed/lm_head grads appear twice each in the live set
        g = jax.lax.optimization_barrier(g)
        # the whole leaf updates in ONE fused Pallas kernel pass
        # (dequant -> adamw -> requant, VMEM-staged — ops/adam8bit.py
        # fused_adamw_update); root-domain int8 (mu: cube root signed,
        # nu: 4th root) because linear int8 zero-collapses small v and
        # the step explodes.  The inter-leaf token gates the kernel's
        # INPUTS and rides out on its param output, serializing leaf
        # updates in grad-arrival order.
        if host_moments:
            # PINNED-HOST int8 moments (zero3_offload x adamw8bit):
            # 1 byte/param each way over PCIe per leaf — ~1 s total at
            # flagship depth, issued per-leaf as grads arrive so the
            # streams hide under the MXU-bound backward; HBM never
            # holds the moment state at all
            from mantis_tpu.parallel import offload as O

            mq, ms, vq, vs = O.to_device((mq, ms, vq, vs))
        mq, ms, vq, vs, token = jax.lax.optimization_barrier(
            (mq, ms, vq, vs, g_tok))
        p1, mq1, ms1, vq1, vs1 = Q8.fused_adamw_update(
            p, g, mq, ms, vq, vs, lr, bc1, bc2,
            b1=b1, b2=b2, eps=eps, wd=wd, power_m=3, power_v=4)
        token = jax.lax.optimization_barrier((token, p1))[0]
        if host_moments:
            mq1, ms1, vq1, vs1 = O.to_host((mq1, ms1, vq1, vs1))
        # token (tied to the updated p1) is the tok-cotangent: the
        # PREVIOUS leaf in the thread order seeds its chain with it, so
        # leaf updates serialize in grad-arrival order
        return (p1, mq1, ms1, vq1, vs1,
                jnp.zeros_like(lr), jnp.zeros_like(bc1),
                jnp.zeros_like(bc2), token)

    attach8.defvjp(fwd, bwd)
    return attach8


def make_layer_adamw8_hook(b1: float, b2: float, eps: float, wd: float,
                           compute_dtype, host_moments: bool = False):
    """Per-LAYER optimizer-in-backward (adamw8bit): returns
    ``hook(layer_fn_raw, h, bundle) -> h`` consumed by the decoder's
    unrolled layer loop (models/llama.py, unstacked layers).

    Each decoder layer's whole computation is wrapped in ONE custom_vjp
    whose backward (a) recomputes the layer forward (remat-"nothing"
    semantics for free), (b) computes this layer's weight grads via
    jax.vjp, (c) updates the layer's params + int8 moments immediately
    with the fused Pallas kernel (ops/adam8bit.py), and (d) releases
    the ACTIVATION cotangent only after the updates complete
    (optimization_barrier-tied to the updated params).  (d) is the
    memory guarantee the leaf-level token chain
    (make_adamw_in_backward8) cannot give: the token serializes the
    UPDATES but leaves XLA free to run every layer's weight-grad
    matmuls ahead of them — measured ~20 co-resident 112 MB grad
    buffers at flagship depth 8 (+2.2 GB, OOM).  Gating the activation
    cotangent means the backward of layer i-1 literally cannot start
    until layer i's grads are consumed and freed, so at most ONE
    layer's weight grads are ever live.  The serialization costs only
    the update kernel's HBM time (~35 ms total at 2.8 B params) on a
    multi-second MXU-bound backward.

    ``bundle`` is a layer param dict whose values are 8-tuples
    (p, mq, ms, vq, vs, lr, bc1, bc2) — hyperparams ride in each tuple
    because custom_vjp cannot close over tracers it must not
    differentiate.  The cotangent of each tuple carries the updated
    (p', mq', ms', vq', vs') out of the backward, exactly like
    make_adamw_in_backward8.
    """
    from mantis_tpu.ops import adam8bit as Q8

    def hook(layer_fn_raw, h, bundle):
        def run(hh, pdict):
            pc = {k: (v.astype(compute_dtype)
                      if jnp.issubdtype(v.dtype, jnp.floating) else v)
                  for k, v in pdict.items()}
            return layer_fn_raw(hh, pc)[0]

        @jax.custom_vjp
        def step(hh, bundle):
            return run(hh, {k: t[0] for k, t in bundle.items()})

        def fwd(hh, bundle):
            out = run(hh, {k: t[0] for k, t in bundle.items()})
            # residuals: ONLY the layer input + params — every
            # intermediate frees after the forward (remat "nothing")
            return out, (hh, bundle)

        def bwd(res, g):
            hh, bundle = res
            # gate the RECOMPUTE on the incoming cotangent: the
            # re-forward only depends on (hh, params), so without this
            # tie XLA starts every layer's recompute concurrently and
            # all 8 layers' forward intermediates co-reside while the
            # cotangent chain drains (measured 8 co-resident 256 MB
            # flash temps, +3 GB).  g for layer i exists only after
            # layer i+1's backward fully completed, so tying hh to g
            # serializes recompute_i -> grads_i -> update_i ->
            # release_g_{i-1}: peak = ONE layer's working set.
            hh, g = jax.lax.optimization_barrier((hh, g))
            pdict = {k: t[0] for k, t in bundle.items()}
            _, vjp = jax.vjp(run, hh, pdict)
            g_h, g_p = vjp(g)
            any_t = next(iter(bundle.values()))
            lr, bc1, bc2 = any_t[5], any_t[6], any_t[7]
            new_bundle = {}
            anchors = []
            for k, t in bundle.items():
                p, mq, ms, vq, vs = t[:5]
                if host_moments:
                    from mantis_tpu.parallel import offload as O

                    mq, ms, vq, vs = O.to_device((mq, ms, vq, vs))
                p1, mq1, ms1, vq1, vs1 = Q8.fused_adamw_update(
                    p, g_p[k], mq, ms, vq, vs, lr, bc1, bc2,
                    b1=b1, b2=b2, eps=eps, wd=wd, power_m=3, power_v=4)
                anchors.append(p1)
                if host_moments:
                    from mantis_tpu.parallel import offload as O

                    mq1, ms1, vq1, vs1 = O.to_host(
                        (mq1, ms1, vq1, vs1))
                new_bundle[k] = (p1, mq1, ms1, vq1, vs1,
                                 jnp.zeros_like(lr),
                                 jnp.zeros_like(bc1),
                                 jnp.zeros_like(bc2))
            # hold the activation cotangent hostage until every update
            # in this layer has consumed its grad
            tied = jax.lax.optimization_barrier(tuple([g_h] + anchors))
            return tied[0], new_bundle

        step.defvjp(fwd, bwd)
        return step(h, bundle)

    return hook


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

    def loss_from_params(params, batch, layer_update_hook=None):
        if compute_loss is not None:
            kw = {}
            if context_attention is not None:
                kw.update(context_attention=context_attention,
                          labels_preshifted=labels_preshifted)
            if vision_dp_mesh is not None:
                kw.update(vision_dp_mesh=vision_dp_mesh)
            if layer_update_hook is not None:
                # only adapters that forward **kw into a hook-aware
                # model forward opt in (archs.py supports_layer_hook)
                kw.update(layer_update_hook=layer_update_hook)
            if train_cfg.mlp_chunk and getattr(
                    compute_loss, "supports_layer_hook", False):
                kw.update(mlp_chunk=train_cfg.mlp_chunk)
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
        if train_cfg.mlp_chunk:
            kwargs.update(mlp_chunk=train_cfg.mlp_chunk)
        if layer_update_hook is not None:
            kwargs.update(layer_update_hook=layer_update_hook)
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

    def loss_fn(trainable, batch, frozen):
        params = cast(build_full_params(trainable, frozen))
        return loss_from_params(params, batch)

    offloading = False
    if train_cfg.optimizer_offload:
        from mantis_tpu.parallel import offload as _offload

        offloading = _offload.host_memory_supported()
    in_backward = train_cfg.optimizer_in_backward
    if in_backward:
        if train_cfg.lora is not None:
            raise ValueError(
                "optimizer_in_backward does not compose with LoRA")
        if train_cfg.gradient_accumulation_steps > 1:
            raise ValueError(
                "optimizer_in_backward does not compose with gradient "
                "accumulation (grads are consumed per-leaf)")
        if train_cfg.grad_clip:
            raise ValueError(
                "optimizer_in_backward consumes each grad before a "
                "global norm exists — set grad_clip=0 (same "
                "restriction as torch's in-backward optimizers)")
    # the fused leaf-wise update is what makes offload WORTH it (peak =
    # params+grads+one-leaf staging); it implements exactly the
    # clip+adamw chain, so only plain-accumulation runs take it —
    # MultiSteps wraps the chain in accumulation state it can't mimic
    fused = (offloading and not in_backward
             and train_cfg.gradient_accumulation_steps <= 1)
    sched = (make_lr_schedule(train_cfg) if fused or in_backward
             else None)
    moments_int8 = in_backward and train_cfg.optimizer_moments_int8
    # int8 + offload: the packed moments live in PINNED HOST memory and
    # stream through the fused kernel per leaf (zero3_offload x
    # adamw8bit) — HBM holds no optimizer state at all
    moments_int8_host = moments_int8 and offloading
    attach = (make_adamw_in_backward(
        train_cfg.adam_b1, train_cfg.adam_b2, train_cfg.adam_eps,
        train_cfg.weight_decay) if in_backward and not moments_int8
        else None)
    attach8 = (make_adamw_in_backward8(
        train_cfg.adam_b1, train_cfg.adam_b2, train_cfg.adam_eps,
        train_cfg.weight_decay, host_moments=moments_int8_host)
        if moments_int8 else None)
    layer_hook = (make_layer_adamw8_hook(
        train_cfg.adam_b1, train_cfg.adam_b2, train_cfg.adam_eps,
        train_cfg.weight_decay, compute_dtype,
        host_moments=moments_int8_host) if moments_int8 else None)
    is_triple = lambda x: isinstance(x, tuple)  # noqa: E731

    def train_step_in_backward(state: TrainState, batch: Dict, frozen
                               ) -> Tuple[TrainState, Dict]:
        import optax

        from mantis_tpu.parallel import offload as O

        flat, treedef, adam_i, st = _locate_adam_state(state.opt_state)
        # device-resident int8: a device_put to the space the array is
        # already in lowers to an hbm->hbm DMA the TPU AOT compiler
        # rejects ("Unimplemented DMA from hbm to hbm"), so only move
        # count when the state actually lives on host
        count = (O.to_device(st.count)
                 if offloading or not moments_int8 else st.count)
        count_inc = optax.safe_int32_increment(count)
        # constant schedules return a python float; the custom_vjp
        # tangent path needs an array (zeros_like on the residual)
        lr = jnp.asarray(sched(count), jnp.float32)
        bc1 = 1.0 - train_cfg.adam_b1 ** count_inc.astype(jnp.float32)
        bc2 = 1.0 - train_cfg.adam_b2 ** count_inc.astype(jnp.float32)
        if moments_int8:
            import re as _re

            # flat-list plumbing: mu/nu leaves are (packed, scale)
            # pairs, so tree.map over (params, mu, nu) cannot zip them
            with_path = jax.tree_util.tree_flatten_with_path(
                state.params)[0]
            leaves_p, tdef_p = jax.tree_util.tree_flatten(state.params)
            leaves_m = jax.tree_util.tree_flatten(
                st.mu, is_leaf=is_triple)[0]
            leaves_v = jax.tree_util.tree_flatten(
                st.nu, is_leaf=is_triple)[0]
            args = [(p, m[0], m[1], v[0], v[1]) for p, m, v
                    in zip(leaves_p, leaves_m, leaves_v)]
            paths = [jax.tree_util.keystr(kp) for kp, _ in with_path]
            # UNSTACKED decoder layers (list-typed params['layers'],
            # models/llama.py unstack_layers) take the per-LAYER
            # update-in-backward path: the whole layer wraps in one
            # custom_vjp whose backward updates the layer's params the
            # moment its grads exist and gates the activation cotangent
            # on the updated params — at most ONE layer's weight grads
            # are ever live (make_layer_adamw8_hook).  Everything else
            # (embeds, lm_head, norm, projector) keeps the leaf-level
            # token chain.
            layer_pat = _re.compile(r"\['layers'\]\[\d+\]")
            hookable = (compute_loss is None or getattr(
                compute_loss, "supports_layer_hook", False))
            layer_idx = ({i for i, pp in enumerate(paths)
                          if layer_pat.search(pp)}
                         if hookable and layer_hook else set())
            order = [i for i in _token_thread_order(paths)
                     if i not in layer_idx]
            is_tup = lambda x: isinstance(x, tuple)  # noqa: E731

            def loss8(args, batch, frozen):
                # thread one scheduling token through the non-layer
                # leaves in REVERSE grad-arrival order: each attach8
                # backward waits on its token cotangent, so updates run
                # in arrival order (lm_head/norm first, embed,
                # projector last) and each grad frees as soon as its
                # update consumes it.  Threading in tree-flatten order
                # instead stalls the whole chain on the projector
                # (last flattened, last grad to arrive) and keeps the
                # ENTIRE grad tree alive — measured +24 GB at depth 8.
                tok = jnp.zeros((), jnp.float32)
                tr = [None] * len(args)
                for i in order:
                    p, mq, ms, vq, vs = args[i]
                    tr[i], tok = attach8(p, mq, ms, vq, vs,
                                         lr, bc1, bc2, tok)
                for i in layer_idx:
                    # layer leaves stay BUNDLED (p, moments, hyper);
                    # the layer hook consumes them inside the decoder
                    # loop and their updated values come back as the
                    # bundle's cotangent
                    tr[i] = args[i] + (lr, bc1, bc2)
                trainable = jax.tree_util.tree_unflatten(tdef_p, tr)
                # bundle tuples are opaque: combine/cast must not
                # descend into them (cast would corrupt the bitcast-
                # packed int8 containers)
                params = jax.tree.map(
                    lambda a, b: b if a is None else a,
                    trainable, frozen,
                    is_leaf=lambda x: x is None or is_tup(x))
                params = jax.tree.map(
                    lambda x: x if is_tup(x) else (
                        x.astype(compute_dtype)
                        if jnp.issubdtype(x.dtype, jnp.floating)
                        else x),
                    params, is_leaf=is_tup)
                return loss_from_params(
                    params, batch,
                    layer_update_hook=layer_hook if layer_idx
                    else None)

            loss, g = jax.value_and_grad(loss8)(args, batch, frozen)
            new_params = jax.tree_util.tree_unflatten(
                tdef_p, [t[0] for t in g])
            new_mu = jax.tree_util.tree_unflatten(
                tdef_p, [(t[1], t[2]) for t in g])
            new_nu = jax.tree_util.tree_unflatten(
                tdef_p, [(t[3], t[4]) for t in g])
            opt_state = _rebuild_opt_state(
                flat, treedef, adam_i, count_inc, new_mu, new_nu)
            return TrainState(step=state.step + 1, params=new_params,
                              opt_state=opt_state), {
                "loss": loss, "grad_norm": jnp.float32(jnp.nan)}

        trip = jax.tree.map(lambda p, m, v: (p, m, v),
                            state.params, st.mu, st.nu)

        def loss3(trip, batch, frozen):
            trainable = jax.tree.map(
                lambda t: attach(t[0], t[1], t[2], lr, bc1, bc2),
                trip, is_leaf=is_triple)
            params = cast(combine_params(trainable, frozen))
            return loss_from_params(params, batch)

        # the "gradient" of each (p, m, v) triple IS its update result
        loss, gtrip = jax.value_and_grad(loss3)(trip, batch, frozen)
        new_params = jax.tree.map(lambda t: t[0], gtrip,
                                  is_leaf=is_triple)
        new_mu = jax.tree.map(lambda t: t[1], gtrip, is_leaf=is_triple)
        new_nu = jax.tree.map(lambda t: t[2], gtrip, is_leaf=is_triple)
        opt_state = _rebuild_opt_state(
            flat, treedef, adam_i, O.to_host(count_inc), new_mu, new_nu)
        # grads never materialize as a tree, so no grad_norm metric
        return TrainState(step=state.step + 1, params=new_params,
                          opt_state=opt_state), {
            "loss": loss, "grad_norm": jnp.float32(jnp.nan)}

    def train_step(state: TrainState, batch: Dict, frozen) -> Tuple[
            TrainState, Dict]:
        if in_backward:
            return train_step_in_backward(state, batch, frozen)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch,
                                                  frozen)
        if fused:
            params, opt_state, gnorm = fused_offload_adamw_update(
                train_cfg, sched, grads, state.opt_state, state.params)
            return TrainState(step=state.step + 1, params=params,
                              opt_state=opt_state), {
                "loss": loss, "grad_norm": gnorm}
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
                       mesh=None, moments_int8: bool = False
                       ) -> TrainState:
    """``optimizer_offload`` initializes the optimizer state DIRECTLY
    into pinned host memory via jit out_shardings (materializing it in
    HBM first would transiently need the full 8 bytes/param the offload
    exists to avoid).  Pass the TRAINING mesh on multi-device setups
    (parallel/offload.py host_sharding).  ``moments_int8`` builds the
    Adam moments as blockwise-int8 packed zeros (1 byte/param — the
    optimizer_moments_int8 train mode) without ever materializing the
    dense f32 state."""
    from mantis_tpu.parallel.offload import (
        host_memory_supported, host_sharding)

    if moments_int8:
        spec = jax.eval_shape(optimizer.init, trainable_params)
        flat, treedef, adam_i, _ = _locate_adam_state(spec)
        if optimizer_offload and host_memory_supported():
            # packed zeros land DIRECTLY in pinned host memory (the
            # int8 x zero3_offload mode: HBM never holds moments)
            sh = host_sharding(mesh)
            shapes = jax.eval_shape(init_moments_int8, trainable_params)
            out_sh = jax.tree.map(lambda _: sh, shapes)
            init = jax.jit(init_moments_int8, out_shardings=out_sh)
            mu = init(trainable_params)
            nu = init(trainable_params)   # separate call -> own buffers
            count = jax.device_put(jnp.zeros((), jnp.int32), sh)
        else:
            mu, nu = (init_moments_int8(trainable_params),
                      init_moments_int8(trainable_params))
            count = jnp.zeros((), jnp.int32)
        opt_state = _rebuild_opt_state(
            flat, treedef, adam_i, count, mu, nu)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=trainable_params,
            opt_state=opt_state,
        )
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
