"""Sharding rules: GSPMD FSDP (ZeRO-3 equivalent) + optional tensor
parallelism.

Replaces DeepSpeed ZeRO-1/2/3 and the FSDP accelerate configs
(reference: mantis/train/zero_configs/zero3.json,
accelerate_configs/accelerate_config_zero3.yaml): instead of runtime
gather/scatter hooks, parameters and optimizer state carry a
``NamedSharding`` over the ``fsdp`` mesh axis and XLA inserts the
all-gathers/reduce-scatters.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


# Tensor-parallel axis assignment per parameter name, when a 'tensor'
# mesh axis is present: column-parallel (out sharded) for qkv/gate/up,
# row-parallel (in sharded) for o/down — megatron layout.
_TP_COL = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj", "fc1",
           "q", "k", "v", "linear_1", "lm_head")
_TP_ROW = ("o_proj", "down_proj", "fc2", "o", "linear_2")


def param_pspec(path: str, shape, mesh: Mesh,
                fsdp_axis: str = "fsdp",
                tensor_axis: Optional[str] = "tensor") -> P:
    """FSDP(+TP) PartitionSpec for one parameter.

    Strategy: TP shards the designated matmul dimension on 'tensor';
    FSDP shards the largest remaining divisible dim on 'fsdp'.
    1-D params (norms, biases) replicate.
    """
    fsdp_n = mesh.shape[fsdp_axis] if fsdp_axis in mesh.shape else 1
    tp_n = (mesh.shape[tensor_axis]
            if tensor_axis and tensor_axis in mesh.shape else 1)
    ndim = len(shape)
    spec = [None] * ndim
    if ndim <= 1:
        return P(*spec)

    name = path.split("/")[-1]
    # Stacked-layer tensors have a leading L axis; matmul dims are the
    # last two (or last one for embeddings).
    if tp_n > 1:
        # only shard a divisible dim; a ragged one (e.g. an odd vocab
        # head) replicates rather than erroring at device_put
        if any(name == t for t in _TP_COL) \
                and shape[ndim - 1] % tp_n == 0:
            spec[ndim - 1] = tensor_axis
        elif any(name == t for t in _TP_ROW) \
                and shape[ndim - 2] % tp_n == 0:
            spec[ndim - 2] = tensor_axis
        elif name == "embed_tokens" and shape[ndim - 1] % tp_n == 0:
            spec[ndim - 1] = tensor_axis

    if fsdp_n > 1:
        # largest free dim divisible by fsdp_n
        cand = sorted(range(ndim), key=lambda i: -shape[i])
        for i in cand:
            if spec[i] is None and shape[i] % fsdp_n == 0 and shape[i] > 1:
                spec[i] = fsdp_axis
                break
    return P(*spec)


def make_param_shardings(params: Any, mesh: Mesh, rule: Callable = None):
    """Pytree of NamedShardings matching ``params``."""
    rule = rule or param_pspec

    def f(path, leaf):
        spec = rule(_path_str(path), np.shape(leaf), mesh)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(f, params)


def shard_params(params: Any, mesh: Mesh, rule: Callable = None):
    shardings = make_param_shardings(params, mesh, rule)
    return jax.device_put(params, shardings)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch tensors: batch dim over data(+fsdp), seq over context."""
    axes = [a for a in ("data", "fsdp") if mesh.shape.get(a, 1) > 1]
    batch_axes = tuple(axes) if axes else None
    if mesh.shape.get("context", 1) > 1:
        return NamedSharding(mesh, P(batch_axes, "context"))
    return NamedSharding(mesh, P(batch_axes))
