"""LoRA / DoRA for the functional param-tree models.

Replaces the reference's peft integration (reference:
mantis/train/train_mllava.py:63-70 r=128/alpha=256, :116-128
``find_all_linear_names`` which excludes projector/vision/lm_head, :254
DoRA flag).  Adapters live in a separate pytree; the merged weight
``W + (alpha/r) * A @ B`` is formed inside the forward step (cheap:
O(r·in·out) per step vs O(B·S·in·out) for the matmul it decorates), so
the same model code serves base and LoRA training.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LoraConfig:
    r: int = 128
    alpha: float = 256.0
    # NOTE deviation from the reference peft recipe (lora_dropout=0.05,
    # train_mllava.py:63-70): LoRA dropout is NOT implemented here (the
    # jitted train step is deterministic); no field exists so configs
    # cannot silently claim otherwise.
    use_dora: bool = False
    # parameter-name suffixes to adapt; mirrors find_all_linear_names:
    # all LM linears, no vision tower / projector / lm_head.
    target_names: Tuple[str, ...] = (
        "q_proj", "k_proj", "v_proj", "o_proj",
        "gate_proj", "up_proj", "down_proj",
    )
    # path prefixes to skip entirely
    exclude_prefixes: Tuple[str, ...] = (
        "vision_tower", "multi_modal_projector")


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
    return "/".join(parts)


def init_lora_params(params: Any, cfg: LoraConfig, key: jax.Array,
                     dtype=jnp.float32) -> Dict:
    """Build {path: {'a': [..., in, r], 'b': [..., r, out]}} for targets.

    A: normal(0, 1/r) (kaiming-ish), B: zeros — so the initial delta is 0,
    matching peft defaults.
    """
    from mantis_tpu.ops.quant import QuantTensor

    lora = {}
    leaves = jax.tree_util.tree_flatten_with_path(
        params, is_leaf=lambda x: isinstance(x, QuantTensor))[0]
    keys = jax.random.split(key, max(len(leaves), 1))
    for (path, leaf), k in zip(leaves, keys):
        ps = _path_str(path)
        if any(ps.startswith(e) for e in cfg.exclude_prefixes):
            continue
        name = ps.split("/")[-1]
        if name not in cfg.target_names or leaf.ndim < 2:
            continue
        *lead, din, dout = leaf.shape
        a = (jax.random.normal(k, (*lead, din, cfg.r), jnp.float32)
             * (1.0 / cfg.r)).astype(dtype)
        b = jnp.zeros((*lead, cfg.r, dout), dtype)
        lora[ps] = {"a": a, "b": b}
    return lora


def apply_lora(params: Any, lora: Dict, cfg: LoraConfig,
               freeze_base: bool = True) -> Any:
    """Merged params: W' = sg(W) + scale * A @ B  (sg when base frozen).

    DoRA additionally re-normalizes each column of W' to a learned
    magnitude ``m`` (initialized from ||W||; stored in the lora tree).
    """
    from mantis_tpu.ops.quant import QuantTensor, dequantize

    scale = cfg.alpha / cfg.r

    def merge(path, leaf):
        ps = _path_str(path)
        if isinstance(leaf, QuantTensor):
            # QLoRA: dequantize the frozen 4/8-bit base at forward time
            leaf = dequantize(leaf, leaf.dtype)
        if ps not in lora:
            return jax.lax.stop_gradient(leaf) if freeze_base else leaf
        base = jax.lax.stop_gradient(leaf) if freeze_base else leaf
        ab = lora[ps]
        if cfg.use_dora and "m" not in ab:
            raise ValueError(
                f"use_dora=True but no magnitude 'm' for {ps}: call "
                "init_dora_magnitudes(params, lora) after "
                "init_lora_params")
        delta = jnp.einsum(
            "...ir,...ro->...io", ab["a"], ab["b"]) * scale
        w = base + delta.astype(base.dtype)
        if cfg.use_dora and "m" in ab:
            norm = jnp.linalg.norm(
                w.astype(jnp.float32), axis=-2, keepdims=True)
            w = (w / jnp.maximum(norm, 1e-6).astype(w.dtype)
                 * ab["m"].astype(w.dtype))
        return w

    return jax.tree_util.tree_map_with_path(
        merge, params,
        is_leaf=lambda x: isinstance(x, QuantTensor))


def init_dora_magnitudes(params: Any, lora: Dict) -> Dict:
    """Add per-column magnitude vectors m = ||W||_col to the lora tree.

    Must be called after :func:`init_lora_params` whenever
    ``cfg.use_dora`` is set — without the ``m`` entries ``apply_lora``
    silently degrades to plain LoRA.  Accepts quantized (QLoRA) bases.
    """
    from mantis_tpu.ops.quant import QuantTensor, dequantize

    leaves = dict(
        (_path_str(p), l)
        for p, l in jax.tree_util.tree_flatten_with_path(
            params, is_leaf=lambda x: isinstance(x, QuantTensor))[0])
    out = {}
    for ps, ab in lora.items():
        w = leaves[ps]
        if isinstance(w, QuantTensor):
            w = dequantize(w, jnp.float32)
        w = w.astype(jnp.float32)
        m = jnp.linalg.norm(w, axis=-2, keepdims=True)
        out[ps] = dict(ab, m=m.astype(ab["a"].dtype))
    return out


def merge_lora_into_params(params: Any, lora: Dict, cfg: LoraConfig) -> Any:
    """Permanently bake adapters into the base weights (for export)."""
    return apply_lora(params, lora, cfg, freeze_base=False)
