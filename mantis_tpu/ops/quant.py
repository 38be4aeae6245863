"""Weight-only int8/int4 quantization — the QLoRA substrate.

TPU-native replacement for bitsandbytes NF4 double-quant
(reference: mantis/train/train_mllava.py:134-142 — 4-bit base weights
with LoRA adapters, vision tower skipped).  Weights are quantized
group-wise along the input dim with symmetric absmax scales; the
matmul path dequantizes into the MXU input (XLA fuses the scale
multiply), keeping HBM footprint at 1 byte (int8) or packed 4 bits.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class QuantTensor:
    """Group-wise symmetric quantized weight.

    q:     int8 storage.  bits=8: one value per byte,
           [..., g, group, out].  bits=4: TWO values per byte packed
           along the group axis (low nibble = even element, high nibble
           = odd), [..., g, group/2, out] — true 0.5 byte/weight HBM.
    scale: f32 [..., in/group, 1, out] per-group scales.
    bits:  4 or 8 (static).
    """

    q: jax.Array
    scale: jax.Array
    bits: int = struct.field(pytree_node=False, default=8)

    @property
    def shape(self):
        *lead, g, gs, out = self.q.shape
        if self.bits == 4:
            gs *= 2
        return (*lead, g * gs, out)

    @property
    def ndim(self):
        return len(self.shape)

    @property
    def dtype(self):
        return self.scale.dtype


def quantize(w: jax.Array, bits: int = 8, group_size: int = 128
             ) -> QuantTensor:
    """w [..., in, out] -> QuantTensor with groups along the in dim."""
    *lead, din, dout = w.shape
    assert din % group_size == 0, (din, group_size)
    g = din // group_size
    wg = w.reshape(*lead, g, group_size, dout).astype(jnp.float32)
    maxq = 127.0 if bits == 8 else 7.0
    absmax = jnp.max(jnp.abs(wg), axis=-2, keepdims=True)
    scale = jnp.where(absmax == 0, 1.0, absmax / maxq)
    q = jnp.clip(jnp.round(wg / scale), -maxq - 1, maxq).astype(jnp.int8)
    if bits == 4:
        assert group_size % 2 == 0, group_size
        low = q[..., 0::2, :]
        high = q[..., 1::2, :]
        q = (low & jnp.int8(0x0F)) | (high << 4)
    return QuantTensor(q=q, scale=scale, bits=bits)


def dequantize(qt: QuantTensor, dtype=jnp.bfloat16) -> jax.Array:
    q = qt.q
    if qt.bits == 4:
        # arithmetic shifts sign-extend each nibble back to int8
        low = jnp.right_shift(jnp.left_shift(q, 4), 4)
        high = jnp.right_shift(q, 4)
        *lead, g, gs2, out = q.shape
        q = jnp.stack([low, high], axis=-2).reshape(
            *lead, g, gs2 * 2, out)
    if jnp.dtype(dtype) == jnp.float32:
        w = q.astype(jnp.float32) * qt.scale  # exact path (tests/QLoRA)
    else:
        # serving: skip the f32 intermediate (int8 values are exact in
        # bf16; only the scale rounds) — halves dequant HBM traffic
        w = q.astype(dtype) * qt.scale.astype(dtype)
    *lead, g, gs, out = w.shape
    return w.reshape(*lead, g * gs, out).astype(dtype)


def quant_matmul(x: jax.Array, qt: QuantTensor) -> jax.Array:
    """x [..., in] @ dequant(qt) WITHOUT materializing the weights.

    The group-wise scale is constant along the contraction within each
    group, so it factors out of the dot:
        out = sum_g scale[g] * (x[g-slice] @ q[g])
    XLA fuses the int8->activation-dtype convert into the dot operand,
    but it will NOT fuse a scale-multiply producer — the naive
    ``x @ dequantize(qt)`` writes a full f32 weight tensor per call
    (measured: 6.4 tok/s full-depth decode vs this formulation).
    """
    assert qt.q.ndim == 3, (
        "stacked-layer QuantTensor: use vmap/scan per layer "
        f"(got q shape {qt.q.shape})")
    rows = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1
    if rows > 128:
        # prefill/training: the [rows, groups, dout] partial would dwarf
        # the one-off dequantized weight tensor; materialize instead
        return x @ dequantize(qt, x.dtype)
    q = qt.q
    if qt.bits == 4:
        *lead, g, gs2, dout = q.shape
        assert not lead, "use vmap/scan for stacked-layer QuantTensors"
        # Two half-group dots with pure-elementwise shift producers:
        # 45.6 tok/s full-depth decode vs 8.6 for the previous
        # stack/reshape unpack (which materialized the unpacked tensor
        # every token).  A Pallas in-register-unpack matvec
        # (ops/int4_matmul.py) and XLA-native jnp.int4 were both
        # measured SLOWER (36.8 tok/s / 17x traffic) — the VPU nibble
        # unpack at full weight volume costs more than the halved HBM
        # reads save on this chip; int8 (57.7 tok/s) remains the
        # serving configuration (docs/PERF.md).
        low = jnp.right_shift(jnp.left_shift(q, 4), 4)
        high = jnp.right_shift(q, 4)
        xg = x.reshape(*x.shape[:-1], g, gs2 * 2)
        part = jnp.einsum(
            "...gk,gko->...go", xg[..., 0::2], low.astype(x.dtype),
            preferred_element_type=jnp.float32)
        part = part + jnp.einsum(
            "...gk,gko->...go", xg[..., 1::2], high.astype(x.dtype),
            preferred_element_type=jnp.float32)
        scale = qt.scale.reshape(g, dout)
        return jnp.sum(part * scale, axis=-2).astype(x.dtype)
    *lead, g, gs, dout = q.shape
    assert not lead, "use vmap/scan for stacked-layer QuantTensors"
    xg = x.reshape(*x.shape[:-1], g, gs)
    part = jnp.einsum(
        "...gk,gko->...go", xg, q.astype(x.dtype),
        preferred_element_type=jnp.float32)
    scale = qt.scale.reshape(g, dout)
    out = jnp.sum(part * scale, axis=-2)
    return out.astype(x.dtype)


def quantize_tree(params: Any, bits: int = 4, group_size: int = 128,
                  predicate: Optional[Callable[[str], bool]] = None
                  ) -> Any:
    """Quantize matching >=2-D leaves of a param tree in place.

    Default predicate matches the reference's QLoRA policy: language
    model linear weights only (no vision tower, no norms/embeddings).
    """
    if predicate is None:
        def predicate(path: str) -> bool:
            name = path.split("/")[-1]
            return (path.startswith("language_model")
                    and name in ("q_proj", "k_proj", "v_proj", "o_proj",
                                 "gate_proj", "up_proj", "down_proj"))

    def _path_str(path):
        parts = []
        for p in path:
            if hasattr(p, "key"):
                parts.append(str(p.key))
            elif hasattr(p, "idx"):
                parts.append(str(p.idx))
        return "/".join(parts)

    def f(path, leaf):
        ps = _path_str(path)
        if (predicate(ps) and hasattr(leaf, "ndim") and leaf.ndim >= 2
                and leaf.shape[-2] % group_size == 0):
            return quantize(leaf, bits=bits, group_size=group_size)
        return leaf

    return jax.tree_util.tree_map_with_path(f, params)


def dequantize_tree(params: Any, dtype=jnp.bfloat16) -> Any:
    return jax.tree.map(
        lambda x: dequantize(x, dtype) if isinstance(x, QuantTensor)
        else x,
        params, is_leaf=lambda x: isinstance(x, QuantTensor))
