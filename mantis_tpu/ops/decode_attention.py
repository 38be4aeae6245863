"""Pallas decode attention: one query token per row against the KV cache.

Why a dedicated kernel (round-5 decode-roofline work, docs/PERF.md):
XLA's decode attention — the ``_decode_attention`` einsum pair in
models/llama.py — measures ~103 us/layer at ctx 6048 on v5e, an
effective ~124 GB/s over the 12.9 MB of int8 KV it must stream, vs the
~819 GB/s HBM peak.  The gap is not a layout problem (a pre-transposed
[B, Hk, M, D] cache measures the same 109 us; scripts/
profile_decode_attn_layout.py) but op-granularity: the QK dot, scale
multiply, mask, softmax, probs-scale and PV dot each materialize
[Hk, G, M]-shaped intermediates in HBM-adjacent scratch and none of
the streams overlap.  This kernel fuses the whole per-layer decode
attention into one pass over the cache with online softmax, reading
k/v in their NATIVE cache layout ([B, M, Hk, D] blocks are contiguous
in memory) and dequantizing int8 in VMEM.

Per-row valid lengths ride in scalar-prefetch: trailing dead blocks
clamp their index map to the last valid block, and Mosaic's pipeline
skips the re-DMA of an unchanged block — a slot at length 500 in a
2048-deep cache streams only ~1/4 of the cache, which XLA's dense
einsum cannot do.  (Serving decodes batches of slots with wildly
different lengths; reference per-token decode loop:
mantis/models/mllava/modeling_llava.py:480-519 via HF generate.)

Semantics match ``_decode_attention`` for sq == 1 exactly:
``valid(pos) = (pos < length_b) & (kv_seg[b, pos] == q_seg[b])`` —
the query sits at position ``length_b - 1`` so causality IS the length
bound.  int8 caches carry per-(token, head) scales: k's multiply the
logits, v's fold into the probs (ops/quant.py convention).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _pick_block_m(m: int) -> Optional[int]:
    """Largest divisor of m that is a multiple of 128 and <= 1024.

    The segment block (1, block_m) puts block_m in the lane dimension,
    which Mosaic requires to be a 128-multiple (int8 k/v blocks only
    need the M axis %32, but seg is the binding constraint).  Returns
    None when m itself is not a 128-multiple — callers fall back to
    the XLA path; cache creators should round max_len up to %128 to
    stay on the kernel."""
    if m % _LANES:
        return None
    best = 0
    for cand in range(_LANES, min(m, 1024) + 1, _LANES):
        if m % cand == 0:
            best = cand
    return best or _LANES


def supports(m: int) -> bool:
    """True when the fused kernel can serve a cache of depth ``m``."""
    return m % _LANES == 0


def _kernel(len_ref, qseg_ref,             # scalar prefetch [B]
            q_ref, k_ref, v_ref, kseg_ref, ks_ref, vs_ref,
            o_ref,
            m_scr, l_scr, acc_scr,
            *, scale, hk, group, block_m, num_blocks, quant):
    b = pl.program_id(0)
    ki = pl.program_id(1)
    hq = hk * group

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    length = len_ref[b]
    # dead block: every position in it is >= length (clamped index map
    # re-targets the DMA at the last live block, so this costs no HBM)
    @pl.when(ki * block_m < length)
    def _compute():
        # valid = (pos < length) & (kv_seg == q_seg); the block index
        # used for position arithmetic must match the DMA clamp
        eff_ki = jnp.minimum(ki, (length - 1) // block_m)
        col = eff_ki * block_m + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_m), 1)
        kseg = kseg_ref[0:1, :]                       # [1, block_m]
        valid = (col < length) & (kseg == qseg_ref[b])

        kb = k_ref[0]                                 # [block_m, hk, d]
        vb = v_ref[0]
        # per-head QK dots land in one [hq, block_m] tile so every
        # online-softmax op below runs full-tile (per-G sub-vreg
        # scratch read-modify-writes measured 1.5x SLOWER than XLA;
        # the 8-row-aligned [hq, *] forms are what make this kernel
        # beat it)
        parts = []
        for h in range(hk):
            qh = q_ref[0, h * group:(h + 1) * group, :]     # [G, d]
            kh = kb[:, h, :].astype(qh.dtype)         # [block_m, d]
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)   # [G, block_m]
            if quant:
                s = s * ks_ref[0, h, :][None, :]      # k scales
            parts.append(s)
        s_all = jnp.concatenate(parts, axis=0) * scale
        s_all = jnp.where(valid, s_all, -jnp.inf)     # [hq, block_m]

        m_prev = m_scr[:, 0:1]                        # [hq, 1]
        m_new = jnp.maximum(m_prev, jnp.max(
            s_all, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s_all - m_new)                    # [hq, block_m]
        l_scr[:, 0:1] = l_scr[:, 0:1] * alpha + jnp.sum(
            p, axis=-1, keepdims=True)
        m_scr[:, 0:1] = m_new
        if quant:
            p = p * jnp.repeat(vs_ref[0], group, axis=0)  # v scales
        p = p.astype(q_ref.dtype)
        pv_parts = [
            jax.lax.dot_general(
                p[h * group:(h + 1) * group, :],
                vb[:, h, :].astype(p.dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # [G, d]
            for h in range(hk)]
        acc_scr[:, :] = acc_scr[:, :] * alpha + jnp.concatenate(
            pv_parts, axis=0)

    @pl.when(ki == num_blocks - 1)
    def _epilogue():
        l = l_scr[:, 0:1]
        safe = jnp.where(l > 0, l, 1.0)
        o_ref[0] = (acc_scr[:, :] / safe).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_m", "interpret"))
def decode_attention(
    q: jax.Array,                 # [B, HQ, D]
    k: jax.Array,                 # [B, M, HK, D] int8 | bf16 | f32
    v: jax.Array,
    kv_seg: jax.Array,            # [B, M] int32
    q_seg: jax.Array,             # [B] int32
    lengths: jax.Array,           # [B] int32 valid prefix per row
    k_scale: Optional[jax.Array] = None,   # [B, M, HK] f32 (int8 kv)
    v_scale: Optional[jax.Array] = None,
    *,
    scale: float,
    block_m: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Fused single-token attention over the cache; returns [B, HQ, D]
    in q's dtype.  See module docstring for semantics."""
    b, hq, d = q.shape
    _, m, hk, _ = k.shape
    group = hq // hk
    if interpret is None:
        interpret = _interpret_default()
    if block_m is None:
        block_m = _pick_block_m(m)
    nm = m // block_m
    quant = k_scale is not None

    lengths = lengths.astype(jnp.int32)
    q_seg = q_seg.astype(jnp.int32)

    def clamp(ki, length):
        # trailing dead blocks re-target the last live block; Mosaic
        # skips the DMA when the block index repeats
        last = jnp.maximum(length - 1, 0) // block_m
        return jnp.minimum(ki, last)

    def kv_map(b_, ki, len_ref, qseg_ref):
        return (b_, clamp(ki, len_ref[b_]), 0, 0)

    def seg_map(b_, ki, len_ref, qseg_ref):
        return (b_, clamp(ki, len_ref[b_]))

    def scale_map(b_, ki, len_ref, qseg_ref):
        return (b_, 0, clamp(ki, len_ref[b_]))

    q_spec = pl.BlockSpec((1, hq, d), lambda b_, ki, *_: (b_, 0, 0))
    kv_spec = pl.BlockSpec((1, block_m, hk, d), kv_map)
    seg_spec = pl.BlockSpec((1, block_m), seg_map)
    o_spec = q_spec

    if quant:
        # scales transposed to [B, HK, M] OUTSIDE the kernel (~200 KB,
        # one cheap XLA copy) so their DMA streams lane-major
        # (1, hk, block_m) blocks instead of 32-byte strided rows
        sc_spec = pl.BlockSpec((1, hk, block_m), scale_map)
        in_specs = [q_spec, kv_spec, kv_spec, seg_spec, sc_spec,
                    sc_spec]
        args = (q, k, v, kv_seg.astype(jnp.int32),
                k_scale.astype(jnp.float32).transpose(0, 2, 1),
                v_scale.astype(jnp.float32).transpose(0, 2, 1))
    else:
        in_specs = [q_spec, kv_spec, kv_spec, seg_spec]
        args = (q, k, v, kv_seg.astype(jnp.int32))

    def kernel(len_ref, qseg_ref, q_ref, k_ref, v_ref, kseg_ref,
               *rest):
        if quant:
            ks_ref, vs_ref, o_ref, m_scr, l_scr, acc_scr = rest
        else:
            (o_ref, m_scr, l_scr, acc_scr) = rest
            ks_ref = vs_ref = None
        _kernel(len_ref, qseg_ref, q_ref, k_ref, v_ref, kseg_ref,
                ks_ref, vs_ref, o_ref, m_scr, l_scr, acc_scr,
                scale=scale, hk=hk, group=group, block_m=block_m,
                num_blocks=nm, quant=quant)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, nm),
        in_specs=in_specs,
        out_specs=[o_spec],
        scratch_shapes=[
            pltpu.VMEM((hq, _LANES), jnp.float32),   # running max
            pltpu.VMEM((hq, _LANES), jnp.float32),   # running sum
            pltpu.VMEM((hq, d), jnp.float32),        # output acc
        ],
    )
    (out,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b, hq, d), q.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * b * hq * m * d),
            bytes_accessed=int(k.size + v.size
                               + (k_scale.size * 8 if quant else 0)),
            transcendentals=int(b * hq * m),
        ),
        interpret=interpret,
    )(lengths, q_seg, *args)
    return out
