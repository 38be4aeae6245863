"""Pallas decode attention: one query token per row against the KV cache.

Why a dedicated kernel (round-5 decode-roofline work, docs/PERF.md):
XLA's decode attention — the ``_decode_attention`` einsum pair in
models/llama.py — measures ~103 us/layer at ctx 6144 on v5e, an
effective ~124 GB/s over the 12.9 MB of int8 KV it must stream, vs the
~819 GB/s HBM peak.  Three findings shaped this kernel (all measured,
scripts/profile_decode_attn_layout.py + the probe ablations):

1. A [B, Hk, M, D] pre-transposed cache measures the SAME ~110 us —
   the gap is not a transpose.
2. A pure int8 stream through Pallas with (block_m, 8, 128)-shaped
   blocks also caps at ~136 GB/s: int8 VMEM tiles are (32, 128), so an
   8-sublane head dimension pads 4x in VMEM, and every int8->f32
   convert is a cross-sublane unpack (the same effect that sank the
   int8 encode attention, scripts/profile_int8_attention.py).
3. Sub-vreg (4-row) scratch read-modify-writes are slow; all softmax
   state must live in 8-row-aligned tiles.

Hence the design: k/v stream as FLAT [block_m, Hk*D] int8 blocks
(contiguous DMA, zero tile padding; per-head access is a lane slice),
the QK and PV contractions run as int8 x int8 MXU dots — q is
row-quantized once per call outside the kernel, probs are row-quantized
in-register (128 KB, vs converting the 1 MB v block) — and the online
softmax runs full-tile over [Hk*8, block_m] with the GQA group padded
from 4 to 8 rows.  bf16/f32 caches skip the quantization and use plain
bf16 dots over the same flat layout.

Per-row valid lengths ride in scalar-prefetch: trailing dead blocks
clamp their index map to the last live block, and Mosaic's pipeline
skips the re-DMA of an unchanged block — a slot at length 500 in a
2048-deep cache streams only ~1/4 of the cache, which XLA's dense
einsum cannot do.  (Serving decodes batches of slots with wildly
different lengths; reference per-token decode loop:
mantis/models/mllava/modeling_llava.py:480-519 via HF generate.)

Semantics match ``_decode_attention`` for sq == 1:
``valid(pos) = (pos < length_b) & (kv_seg[b, pos] == q_seg[b])`` —
the query sits at position ``length_b - 1`` so causality IS the length
bound.  int8 caches carry per-(token, head) scales: k's multiply the
logits, v's fold into the probs (ops/quant.py convention).  The int8
path is W8A8 (q and probs quantized), adding ~0.3% relative logit
noise on top of the cache's own int8 noise — serving-grade, parity
pinned in tests/test_decode_attention.py.
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
_GPAD = 8   # GQA group rows padded to one full sublane tile


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _pick_block_m(m: int) -> Optional[int]:
    """Largest divisor of m that is a multiple of 128 and <= 1024.

    The segment block (1, block_m) puts block_m in the lane dimension,
    which Mosaic requires to be a 128-multiple.  Returns None when m
    itself is not a 128-multiple — callers fall back to the XLA path;
    cache creators should round max_len up to %128 to stay on the
    kernel."""
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
            q_ref, qsc_ref, k_ref, v_ref, kseg_ref, ks_ref, vs_ref,
            o_ref,
            m_scr, l_scr, acc_scr,
            *, scale, hk, d, block_m, num_blocks, quant):
    b = pl.program_id(0)
    ki = pl.program_id(1)
    rows = hk * _GPAD

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
        kseg = kseg_ref[0]                            # [1, block_m]
        valid = (col < length) & (kseg == qseg_ref[b])

        kb = k_ref[0]                                 # [block_m, hk*d]
        vb = v_ref[0]
        parts = []
        for h in range(hk):
            qh = q_ref[0, h * _GPAD:(h + 1) * _GPAD, :]   # [8, d]
            kh = kb[:, h * d:(h + 1) * d]             # [block_m, d]
            if quant:
                s = jax.lax.dot_general(             # int8 MXU dot
                    qh, kh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(
                    jnp.float32)
                s = s * ks_ref[0, h, :][None, :]      # k scales
            else:
                s = jax.lax.dot_general(
                    qh, kh.astype(qh.dtype), (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            parts.append(s)
        s_all = jnp.concatenate(parts, axis=0)        # [rows, block_m]
        if quant:
            # per-row dequant of the int32 dot: q row scale x softmax
            s_all = s_all * qsc_ref[0, 0][:, None]
        else:
            s_all = s_all * scale
        s_all = jnp.where(valid, s_all, -jnp.inf)

        m_prev = m_scr[:, 0:1]                        # [rows, 1]
        m_new = jnp.maximum(m_prev, jnp.max(
            s_all, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s_all - m_new)                    # [rows, block_m]
        l_scr[:, 0:1] = l_scr[:, 0:1] * alpha + jnp.sum(
            p, axis=-1, keepdims=True)
        m_scr[:, 0:1] = m_new

        if quant:
            # fold v's per-(token, head) scales into the probs, then
            # row-quantize the probs so the PV contraction is an int8
            # MXU dot too: relayouting the 128 KB of probs costs far
            # less than converting the 1 MB v block (finding 2)
            p = p * jnp.repeat(vs_ref[0], _GPAD, axis=0)
            pmax = jnp.maximum(jnp.max(p, axis=-1, keepdims=True),
                               1e-20)
            p_i8 = jnp.round(p * (127.0 / pmax)).astype(jnp.int8)
            pv_parts = [
                jax.lax.dot_general(
                    p_i8[h * _GPAD:(h + 1) * _GPAD, :],
                    vb[:, h * d:(h + 1) * d],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(
                    jnp.float32)
                for h in range(hk)]
            pv = jnp.concatenate(pv_parts, axis=0) * (pmax / 127.0)
        else:
            pb = p.astype(q_ref.dtype)
            pv_parts = [
                jax.lax.dot_general(
                    pb[h * _GPAD:(h + 1) * _GPAD, :],
                    vb[:, h * d:(h + 1) * d].astype(pb.dtype),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                for h in range(hk)]
            pv = jnp.concatenate(pv_parts, axis=0)
        acc_scr[:, :] = acc_scr[:, :] * alpha + pv

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
    k_scale: Optional[jax.Array] = None,   # [B, HK, M] f32 (int8 kv)
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
    assert group <= _GPAD, f"GQA group {group} > {_GPAD} unsupported"
    if interpret is None:
        interpret = _interpret_default()
    if block_m is None:
        block_m = _pick_block_m(m)
        assert block_m, f"cache depth {m} not %128; use the XLA path"
    nm = m // block_m
    quant = k_scale is not None
    rows = hk * _GPAD

    lengths = lengths.astype(jnp.int32)
    q_seg = q_seg.astype(jnp.int32)

    # pad the GQA group to a full 8-row sublane tile (finding 3); the
    # pad rows compute junk that the final slice drops
    qp = jnp.zeros((b, hk, _GPAD, d), q.dtype)
    qp = qp.at[:, :, :group, :].set(
        q.reshape(b, hk, group, d)).reshape(b, rows, d)

    if quant:
        # W8A8: row-quantize q once per call (tiny), fold the softmax
        # scale into the per-row dequant factor
        amax = jnp.maximum(
            jnp.max(jnp.abs(qp.astype(jnp.float32)), axis=-1), 1e-20)
        q_in = jnp.round(
            qp.astype(jnp.float32) * (127.0 / amax)[..., None]
        ).astype(jnp.int8)
        qsc = (amax / 127.0) * scale                  # [b, rows]
    else:
        q_in = qp
        qsc = jnp.zeros((b, rows), jnp.float32)

    # flat [M, hk*d] views stream as contiguous, pad-free int8 blocks
    # (finding 2); reshape of a contiguous array is free
    kf = k.reshape(b, m, hk * d)
    vf = v.reshape(b, m, hk * d)

    def clamp(ki, length):
        # trailing dead blocks re-target the last live block; Mosaic
        # skips the DMA when the block index repeats
        last = jnp.maximum(length - 1, 0) // block_m
        return jnp.minimum(ki, last)

    def kv_map(b_, ki, len_ref, qseg_ref):
        return (b_, clamp(ki, len_ref[b_]), 0)

    def seg_map(b_, ki, len_ref, qseg_ref):
        return (b_, 0, clamp(ki, len_ref[b_]))

    def scale_map(b_, ki, len_ref, qseg_ref):
        return (b_, 0, clamp(ki, len_ref[b_]))

    q_spec = pl.BlockSpec((1, rows, d), lambda b_, ki, *_: (b_, 0, 0))
    qsc_spec = pl.BlockSpec((1, 1, rows),
                            lambda b_, ki, *_: (b_, 0, 0))
    kv_spec = pl.BlockSpec((1, block_m, hk * d), kv_map)
    seg_spec = pl.BlockSpec((1, 1, block_m), seg_map)
    o_spec = q_spec

    if quant:
        # scales are stored head-major [B, HK, M] in the cache
        # (models/llama.py KVCache) so their DMA streams lane-major
        # (1, hk, block_m) blocks with no transpose anywhere (a
        # strided (1, block_m, hk) spec variant fails Mosaic lowering
        # on the sublane broadcast — tested)
        sc_spec = pl.BlockSpec((1, hk, block_m), scale_map)
        in_specs = [q_spec, qsc_spec, kv_spec, kv_spec, seg_spec,
                    sc_spec, sc_spec]
        args = (q_in, qsc[:, None, :], kf, vf,
                kv_seg.astype(jnp.int32)[:, None, :],
                k_scale.astype(jnp.float32),
                v_scale.astype(jnp.float32))
    else:
        in_specs = [q_spec, qsc_spec, kv_spec, kv_spec, seg_spec]
        args = (q_in, qsc[:, None, :], kf, vf,
                kv_seg.astype(jnp.int32)[:, None, :])

    def kernel(len_ref, qseg_ref, q_ref, qsc_ref, k_ref, v_ref,
               kseg_ref, *rest):
        if quant:
            ks_ref, vs_ref, o_ref, m_scr, l_scr, acc_scr = rest
        else:
            (o_ref, m_scr, l_scr, acc_scr) = rest
            ks_ref = vs_ref = None
        _kernel(len_ref, qseg_ref, q_ref, qsc_ref, k_ref, v_ref,
                kseg_ref, ks_ref, vs_ref, o_ref, m_scr, l_scr, acc_scr,
                scale=scale, hk=hk, d=d, block_m=block_m,
                num_blocks=nm, quant=quant)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, nm),
        in_specs=in_specs,
        out_specs=[o_spec],
        scratch_shapes=[
            pltpu.VMEM((rows, _LANES), jnp.float32),   # running max
            pltpu.VMEM((rows, _LANES), jnp.float32),   # running sum
            pltpu.VMEM((rows, d), jnp.float32),        # output acc
        ],
    )
    (out,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b, rows, d), q.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * b * hq * m * d),
            bytes_accessed=int(k.size * k.dtype.itemsize * 2
                               + (k_scale.size * 8 if quant else 0)),
            transcendentals=int(b * rows * m),
        ),
        interpret=interpret,
    )(lengths, q_seg, *args)
    return out.reshape(b, hk, _GPAD, d)[:, :, :group, :].reshape(
        b, hq, d)
