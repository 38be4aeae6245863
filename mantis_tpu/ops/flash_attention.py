"""Pallas TPU flash attention (forward + backward).

TPU-native replacement for the CUDA ``flash_attn`` dependency the reference
framework relies on everywhere (reference: mantis/train/train_mllava.py:79-82
``attn_implementation="flash_attention_2"``; varlen/packed path
mantis/models/intern_vl_25_8b/modeling_internlm2.py:55-61).  Instead of the
reference's unpad/cu_seqlens machinery, packed sequences are expressed with
**segment ids**: tokens attend to each other iff their segment ids match,
which composes with the causal mask inside the kernel and keeps shapes
static for XLA.

Layout: the public API takes ``[batch, seq, heads, head_dim]`` (BSHD — the
model's natural layout); kernels internally run in BHSD so the block's last
two dims (seq_block, head_dim) satisfy TPU tiling.  Grouped-query attention
is handled
by indexing the kv head as ``q_head // (num_q_heads // num_kv_heads)`` in
the BlockSpec index maps.

The online-softmax forward and the (dq) / (dk, dv) backward kernels follow
the standard flash-attention recurrences with f32 accumulators; matmuls run
on the MXU in the input dtype (bf16 in production) with
``preferred_element_type=float32``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)

_LANES = 128


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Reference implementation (used for tests and as an XLA fallback)
# ---------------------------------------------------------------------------

def mha_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = True,
    segment_ids: Optional[jax.Array] = None,
    kv_segment_ids: Optional[jax.Array] = None,
    softmax_scale: Optional[float] = None,
    window_size: Optional[int] = None,
    causal_offset: int = 0,
) -> jax.Array:
    """O(S^2)-memory attention in plain jnp. BSHD layout, GQA-aware.

    Uses Precision.HIGHEST: on TPU the default matmul precision runs f32
    einsums as bf16 passes, which would make this "reference" *less*
    accurate than the Pallas kernel (observed: 7% grad error at default
    precision vs 2e-5 at highest)."""
    assert kv_segment_ids is None or segment_ids is not None, (
        "kv_segment_ids requires segment_ids (q-side) too")
    b, sq, hq, d = q.shape
    _, sk, hk, _ = k.shape
    scale = softmax_scale if softmax_scale is not None else d ** -0.5
    if hk != hq:
        rep = hq // hk
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) * scale
    mask = jnp.ones((b, 1, sq, sk), dtype=bool)
    if causal:
        qi = jnp.arange(sq)[:, None] + causal_offset
        ki = jnp.arange(sk)[None, :]
        mask = mask & (qi >= ki)[None, None]
        if window_size is not None:
            # Mistral SWA: attend the last window_size keys (incl. self)
            mask = mask & (qi - ki < window_size)[None, None]
    if segment_ids is not None:
        kseg = kv_segment_ids if kv_segment_ids is not None else segment_ids
        mask = mask & (segment_ids[:, None, :, None] == kseg[:, None, None, :])
    logits = jnp.where(mask, logits, DEFAULT_MASK_VALUE)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                      precision=jax.lax.Precision.HIGHEST).astype(q.dtype)


def _xla_fast_attention(q, k, v, scale):
    """bf16 MXU matmuls + f32 softmax, fully fused by XLA.  GQA-aware."""
    b, sq, hq, d = q.shape
    hk = k.shape[2]
    if hk != hq:
        k = jnp.repeat(k, hq // hk, axis=2)
        v = jnp.repeat(v, hq // hk, axis=2)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v).astype(q.dtype)


def _pad_to(x, mult, axis, value=0):
    size = x.shape[axis]
    rem = size % mult
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, mult - rem)
    return jnp.pad(x, pad, constant_values=value)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(
    q_ref, k_ref, v_ref, qseg_ref, kseg_ref,
    o_ref, lse_ref,
    m_scr, l_scr, acc_scr,
    *, scale, causal, has_segments, block_q, block_k, num_k_blocks,
    kv_len=None, window=None, causal_offset=0,
):
    # qseg_ref: [1, block_q, LANES] (lanes replicated);
    # kseg_ref: [1, 8, block_k] (sublanes replicated);
    # lse_ref:  [1, 1, block_q, LANES] or None (inference).
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # A causal block is dead when its lowest q row is above its lowest k col.
    if causal:
        run = (qi + 1) * block_q - 1 + causal_offset >= ki * block_k
        if window is not None:
            # block fully below the window band: highest k col is more
            # than window-1 positions behind the lowest q row
            run = run & (qi * block_q + causal_offset
                         - ((ki + 1) * block_k - 1) < window)
    else:
        run = True

    @pl.when(run)
    def _compute():
        q = q_ref[0, 0, :, :]
        k = k_ref[0, 0, :, :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [block_q, block_k]

        row = col = None
        if causal or kv_len is not None:
            col = ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
        if causal:
            row = qi * block_q + causal_offset + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
        mask = None
        if causal:
            mask = row >= col
            if window is not None:
                mask = mask & (row - col < window)
        if kv_len is not None:
            # static kv padding boundary (cheaper than segment arrays)
            mask = (col < kv_len) if mask is None else (
                mask & (col < kv_len))
        if has_segments:
            seg = qseg_ref[0, :, :1] == kseg_ref[0, :1, :]
            mask = seg if mask is None else (mask & seg)
        if mask is not None:
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

        m_prev = m_scr[:]                     # [block_q, LANES]
        l_prev = l_scr[:]
        m_curr = jnp.max(s, axis=-1)[:, None]  # [block_q, 1]
        m_next = jnp.maximum(m_prev, m_curr)   # lanes all equal
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])         # [block_q, block_k] f32
        l_next = alpha * l_prev + jnp.sum(p, axis=-1)[:, None]
        m_scr[:] = m_next
        l_scr[:] = l_next

        v = v_ref[0, 0, :, :]
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[:] = acc_scr[:] * alpha[:, :1] + pv

    @pl.when(ki == num_k_blocks - 1)
    def _finalize():
        l = l_scr[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0, :, :] = (acc_scr[:] / l_safe).astype(o_ref.dtype)
        if lse_ref is not None:
            lse = m_scr[:] + jnp.log(
                jnp.where(l_scr[:] == 0.0, 1.0, l_scr[:]))
            lse_ref[0, 0, :, :] = lse


def _fwd_kernel_single_h2(
    q_ref, k_ref, v_ref, o_ref,
    *, scale, block_q, block_k, kv_len=None,
):
    """TWO heads per grid step, phases interleaved: both QK dots are
    emitted before either softmax, so Mosaic schedules head i+1's MXU
    work under head i's VPU softmax (the units are independent).
    Measured at ViT encode shapes [64, 768, 16, 72]: 3.82 ms/layer vs
    4.07 sequential — the VPU softmax is the single-block kernel's
    bottleneck (docs/PERF.md encode section; block_h=4 measured worse,
    3.93, VMEM pressure).  Inference-only (no lse), non-causal,
    segment-free (kv_len masking only), GQA group 1."""
    mask = None
    if kv_len is not None:
        col = jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        mask = col < kv_len

    def dot_qk(h):
        s = jax.lax.dot_general(
            q_ref[0, h, :, :], k_ref[0, h, :, :],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        return s if mask is None else jnp.where(
            mask, s, DEFAULT_MASK_VALUE)

    def soft(s):
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        return p, jnp.where(l == 0.0, 1.0, l)

    ss = [dot_qk(h) for h in range(2)]          # both dots first
    pls = [soft(s) for s in ss]                 # then both softmaxes
    for h in range(2):
        p, l = pls[h]
        v = v_ref[0, h, :, :]
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, h, :, :] = (pv * (1.0 / l)).astype(o_ref.dtype)


def _fwd_kernel_single(
    q_ref, k_ref, v_ref, qseg_ref, kseg_ref, o_ref, lse_ref,
    *, scale, causal, has_segments, block_q, block_k, kv_len=None,
    window=None, causal_offset=0,
):
    """One (q, k) block per grid step: direct softmax, no scratch, no
    online rescaling.  3-5x faster than the streaming kernel at encoder
    shapes (e.g. [64, 729, 16, 72] ViT) where the whole sequence fits a
    block; segment inputs are elided from the DMA stream entirely when
    unused (they cost ~0.4 MB/step otherwise)."""
    q = q_ref[0, 0, :, :]
    k = k_ref[0, 0, :, :]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    mask = None
    if causal or kv_len is not None:
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    if causal:
        row = causal_offset + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0)
        mask = row >= col
        if window is not None:
            mask = mask & (row - col < window)
    if kv_len is not None:
        mask = (col < kv_len) if mask is None else (mask & (col < kv_len))
    if has_segments:
        seg = qseg_ref[0, :, :1] == kseg_ref[0, :1, :]
        mask = seg if mask is None else (mask & seg)
    if mask is not None:
        s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    v = v_ref[0, 0, :, :]
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    l_safe = jnp.where(l == 0.0, 1.0, l)
    o_ref[0, 0, :, :] = (pv * (1.0 / l_safe)).astype(o_ref.dtype)
    if lse_ref is not None:
        lse_ref[0, 0, :, :] = jnp.broadcast_to(
            m + jnp.log(l_safe), (block_q, _LANES))


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------

def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, qseg_ref, kseg_ref, do_ref, lse_ref, delta_ref,
    dq_ref, dq_scr,
    *, scale, causal, has_segments, block_q, block_k, num_k_blocks,
    kv_len=None, window=None, causal_offset=0,
):
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    if causal:
        run = (qi + 1) * block_q - 1 + causal_offset >= ki * block_k
        if window is not None:
            # block fully below the window band: highest k col is more
            # than window-1 positions behind the lowest q row
            run = run & (qi * block_q + causal_offset
                         - ((ki + 1) * block_k - 1) < window)
    else:
        run = True

    @pl.when(run)
    def _compute():
        q = q_ref[0, 0, :, :]
        k = k_ref[0, 0, :, :]
        v = v_ref[0, 0, :, :]
        do = do_ref[0, 0, :, :]
        lse = lse_ref[0, 0, :, :1]            # [block_q, 1]
        delta = delta_ref[0, 0, :, :1]        # [block_q, 1]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        p = jnp.exp(s - lse)
        if causal or has_segments or kv_len is not None:
            mask = None
            if causal or kv_len is not None:
                col = ki * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 1
                )
            if causal:
                row = (qi * block_q + causal_offset
                       + jax.lax.broadcasted_iota(
                           jnp.int32, (block_q, block_k), 0))
                mask = row >= col
                if window is not None:
                    mask = mask & (row - col < window)
            if kv_len is not None:
                mask = (col < kv_len) if mask is None else (
                    mask & (col < kv_len))
            if has_segments:
                seg = qseg_ref[0, :, :1] == kseg_ref[0, :1, :]
                mask = seg if mask is None else (mask & seg)
            p = jnp.where(mask, p, 0.0)

        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta) * scale
        dq_scr[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ki == num_k_blocks - 1)
    def _finalize():
        dq_ref[0, 0, :, :] = dq_scr[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, qseg_ref, kseg_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref, dk_scr, dv_scr,
    *, scale, causal, has_segments, block_q, block_k, num_q_blocks,
    kv_len=None, window=None, causal_offset=0,
):
    ki = pl.program_id(2)
    qi = pl.program_id(3)

    @pl.when(qi == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    if causal:
        run = (qi + 1) * block_q - 1 + causal_offset >= ki * block_k
        if window is not None:
            # block fully below the window band: highest k col is more
            # than window-1 positions behind the lowest q row
            run = run & (qi * block_q + causal_offset
                         - ((ki + 1) * block_k - 1) < window)
    else:
        run = True

    @pl.when(run)
    def _compute():
        q = q_ref[0, 0, :, :]
        k = k_ref[0, 0, :, :]
        v = v_ref[0, 0, :, :]
        do = do_ref[0, 0, :, :]
        lse = lse_ref[0, 0, :, :1]
        delta = delta_ref[0, 0, :, :1]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        p = jnp.exp(s - lse)
        if causal or has_segments or kv_len is not None:
            mask = None
            if causal or kv_len is not None:
                col = ki * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 1
                )
            if causal:
                row = (qi * block_q + causal_offset
                       + jax.lax.broadcasted_iota(
                           jnp.int32, (block_q, block_k), 0))
                mask = row >= col
                if window is not None:
                    mask = mask & (row - col < window)
            if kv_len is not None:
                mask = (col < kv_len) if mask is None else (
                    mask & (col < kv_len))
            if has_segments:
                seg = qseg_ref[0, :, :1] == kseg_ref[0, :1, :]
                mask = seg if mask is None else (mask & seg)
            p = jnp.where(mask, p, 0.0)

        pt = p.astype(do.dtype)
        dv_scr[:] += jax.lax.dot_general(
            pt, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - delta) * scale).astype(q.dtype)
        dk_scr[:] += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(qi == num_q_blocks - 1)
    def _finalize():
        dk_ref[0, 0, :, :] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0, :, :] = dv_scr[:].astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _broadcast_segs(qseg, kseg, block_q, block_k):
    """Lane/sublane-replicated segment ids satisfying TPU tiling rules."""
    b, sq = qseg.shape
    _, sk = kseg.shape
    qsegb = jnp.broadcast_to(qseg[:, :, None], (b, sq, _LANES))
    ksegb = jnp.broadcast_to(kseg[:, None, :], (b, 8, sk))
    return qsegb, ksegb


def _fwd_call(q, k, v, qseg, kseg, *, scale, causal, has_segments,
              block_q, block_k, interpret, save_residuals, kv_len=None,
              window=None, causal_offset=0):
    # q: [B, Hq, Sq, D]; k, v: [B, Hk, Sk, D]  (BHSD kernel layout)
    b, hq, sq, d = q.shape
    _, hk, sk, _ = k.shape
    group = hq // hk
    nq, nk = sq // block_q, sk // block_k

    grid = (b, hq, nq, nk)
    q_spec = pl.BlockSpec(
        (1, 1, block_q, d), lambda b_, h, qi, ki: (b_, h, qi, 0))
    k_spec = pl.BlockSpec(
        (1, 1, block_k, d), lambda b_, h, qi, ki: (b_, h // group, ki, 0))
    v_spec = k_spec
    qseg_spec = pl.BlockSpec(
        (1, block_q, _LANES), lambda b_, h, qi, ki: (b_, qi, 0))
    kseg_spec = pl.BlockSpec(
        (1, 8, block_k), lambda b_, h, qi, ki: (b_, 0, ki))
    o_spec = q_spec
    lse_spec = pl.BlockSpec(
        (1, 1, block_q, _LANES), lambda b_, h, qi, ki: (b_, h, qi, 0))

    single = nq == 1 and nk == 1
    # head-pair interleaved fast path (see _fwd_kernel_single_h2):
    # inference-only, non-causal, segment-free, MHA (group 1)
    if (single and not causal and not has_segments and group == 1
            and not save_residuals and window is None
            and hq % 2 == 0):
        h2_spec = pl.BlockSpec(
            (1, 2, block_q, d), lambda b_, h: (b_, h, 0, 0))
        hk2_spec = pl.BlockSpec(
            (1, 2, block_k, d), lambda b_, h: (b_, h, 0, 0))
        (out,) = pl.pallas_call(
            functools.partial(
                _fwd_kernel_single_h2, scale=scale, block_q=block_q,
                block_k=block_k, kv_len=kv_len),
            grid=(b, hq // 2),
            in_specs=[h2_spec, hk2_spec, hk2_spec],
            out_specs=[h2_spec],
            out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
            cost_estimate=pl.CostEstimate(
                flops=int(4 * b * hq * sq * sk * d),
                bytes_accessed=int(
                    (q.size + k.size + v.size + q.size)
                    * q.dtype.itemsize),
                transcendentals=int(b * hq * sq * sk),
            ),
            interpret=interpret,
        )(q, k, v)
        return out, None

    seg_args, seg_specs = (), ()
    if has_segments:
        qsegb, ksegb = _broadcast_segs(qseg, kseg, block_q, block_k)
        seg_args = (qsegb, ksegb)
        seg_specs = (qseg_spec, kseg_spec)

    if single:
        base = functools.partial(
            _fwd_kernel_single, scale=scale, causal=causal,
            has_segments=has_segments, block_q=block_q, block_k=block_k,
            kv_len=kv_len, window=window, causal_offset=causal_offset,
        )
        scratch = []
    else:
        base = functools.partial(
            _fwd_kernel, scale=scale, causal=causal,
            has_segments=has_segments, block_q=block_q, block_k=block_k,
            num_k_blocks=nk, kv_len=kv_len, window=window,
            causal_offset=causal_offset,
        )
        scratch = [
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ]

    def kernel(q_ref, k_ref, v_ref, *rest):
        if has_segments:
            qseg_ref, kseg_ref, *outs = rest
        else:
            qseg_ref = kseg_ref = None
            outs = list(rest)
        if save_residuals:
            o_ref, lse_ref, *scr = outs
        else:
            o_ref, *scr = outs
            lse_ref = None
        if single:
            base(q_ref, k_ref, v_ref, qseg_ref, kseg_ref, o_ref, lse_ref)
        else:
            base(q_ref, k_ref, v_ref, qseg_ref, kseg_ref, o_ref, lse_ref,
                 *scr)

    if save_residuals:
        out_specs = [o_spec, lse_spec]
        out_shape = [
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((b, hq, sq, _LANES), jnp.float32),
        ]
    else:
        out_specs = [o_spec]
        out_shape = [jax.ShapeDtypeStruct(q.shape, q.dtype)]
    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[q_spec, k_spec, v_spec, *seg_specs],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * b * hq * sq * sk * d * (0.5 if causal else 1.0)),
            bytes_accessed=int(
                (q.size + k.size + v.size + q.size) * q.dtype.itemsize
            ),
            transcendentals=int(b * hq * sq * sk),
        ),
        interpret=interpret,
    )(q, k, v, *seg_args)
    if save_residuals:
        out, lse = res
        return out, lse[..., 0]
    return res[0], None


def _bwd_call(res, g, *, scale, causal, has_segments, block_q, block_k,
              interpret, kv_len=None, window=None, causal_offset=0):
    q, k, v, qseg, kseg, out, lse = res
    b, hq, sq, d = q.shape
    _, hk, sk, _ = k.shape
    group = hq // hk
    nq, nk = sq // block_q, sk // block_k
    do = g

    # delta_i = rowsum(dO_i * O_i) — cheap elementwise, leave to XLA.
    delta3 = jnp.einsum(
        "bhqd,bhqd->bhq", do.astype(jnp.float32), out.astype(jnp.float32)
    )
    delta = jnp.broadcast_to(delta3[..., None], (*delta3.shape, _LANES))
    lse4 = jnp.broadcast_to(lse[..., None], (*lse.shape, _LANES))
    seg_args, dq_seg_specs, dkv_seg_specs = (), (), ()
    if has_segments:
        qsegb, ksegb = _broadcast_segs(qseg, kseg, block_q, block_k)
        seg_args = (qsegb, ksegb)

    q_spec = pl.BlockSpec(
        (1, 1, block_q, d), lambda b_, h, qi, ki: (b_, h, qi, 0))
    k_spec = pl.BlockSpec(
        (1, 1, block_k, d), lambda b_, h, qi, ki: (b_, h // group, ki, 0))
    qseg_spec = pl.BlockSpec(
        (1, block_q, _LANES), lambda b_, h, qi, ki: (b_, qi, 0))
    kseg_spec = pl.BlockSpec(
        (1, 8, block_k), lambda b_, h, qi, ki: (b_, 0, ki))
    lse_spec = pl.BlockSpec(
        (1, 1, block_q, _LANES), lambda b_, h, qi, ki: (b_, h, qi, 0))

    dq_base = functools.partial(
        _bwd_dq_kernel, scale=scale, causal=causal,
        has_segments=has_segments, block_q=block_q, block_k=block_k,
        num_k_blocks=nk, kv_len=kv_len, window=window,
        causal_offset=causal_offset,
    )

    def dq_kernel(q_ref, k_ref, v_ref, *rest):
        if has_segments:
            qs, ks_, do_ref, lse_ref, delta_ref, *scr = rest
        else:
            qs = ks_ = None
            do_ref, lse_ref, delta_ref, *scr = rest
        dq_base(q_ref, k_ref, v_ref, qs, ks_, do_ref, lse_ref,
                delta_ref, *scr)

    if has_segments:
        dq_seg_specs = (qseg_spec, kseg_spec)
    dq = pl.pallas_call(
        dq_kernel,
        grid=(b, hq, nq, nk),
        in_specs=[q_spec, k_spec, k_spec, *dq_seg_specs, q_spec,
                  lse_spec, lse_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, *seg_args, do, lse4, delta)

    # dk/dv: grid over kv blocks; inner loop over q blocks.  Output has kv
    # head count == q head count; GQA summing over the group is done in XLA
    # afterwards (cheap reshape-sum).
    kq_spec = pl.BlockSpec(
        (1, 1, block_q, d), lambda b_, h, ki, qi: (b_, h, qi, 0))
    kk_spec = pl.BlockSpec(
        (1, 1, block_k, d), lambda b_, h, ki, qi: (b_, h // group, ki, 0))
    dk_spec = pl.BlockSpec(
        (1, 1, block_k, d), lambda b_, h, ki, qi: (b_, h, ki, 0))
    kqseg_spec = pl.BlockSpec(
        (1, block_q, _LANES), lambda b_, h, ki, qi: (b_, qi, 0))
    kkseg_spec = pl.BlockSpec(
        (1, 8, block_k), lambda b_, h, ki, qi: (b_, 0, ki))
    klse_spec = pl.BlockSpec(
        (1, 1, block_q, _LANES), lambda b_, h, ki, qi: (b_, h, qi, 0))

    dkv_base = functools.partial(
        _bwd_dkv_kernel, scale=scale, causal=causal,
        has_segments=has_segments, block_q=block_q, block_k=block_k,
        num_q_blocks=nq, kv_len=kv_len, window=window,
        causal_offset=causal_offset,
    )

    def dkv_kernel(q_ref, k_ref, v_ref, *rest):
        if has_segments:
            qs, ks_, do_ref, lse_ref, delta_ref, *outs = rest
        else:
            qs = ks_ = None
            do_ref, lse_ref, delta_ref, *outs = rest
        dkv_base(q_ref, k_ref, v_ref, qs, ks_, do_ref, lse_ref,
                 delta_ref, *outs)

    if has_segments:
        dkv_seg_specs = (kqseg_spec, kkseg_spec)
    dk_full, dv_full = pl.pallas_call(
        dkv_kernel,
        grid=(b, hq, nk, nq),
        in_specs=[kq_spec, kk_spec, kk_spec, *dkv_seg_specs,
                  kq_spec, klse_spec, klse_spec],
        out_specs=[dk_spec, dk_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, sk, d), q.dtype),
            jax.ShapeDtypeStruct((b, hq, sk, d), q.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, *seg_args, do, lse4, delta)

    if group > 1:
        dk = dk_full.reshape(b, hk, group, sk, d).sum(axis=2)
        dv = dv_full.reshape(b, hk, group, sk, d).sum(axis=2)
        dk = dk.astype(k.dtype)
        dv = dv.astype(v.dtype)
    else:
        dk, dv = dk_full, dv_full
    return dq, dk, dv


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11, 12, 13)
)
def _flash_attention_core(q, k, v, qseg, kseg, scale, causal, has_segments,
                          block_q, block_k, interpret, kv_len, window,
                          causal_offset=0):
    out, _ = _fwd_call(
        q, k, v, qseg, kseg, scale=scale, causal=causal,
        has_segments=has_segments, block_q=block_q, block_k=block_k,
        interpret=interpret, save_residuals=False, kv_len=kv_len,
        window=window, causal_offset=causal_offset,
    )
    return out


def _core_fwd(q, k, v, qseg, kseg, scale, causal, has_segments,
              block_q, block_k, interpret, kv_len, window,
              causal_offset=0):
    # residual-saving forward holds lse blocks too: clamp like the
    # backward (1024x1024 spills VMEM in this mode; inference-only
    # forward keeps the big blocks)
    bq = 512 if block_q % 512 == 0 else block_q
    bk = 1024 if block_k % 1024 == 0 else block_k
    out, lse = _fwd_call(
        q, k, v, qseg, kseg, scale=scale, causal=causal,
        has_segments=has_segments, block_q=bq, block_k=bk,
        interpret=interpret, save_residuals=True, kv_len=kv_len,
        window=window, causal_offset=causal_offset,
    )
    return out, (q, k, v, qseg, kseg, out, lse)


def _core_bwd(scale, causal, has_segments, block_q, block_k, interpret,
              kv_len, window, causal_offset, res, g):
    # The backward kernels hold s/p/dp/ds blocks simultaneously:
    # smaller blocks avoid VMEM spills.  Clamp whenever the smaller
    # block divides the padded dims.
    bq = 512 if block_q % 512 == 0 else block_q
    bk = 1024 if block_k % 1024 == 0 else block_k
    dq, dk, dv = _bwd_call(
        res, g, scale=scale, causal=causal, has_segments=has_segments,
        block_q=bq, block_k=bk, interpret=interpret,
        kv_len=kv_len, window=window, causal_offset=causal_offset,
    )
    return dq, dk, dv, None, None


_flash_attention_core.defvjp(_core_fwd, _core_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = True,
    segment_ids: Optional[jax.Array] = None,
    kv_segment_ids: Optional[jax.Array] = None,
    softmax_scale: Optional[float] = None,
    window_size: Optional[int] = None,
    kv_valid_len: Optional[int] = None,
    causal_offset: int = 0,
    # 1024x1024 is ~13% faster than 512x1024 on inference forward
    # (repeated A/B at causal [4,8192,16,128]: 15.2 vs 17.4 ms); the
    # residual-saving forward and the backward clamp themselves back to
    # 512x1024 (bigger blocks spill VMEM there).  2048 blocks fail to
    # compile.  Short sequences still collapse to a single block.
    block_q: int = 1024,
    block_k: int = 1024,
    implementation: Optional[str] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Flash attention over BSHD tensors.

    Args:
      q: [batch, q_seq, num_q_heads, head_dim].
      k, v: [batch, kv_seq, num_kv_heads, head_dim]; num_q_heads must be a
        multiple of num_kv_heads (GQA).
      causal: apply a causal mask (diagonal aligned at position 0; prefill).
      segment_ids: optional int32 [batch, q_seq] packing ids; tokens attend
        only within matching segments.  Use distinct ids per packed
        conversation; padding should use an id not shared with real content.
      kv_segment_ids: ids for k/v when kv_seq != q_seq (defaults to
        segment_ids).
      softmax_scale: defaults to head_dim ** -0.5.
      causal_offset: shift of the causal diagonal — query row i may
        attend keys <= i + causal_offset.  Used when q is a suffix of
        the kv sequence (shared-cross-attention text queries over an
        image-prefixed kv, reference modeling_internlm2.py:1828-1864).
      kv_valid_len: static count of valid kv positions when the caller
        already padded the sequence; keys beyond it are masked (cheaper
        than segment ids for pure right-padding).
      window_size: sliding-window attention (Mistral SWA, reference:
        mantis/models/idefics2/modeling_idefics2.py:1498 passes
        attn_implementation to the Mistral text model): query i attends
        keys [i-window_size+1, i].  Requires causal=True.
      implementation: 'pallas' (default on TPU), or 'xla' for the reference
        O(S^2) path.

    Returns [batch, q_seq, num_q_heads, head_dim] in q.dtype.
    """
    if window_size is not None:
        assert causal, "sliding window requires causal attention"
    # 'xla_fast' materializes the probs tensor (bf16 matmuls, f32
    # softmax).  Measured SLOWER than the Pallas single-block kernel at
    # encode shapes (8.5 vs 4.6 ms/layer at [64,729,16,72] on v5e, see
    # scripts/profile_attn2.py) — kept only as an explicit option.
    if implementation == "xla_fast":
        # valid ONLY for plain non-causal unsegmented attention (the
        # encoder shape it was measured on) — anything else would
        # silently attend future tokens / other conversations
        assert not causal and segment_ids is None \
            and kv_segment_ids is None and window_size is None \
            and kv_valid_len is None and causal_offset == 0, (
            "xla_fast supports only plain non-causal unsegmented "
            "attention")
        scale_ = (softmax_scale if softmax_scale is not None
                  else q.shape[-1] ** -0.5)
        return _xla_fast_attention(q, k, v, scale_)
    if implementation == "xla":
        # the fallback must honor EVERY mask the Pallas path honors;
        # kv_valid_len (static pre-pad mask) is emulated with segments
        seg_q, seg_k = segment_ids, kv_segment_ids
        if kv_valid_len is not None and kv_valid_len < k.shape[1]:
            bq = k.shape[0]
            base_k = (seg_k if seg_k is not None
                      else (seg_q if seg_q is not None
                            else jnp.ones((bq, k.shape[1]), jnp.int32)))
            valid = jnp.arange(k.shape[1])[None, :] < kv_valid_len
            seg_k = jnp.where(
                valid, jnp.broadcast_to(base_k, (bq, k.shape[1])), -1)
            if seg_q is None:
                seg_q = jnp.ones((bq, q.shape[1]), jnp.int32)
        return mha_reference(
            q, k, v, causal=causal, segment_ids=seg_q,
            kv_segment_ids=seg_k, softmax_scale=softmax_scale,
            window_size=window_size, causal_offset=causal_offset,
        )
    if interpret is None:
        interpret = _interpret_default()

    b, sq, hq, d = q.shape
    _, sk, hk, _ = k.shape
    assert hq % hk == 0, f"GQA requires hq % hk == 0, got {hq}, {hk}"
    scale = softmax_scale if softmax_scale is not None else d ** -0.5

    # Adaptive blocks: big blocks amortize grid-step overhead.  Short
    # sequences (<=1024 rounded) run as a single block, which also
    # minimizes padding (e.g. ViT's 729 -> one 768 block, not 2x512).
    sq128 = ((sq + 127) // 128) * 128
    sk128 = ((sk + 127) // 128) * 128
    block_q = sq128 if sq128 <= 1024 else min(block_q, sq128)
    block_k = sk128 if sk128 <= 1024 else min(block_k, sk128)

    assert kv_segment_ids is None or segment_ids is not None, (
        "kv_segment_ids requires segment_ids (q-side) too")
    kseg_in = kv_segment_ids if kv_segment_ids is not None else segment_ids
    has_segments = segment_ids is not None
    pad_q = (-sq) % block_q
    pad_k = (-sk) % block_k
    # KV padding must be masked; a static boundary is cheaper than
    # synthesizing segment-id arrays.  Q padding needs no mask (pad rows
    # are sliced off and their cotangents are zero).
    kv_len = sk if pad_k and not has_segments else None
    if kv_valid_len is not None and not has_segments \
            and kv_valid_len < sk + pad_k:
        # caller pre-padded the sequence (e.g. the ViT pads once for the
        # whole stack instead of per layer): mask keys >= kv_valid_len
        kv_len = (kv_valid_len if kv_len is None
                  else min(kv_len, kv_valid_len))

    if has_segments:
        qseg = _pad_to(segment_ids.astype(jnp.int32), block_q, 1, value=-1)
        kseg = _pad_to(kseg_in.astype(jnp.int32), block_k, 1, value=-2)
    else:
        qseg = jnp.zeros((b, sq + pad_q), jnp.int32)
        kseg = jnp.zeros((b, sk + pad_k), jnp.int32)

    qp = _pad_to(q, block_q, 1).transpose(0, 2, 1, 3)
    kp = _pad_to(k, block_k, 1).transpose(0, 2, 1, 3)
    vp = _pad_to(v, block_k, 1).transpose(0, 2, 1, 3)

    window = window_size if (
        window_size is not None and window_size < sk) else None
    out = _flash_attention_core(
        qp, kp, vp, qseg, kseg, scale, causal, has_segments,
        block_q, block_k, interpret, kv_len, window, causal_offset,
    )
    out = out.transpose(0, 2, 1, 3)
    if pad_q:
        out = out[:, :sq]
    return out
