"""Zigzag ring flash attention — context parallelism over the ICI ring.

TPU-native replacement for the reference's ``ring_flash_attn`` CUDA/NCCL
dependency (reference: mantis/models/intern_vl_25_8b/
modeling_internlm2.py:67-71 ``zigzag_ring_flash_attn_varlen_func``;
sharding logic :134-208 ``extract_local``; group setup
mantis/train/train_intern_vl_25.py:278-296).

Layout.  With W devices on the ``context`` axis the global sequence is
split into 2W equal chunks; device r holds chunks ``[r, 2W-1-r]``
("zigzag"), which balances causal work.  KV shards rotate around the
ring with ``lax.ppermute`` while Q stays resident.

Schedule.  Let s = (r - t) mod W be the KV source at step t:
  t == 0        -> plain LOCAL causal flash attention (the zigzag local
                   order [lo, hi] makes block-causal == local causal);
  t > 0, s < r  -> q_lo and q_hi both attend kv_lo fully; kv_hi skipped;
  t > 0, s > r  -> q_hi attends kv_lo and kv_hi fully; q_lo skips.
Every step therefore issues exactly two C x C full-attention chunk pairs
(plus the diagonal at t=0) — the zigzag load balance.  Partials merge via
log-sum-exp.

Backward replays the same rotation carrying (dk, dv) buffers alongside
(k, v) so each contribution lands on its owner after a final ppermute;
per-pair gradients use the GLOBAL lse/delta, exactly like blocked flash
attention backward.  The whole ring is one ``jax.custom_vjp``.

Everything here runs INSIDE ``shard_map`` over the context axis; see
``make_context_attention`` for the wrapper.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# NOTE: `mantis_tpu.ops.flash_attention` (the submodule) is shadowed by
# the function re-exported in ops/__init__; import symbols directly.
from mantis_tpu.ops.flash_attention import (
    _bwd_call as _fa_bwd_call,
    _fwd_call as _fa_fwd_call,
    _interpret_default as _fa_interpret_default,
)

NEG_INF = -jnp.inf


# ---------------------------------------------------------------------------
# Zigzag data layout helpers (host/global side)
# ---------------------------------------------------------------------------

def zigzag_chunk_indices(w: int):
    """Global chunk ids per device: device r -> (r, 2w-1-r)."""
    return [(r, 2 * w - 1 - r) for r in range(w)]


def zigzag_reorder(x, w: int, axis: int = 1):
    """Reorder a global-sequence array so that an even split over the
    context axis gives each device its zigzag chunks, i.e.
    [c_0, c_{2w-1}, c_1, c_{2w-2}, ...] (reference extract_local
    semantics, modeling_internlm2.py:134-207)."""
    import numpy as np

    mod = jnp if isinstance(x, jnp.ndarray) else np
    s = x.shape[axis]
    assert s % (2 * w) == 0, (s, w)
    chunks = mod.split(x, 2 * w, axis=axis)
    out = []
    for r in range(w):
        out.append(chunks[r])
        out.append(chunks[2 * w - 1 - r])
    return mod.concatenate(out, axis=axis)


def zigzag_inverse(x, w: int, axis: int = 1):
    """Inverse of zigzag_reorder."""
    import numpy as np

    mod = jnp if isinstance(x, jnp.ndarray) else np
    chunks = mod.split(x, 2 * w, axis=axis)
    out = [None] * (2 * w)
    for r in range(w):
        out[r] = chunks[2 * r]
        out[2 * w - 1 - r] = chunks[2 * r + 1]
    return mod.concatenate(out, axis=axis)


# ---------------------------------------------------------------------------
# lse merge
# ---------------------------------------------------------------------------

def _merge(o1, lse1, o2, lse2):
    """Merge two normalized partials; o: [B,S,H,D] f32, lse: [B,H,S]."""
    m = jnp.maximum(lse1, lse2)
    m_safe = jnp.where(jnp.isneginf(m), 0.0, m)
    w1 = jnp.where(jnp.isneginf(lse1), 0.0, jnp.exp(lse1 - m_safe))
    w2 = jnp.where(jnp.isneginf(lse2), 0.0, jnp.exp(lse2 - m_safe))
    tot = w1 + w2
    tot_safe = jnp.where(tot == 0.0, 1.0, tot)
    wt1 = (w1 / tot_safe).transpose(0, 2, 1)[..., None]  # [B,S,H,1]
    wt2 = (w2 / tot_safe).transpose(0, 2, 1)[..., None]
    o = o1 * wt1 + o2 * wt2
    lse = m + jnp.log(jnp.where(tot == 0.0, 1.0, tot))
    lse = jnp.where(tot == 0.0, NEG_INF, lse)
    return o, lse


def _flash_fwd(q, k, v, qseg, kseg, scale, causal, block):
    """Partial flash fwd returning normalized out (f32) + lse [B,H,S]."""
    qb = q.transpose(0, 2, 1, 3)
    kb = k.transpose(0, 2, 1, 3)
    vb = v.transpose(0, 2, 1, 3)
    out, lse = _fa_fwd_call(
        qb, kb, vb, qseg, kseg, scale=scale, causal=causal,
        has_segments=True, block_q=block, block_k=block,
        interpret=_fa_interpret_default(), save_residuals=True)
    return out.transpose(0, 2, 1, 3).astype(jnp.float32), lse


def _flash_bwd(q, k, v, qseg, kseg, out, lse, do, scale, causal, block):
    """Per-pair backward with global lse (delta derived from do,out)."""
    res = (q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
           v.transpose(0, 2, 1, 3), qseg, kseg,
           out.transpose(0, 2, 1, 3), lse)
    dq, dk, dv = _fa_bwd_call(
        res, do.transpose(0, 2, 1, 3), scale=scale, causal=causal,
        has_segments=True, block_q=block, block_k=block,
        interpret=_fa_interpret_default())
    return (dq.transpose(0, 2, 1, 3), dk.transpose(0, 2, 1, 3),
            dv.transpose(0, 2, 1, 3))


# ---------------------------------------------------------------------------
# Ring forward / backward (local shards; called inside shard_map)
# ---------------------------------------------------------------------------

def _ring_fwd_impl(q, k, v, qseg, kseg, axis_name, scale, block):
    w = jax.lax.axis_size(axis_name)
    r = jax.lax.axis_index(axis_name)
    b, s_loc, h, d = q.shape
    c = s_loc // 2
    # the ring path calls the raw kernel (no public-API padding): a
    # chunk not divisible by the block would silently truncate the
    # grid and leave output rows uninitialized
    assert s_loc % block == 0 and c % block == 0, (
        f"local chunk {s_loc} (half {c}) must be a multiple of the "
        f"kernel block {block}; pad the global sequence to a multiple "
        f"of 2*ring_size*{block}")
    perm = [(i, (i + 1) % w) for i in range(w)]

    q_lo, q_hi = q[:, :c], q[:, c:]
    qseg_lo, qseg_hi = qseg[:, :c], qseg[:, c:]

    # t = 0: local causal (zigzag local order is block-causal)
    out0, lse0 = _flash_fwd(q, k, v, qseg, kseg, scale, True, block)
    out, lse = out0, lse0

    def zeros_pair(nq):
        return (jnp.zeros((b, nq, h, d), jnp.float32),
                jnp.full((b, h, nq), NEG_INF))

    def body(t, carry):
        out, lse, k_c, v_c, kseg_c = carry
        k_c = jax.lax.ppermute(k_c, axis_name, perm)
        v_c = jax.lax.ppermute(v_c, axis_name, perm)
        kseg_c = jax.lax.ppermute(kseg_c, axis_name, perm)
        s = (r - t) % w
        k_lo, k_hi = k_c[:, :c], k_c[:, c:]
        v_lo, v_hi = v_c[:, :c], v_c[:, c:]
        kseg_lo, kseg_hi = kseg_c[:, :c], kseg_c[:, c:]

        # q_lo x kv_lo : active iff s < r
        o_ll, l_ll = jax.lax.cond(
            s < r,
            lambda: _flash_fwd(q_lo, k_lo, v_lo, qseg_lo, kseg_lo,
                               scale, False, block),
            lambda: zeros_pair(c))
        # q_hi x kv_lo : always active for t > 0
        o_hl, l_hl = _flash_fwd(q_hi, k_lo, v_lo, qseg_hi, kseg_lo,
                                scale, False, block)
        # q_hi x kv_hi : active iff s > r
        o_hh, l_hh = jax.lax.cond(
            s > r,
            lambda: _flash_fwd(q_hi, k_hi, v_hi, qseg_hi, kseg_hi,
                               scale, False, block),
            lambda: zeros_pair(c))

        o_lo_new, lse_lo_new = _merge(
            out[:, :c], lse[..., :c], o_ll, l_ll)
        o_hi_m, lse_hi_m = _merge(out[:, c:], lse[..., c:], o_hl, l_hl)
        o_hi_new, lse_hi_new = _merge(o_hi_m, lse_hi_m, o_hh, l_hh)
        out = jnp.concatenate([o_lo_new, o_hi_new], axis=1)
        lse = jnp.concatenate([lse_lo_new, lse_hi_new], axis=-1)
        return out, lse, k_c, v_c, kseg_c

    out, lse, *_ = jax.lax.fori_loop(1, w, body, (out, lse, k, v, kseg))
    return out.astype(q.dtype), lse


def _ring_bwd_impl(res, do, axis_name, scale, block):
    q, k, v, qseg, kseg, out, lse = res
    w = jax.lax.axis_size(axis_name)
    r = jax.lax.axis_index(axis_name)
    b, s_loc, h, d = q.shape
    hk = k.shape[2]  # GQA: kv gradients carry the kv head count
    c = s_loc // 2
    perm = [(i, (i + 1) % w) for i in range(w)]
    do = do.astype(q.dtype)
    outc = out.astype(q.dtype)

    q_lo, q_hi = q[:, :c], q[:, c:]
    qseg_lo, qseg_hi = qseg[:, :c], qseg[:, c:]
    do_lo, do_hi = do[:, :c], do[:, c:]
    out_lo, out_hi = outc[:, :c], outc[:, c:]
    lse_lo, lse_hi = lse[..., :c], lse[..., c:]

    # t = 0: local causal
    dq, dk0, dv0 = _flash_bwd(q, k, v, qseg, kseg, outc, lse, do,
                              scale, True, block)
    dq = dq.astype(jnp.float32)

    def zq(nq):
        return jnp.zeros((b, nq, h, d), jnp.float32)

    def zk(nk):
        return jnp.zeros((b, nk, hk, d), jnp.float32)

    def body(t, carry):
        dq, k_c, v_c, kseg_c, dk_c, dv_c = carry
        k_c = jax.lax.ppermute(k_c, axis_name, perm)
        v_c = jax.lax.ppermute(v_c, axis_name, perm)
        kseg_c = jax.lax.ppermute(kseg_c, axis_name, perm)
        dk_c = jax.lax.ppermute(dk_c, axis_name, perm)
        dv_c = jax.lax.ppermute(dv_c, axis_name, perm)
        s = (r - t) % w
        k_lo, k_hi = k_c[:, :c], k_c[:, c:]
        v_lo, v_hi = v_c[:, :c], v_c[:, c:]
        kseg_lo, kseg_hi = kseg_c[:, :c], kseg_c[:, c:]

        dq_ll, dk_ll, dv_ll = jax.lax.cond(
            s < r,
            lambda: _flash_bwd(q_lo, k_lo, v_lo, qseg_lo, kseg_lo,
                               out_lo, lse_lo, do_lo, scale, False,
                               block),
            lambda: (zq(c), zk(c), zk(c)))
        dq_hl, dk_hl, dv_hl = _flash_bwd(
            q_hi, k_lo, v_lo, qseg_hi, kseg_lo, out_hi, lse_hi, do_hi,
            scale, False, block)
        dq_hh, dk_hh, dv_hh = jax.lax.cond(
            s > r,
            lambda: _flash_bwd(q_hi, k_hi, v_hi, qseg_hi, kseg_hi,
                               out_hi, lse_hi, do_hi, scale, False,
                               block),
            lambda: (zq(c), zk(c), zk(c)))

        dq = dq + jnp.concatenate(
            [dq_ll.astype(jnp.float32),
             (dq_hl + dq_hh).astype(jnp.float32)], axis=1)
        dk_add = jnp.concatenate(
            [(dk_ll + dk_hl).astype(jnp.float32),
             dk_hh.astype(jnp.float32)], axis=1)
        dv_add = jnp.concatenate(
            [(dv_ll + dv_hl).astype(jnp.float32),
             dv_hh.astype(jnp.float32)], axis=1)
        return dq, k_c, v_c, kseg_c, dk_c + dk_add, dv_c + dv_add

    dk_init = dk0.astype(jnp.float32)
    dv_init = dv0.astype(jnp.float32)
    dq, _, _, _, dk_c, dv_c = jax.lax.fori_loop(
        1, w, body, (dq, k, v, kseg, dk_init, dv_init))
    # After step t the buffer on device r belongs to (r - (w-1)) mod w's
    # ... one more rotation returns each (dk, dv) buffer to its owner.
    dk = jax.lax.ppermute(dk_c, axis_name, perm)
    dv = jax.lax.ppermute(dv_c, axis_name, perm)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            None, None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def ring_flash_attention(q, k, v, segment_ids, kv_segment_ids,
                         axis_name: str, softmax_scale: float,
                         block: int = 128):
    """Zigzag ring causal self-attention over local shards (BSHD).

    Must be called inside shard_map with the sequence dim sharded over
    ``axis_name`` in zigzag order (see zigzag_reorder).  segment_ids are
    the LOCAL shard's ids.
    """
    out, _ = _ring_fwd_impl(q, k, v, segment_ids, kv_segment_ids,
                            axis_name, softmax_scale, block)
    return out


def _ring_vjp_fwd(q, k, v, segment_ids, kv_segment_ids, axis_name,
                  softmax_scale, block):
    out, lse = _ring_fwd_impl(q, k, v, segment_ids, kv_segment_ids,
                              axis_name, softmax_scale, block)
    return out, (q, k, v, segment_ids, kv_segment_ids, out, lse)


def _ring_vjp_bwd(axis_name, softmax_scale, block, res, g):
    q, k, v, qseg, kseg, out, lse = res
    return _ring_bwd_impl((q, k, v, qseg, kseg, out, lse), g,
                          axis_name, softmax_scale, block)


ring_flash_attention.defvjp(_ring_vjp_fwd, _ring_vjp_bwd)


# ---------------------------------------------------------------------------
# Plain ring (non-zigzag) for cross attention over image kv
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def ring_cross_attention(q, kv_k, kv_v, segment_ids, kv_segment_ids,
                         axis_name: str, softmax_scale: float,
                         block: int = 128):
    """Non-causal ring attention: q stays, full kv rotates (the
    reference's plain ring_flash_attn path for gated cross attention,
    modeling_internlm2.py:1688-1699)."""
    out, _ = _ring_cross_fwd(q, kv_k, kv_v, segment_ids, kv_segment_ids,
                             axis_name, softmax_scale, block)
    return out


def _ring_cross_fwd(q, k, v, qseg, kseg, axis_name, scale, block):
    w = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % w) for i in range(w)]

    out, lse = _flash_fwd(q, k, v, qseg, kseg, scale, False, block)

    def body(t, carry):
        out, lse, k_c, v_c, kseg_c = carry
        k_c = jax.lax.ppermute(k_c, axis_name, perm)
        v_c = jax.lax.ppermute(v_c, axis_name, perm)
        kseg_c = jax.lax.ppermute(kseg_c, axis_name, perm)
        o_i, l_i = _flash_fwd(q, k_c, v_c, qseg, kseg_c, scale, False,
                              block)
        out, lse = _merge(out, lse, o_i, l_i)
        return out, lse, k_c, v_c, kseg_c

    out, lse, *_ = jax.lax.fori_loop(1, w, body, (out, lse, k, v, kseg))
    return out.astype(q.dtype), lse


def _ring_cross_vjp_fwd(q, k, v, qseg, kseg, axis_name, scale, block):
    out, lse = _ring_cross_fwd(q, k, v, qseg, kseg, axis_name, scale,
                               block)
    return out, (q, k, v, qseg, kseg, out, lse)


def _ring_cross_vjp_bwd(axis_name, scale, block, res, g):
    q, k, v, qseg, kseg, out, lse = res
    w = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % w) for i in range(w)]
    do = g.astype(q.dtype)
    outc = out.astype(q.dtype)

    dq0, dk0, dv0 = _flash_bwd(q, k, v, qseg, kseg, outc, lse, do,
                               scale, False, block)

    def body(t, carry):
        dq, k_c, v_c, kseg_c, dk_c, dv_c = carry
        k_c = jax.lax.ppermute(k_c, axis_name, perm)
        v_c = jax.lax.ppermute(v_c, axis_name, perm)
        kseg_c = jax.lax.ppermute(kseg_c, axis_name, perm)
        dk_c = jax.lax.ppermute(dk_c, axis_name, perm)
        dv_c = jax.lax.ppermute(dv_c, axis_name, perm)
        dq_i, dk_i, dv_i = _flash_bwd(q, k_c, v_c, qseg, kseg_c, outc,
                                      lse, do, scale, False, block)
        return (dq + dq_i.astype(jnp.float32), k_c, v_c, kseg_c,
                dk_c + dk_i.astype(jnp.float32),
                dv_c + dv_i.astype(jnp.float32))

    dq, _, _, _, dk_c, dv_c = jax.lax.fori_loop(
        1, w, body,
        (dq0.astype(jnp.float32), k, v, kseg,
         dk0.astype(jnp.float32), dv0.astype(jnp.float32)))
    dk = jax.lax.ppermute(dk_c, axis_name, perm)
    dv = jax.lax.ppermute(dv_c, axis_name, perm)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            None, None)


ring_cross_attention.defvjp(_ring_cross_vjp_fwd, _ring_cross_vjp_bwd)


# ---------------------------------------------------------------------------
# shard_map wrapper
# ---------------------------------------------------------------------------

def make_context_attention(mesh, axis_name: str = "context",
                           batch_axes=None):
    """Returns attention(q, k, v, segment_ids, scale) running ring
    attention over the mesh's context axis via shard_map.  Inputs are
    GLOBAL arrays (sequence already in zigzag order); the batch dim is
    sharded over ``batch_axes`` (defaults to the >1-sized data/fsdp axes,
    matching the trainer's batch sharding)."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    if batch_axes is None:
        batch_axes = tuple(a for a in ("data", "fsdp")
                           if mesh.shape.get(a, 1) > 1)
    b_ax = batch_axes if batch_axes else None
    qkv_spec = P(b_ax, axis_name, None, None)
    seg_spec = P(b_ax, axis_name)

    def attention(q, k, v, segment_ids, scale):
        def local(qq, kk, vv, seg):
            return ring_flash_attention(
                qq, kk, vv, seg, seg, axis_name, scale)

        return shard_map(
            local, mesh=mesh,
            in_specs=(qkv_spec, qkv_spec, qkv_spec, seg_spec),
            out_specs=qkv_spec,
            check_vma=False,
        )(q, k, v, segment_ids)

    return attention


def make_cross_ring_attention(mesh, axis_name: str = "context",
                              batch_axes=None):
    """Returns cross_attention_fn(q, k, v, q_seg, kv_mask, scale) for
    gated cross-attention over ring-sharded image kv (internvl's
    long-context composition: the reference shards the IMAGE-TOKEN kv
    over the ring group and rotates it, train_intern_vl_25.py:278-296 +
    modeling_internlm2.py:1688-1699).  q is sharded on its sequence dim
    (zigzag order is fine — cross attention is non-causal so per-shard
    row order is irrelevant), kv on its media dim; both over
    ``axis_name``.  Matches the ``cross_attention_fn`` hook signature of
    models/intern_vl/model.decoder_forward."""
    import math

    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    if batch_axes is None:
        batch_axes = tuple(a for a in ("data", "fsdp")
                           if mesh.shape.get(a, 1) > 1)
    b_ax = batch_axes if batch_axes else None
    qkv_spec = P(b_ax, axis_name, None, None)
    seg_spec = P(b_ax, axis_name)
    w = mesh.shape[axis_name]

    def cross_attention_fn(q, k, v, q_seg, kv_mask, scale):
        if kv_mask is None:
            kv_mask = jnp.ones(k.shape[:2], jnp.int32)
        # one kernel block must divide BOTH local shard lengths
        block = math.gcd(q.shape[1] // w, math.gcd(k.shape[1] // w, 128))

        def local(qq, kk, vv, qs, km):
            return ring_cross_attention(
                qq, kk, vv, qs, km.astype(jnp.int32), axis_name, scale,
                block)

        return shard_map(
            local, mesh=mesh,
            in_specs=(qkv_spec, qkv_spec, qkv_spec, seg_spec, seg_spec),
            out_specs=qkv_spec,
            check_vma=False,
        )(q, k, v, q_seg, kv_mask)

    return cross_attention_fn
