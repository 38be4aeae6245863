"""Blockwise-int8 optimizer moments (8-bit Adam).

TPU-native equivalent of bitsandbytes' ``AdamW8bit`` (the reference
trains with DeepSpeed AdamW and reaches for bitsandbytes for its
memory-wall cases; SURVEY §2.4 maps bitsandbytes -> ops/quant.py for
weights — this module extends the mapping to optimizer state):

  - each moment tensor is stored as int8 with one f32 absmax scale per
    ``block`` elements (blockwise linear quantization, the stable
    variant of Dettmers et al. 2021's 8-bit Adam);
  - the int8 payload is BITCAST-PACKED into a float32 array (4 int8s
    per f32).  This is not cosmetic: the packed moments ride through
    ``jax.custom_vjp`` cotangents in the optimizer-in-backward train
    step (train/trainer.py), and JAX assigns integer primals the
    float0 tangent space — an int8 arg could not carry its updated
    value out of the backward rule.  A float32 container has a float32
    cotangent, so the updated packed moments flow out as the
    "gradient" of the packed input.

Why it exists: one 16 GB v5e cannot hold flagship-depth params +
grads + fp32 (or even bf16) Adam moments, and host-offloaded moments
cost seconds/step of PCIe through the tunnel.  int8 moments keep the
ENTIRE optimizer state in HBM at 1 byte/param (+1/512 for scales),
which is what makes the directly-measured fwd+bwd+update
single-program step fit at flagship depth
(scripts/bench_mfu_honest.py full8_int8).

Layout contract — ROWWISE, zero-copy (round-4 redesign): a leaf of
shape [..., C] is viewed as [R, C] (collapsing leading dims is
layout-preserving, so the view costs nothing).  Each ROW quantizes
independently in ``nseg = ceil(C/block)`` segments:

  packed: f32 [R, nseg*block/4]   (4 int8 bytes per f32 word; word j
                                   of segment s holds elements
                                   s*block + {0,1,2,3}*block/4 + j)
  scale:  f32 [R, nseg]

The previous flat layout reshaped every leaf to [n/block, block],
which on TPU's (8,128)-tiled memory is a PHYSICAL COPY — the two
vocab-sized leaves alone transiently allocated +4 GB of reshape
temps inside the update (measured; the exact OOM margin of the
single-chip full step).  Rowwise containers line up with the leaf's
native tiling, so p/g/moments enter the fused kernel as-is and
update in place via input_output_aliases.  Partial tail segments are
handled by in-kernel column masking (garbage lanes are zeroed before
the absmax so they can't perturb any scale).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

BLOCK = 2048
# rows per grid step: multiple of 8 (Mosaic block-shape constraint);
# the grid may overrun R (partial edge block — Mosaic masks the
# writes, and every computation is row-independent).
_MAX_ROWS = 64


def _ceil_to(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def _leaf_block(C: int, block: int = BLOCK) -> int:
    """Per-leaf segment length: BLOCK, or the whole (4-aligned) row
    when the row is shorter — avoids 2x container waste on narrow
    leaves like GQA k/v projections (C=1024)."""
    return block if C >= block else _ceil_to(max(C, 4), 4)


def _rowview(x: jax.Array) -> jax.Array:
    """[..., C] -> [R, C]; collapsing leading dims is layout-free."""
    if x.ndim == 0:
        return x.reshape(1, 1)
    if x.ndim == 1:
        return x.reshape(1, -1)
    return x.reshape(-1, x.shape[-1])


def container_shape(shape, block: int = BLOCK
                    ) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    """(packed_shape, scale_shape) for a leaf of ``shape``."""
    if len(shape) == 0:
        R, C = 1, 1
    elif len(shape) == 1:
        R, C = 1, shape[0]
    else:
        R, C = 1, shape[-1]
        for d in shape[:-1]:
            R *= d
    blk = _leaf_block(C, block)
    nseg = -(-C // blk)
    return (R, nseg * blk // 4), (R, nseg)


def quantize_blockwise(x: jax.Array, block: int = BLOCK,
                       power: int = 1) -> Tuple[jax.Array, jax.Array]:
    """Leaf -> (f32-packed int8 payload [R, nseg*blk/4],
    per-row-segment f32 scales [R, nseg]).

    ``power`` quantizes in the signed power-th-root domain
    (sign(x)*|x|^(1/power) linearly quantized, dequant raises back):
    a TPU-cheap stand-in for bitsandbytes' dynamic codebooks.  Linear
    int8 (power=1) zero-collapses any value <1/127 of its block's
    absmax — fatal for Adam's second moment, where collapsed v makes
    1/(sqrt(v)+eps) explode (observed: diverging loss within 5
    steps).  power=3 (mu) / power=4 (nu) compress the representable
    dynamic range 3-4x in log scale, so values within ~1e6x of the
    block max keep >=1 level of resolution.  A 256-entry codebook
    lookup would cost O(256) VPU ops/element; roots are 2-3
    elementwise ops.
    """
    xv = _rowview(x)
    R, C = xv.shape
    blk = _leaf_block(C, block)
    nseg = -(-C // blk)
    q4 = blk // 4
    pad = nseg * blk - C
    xf = jnp.pad(xv.astype(jnp.float32), ((0, 0), (0, pad)))
    xf = _to_root(xf, power).reshape(R, nseg, blk)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int32)
    # plane-major within a segment: word j holds elements
    # {k*q4 + j : k in 0..3}
    qq = (q & 0xFF).astype(jnp.uint32).reshape(R, nseg, 4, q4)
    c = (qq[:, :, 0] | (qq[:, :, 1] << 8) | (qq[:, :, 2] << 16)
         | (qq[:, :, 3] << 24))
    packed = jax.lax.bitcast_convert_type(
        c.reshape(R, nseg * q4), jnp.float32)
    return packed, scale.reshape(R, nseg)


def dequantize_blockwise(packed: jax.Array, scale: jax.Array, shape,
                         block: int = BLOCK, power: int = 1,
                         dtype=jnp.float32) -> jax.Array:
    """Inverse of quantize_blockwise -> tensor of ``shape`` (an int n
    is shorthand for a flat [n] tensor)."""
    if isinstance(shape, int):
        shape = (shape,)
    C = shape[-1] if shape else 1
    blk = _leaf_block(C, block)
    nseg = -(-C // blk)
    q4 = blk // 4
    R = packed.shape[0]
    c = jax.lax.bitcast_convert_type(
        packed.reshape(R, nseg, q4), jnp.uint32)
    parts = [((c >> (8 * k)) & jnp.uint32(0xFF)).astype(jnp.int32)
             for k in range(4)]
    qx = jnp.stack(parts, axis=2)             # [R, nseg, 4, q4]
    qx = qx - 256 * (qx > 127).astype(jnp.int32)
    y = qx.reshape(R, nseg, blk).astype(jnp.float32) * \
        scale.reshape(R, nseg, 1)
    y = y.reshape(R, nseg * blk)[:, :C]
    return _from_root(y, power).astype(dtype).reshape(shape)


def _to_root(x: jax.Array, power: int) -> jax.Array:
    if power == 1:
        return x
    if power == 3:
        # exp(log/3) instead of cbrt: same formula lowers in Mosaic
        # (cbrt has no Pallas TPU lowering), keeping the XLA and
        # fused-kernel quantizations bit-identical.  log(0) -> -inf ->
        # exp -> 0, so zeros round-trip exactly.
        return jnp.sign(x) * jnp.exp(jnp.log(jnp.abs(x)) / 3.0)
    if power == 4:
        return jnp.sign(x) * jnp.sqrt(jnp.sqrt(jnp.abs(x)))
    return jnp.sign(x) * jnp.abs(x) ** (1.0 / power)


def _from_root(y: jax.Array, power: int) -> jax.Array:
    if power == 1:
        return y
    y2 = y * y
    if power == 3:
        return y2 * y
    if power == 4:
        return jnp.sign(y) * y2 * y2  # sign factor: |x|^(1/4) is even
    return jnp.sign(y) * jnp.abs(y) ** power


# ---------------------------------------------------------------------------
# Fused Pallas update kernel
# ---------------------------------------------------------------------------
#
# dequant -> AdamW -> requant in ONE HBM pass over the leaf's NATIVE
# layout.  The XLA composition of quantize/dequantize above is correct
# but ~35x off bandwidth: the byte extract/combine ops each force a
# physical relayout of the (8,128)-tiled buffers in HBM.  Inside the
# kernel every shuffle happens in VMEM/registers, and because the
# containers are rowwise there are no reshape copies on entry/exit —
# p and the moments update strictly in place (input_output_aliases).


def _fused_kernel(lr_ref, bc1_ref, bc2_ref,
                  p_ref, g_ref, mq_ref, ms_ref, vq_ref, vs_ref,
                  p_out, mq_out, ms_out, vq_out, vs_out,
                  *, b1, b2, eps, wd, pm, pv, blk, C):
    """One (row-tile, segment) step.  Plane-wise: byte k of packed
    word j is element k*(blk/4)+j of the segment, so plane k of the
    moments lines up with the contiguous slice [k*q4:(k+1)*q4] of this
    segment's p/g columns.  Columns >= C (partial tail segment — the
    p/g block overruns the array) are zero-masked BEFORE the absmax,
    so garbage lanes cannot perturb any scale; their p-writes are
    masked by Mosaic."""
    from jax.experimental import pallas as pl

    q4 = blk // 4
    seg = pl.program_id(1)
    # containers stay f32 END TO END (an XLA-level f32->u32 bitcast
    # before the call materialized 501 MB copies per vocab leaf — the
    # bitcast output could not alias the donated argument); the
    # reinterpret happens here, on loaded vectors
    c_m = jax.lax.bitcast_convert_type(mq_ref[...], jnp.uint32)
    c_v = jax.lax.bitcast_convert_type(vq_ref[...], jnp.uint32)
    # scales arrive as the row-tile's FULL [r, nseg] block (a [r, 1]
    # block violates Mosaic's last-dim-128 rule, and dynamic lane
    # slicing must be 128-aligned): select/merge this segment's column
    # with iota masks — static-shape VPU ops only
    rr = mq_ref.shape[0]
    nseg = ms_ref.shape[1]
    seg_mask = jax.lax.broadcasted_iota(
        jnp.int32, (rr, nseg), 1) == seg
    ms_s = jnp.sum(jnp.where(seg_mask, ms_ref[...], 0.0), axis=1,
                   keepdims=True)
    vs_s = jnp.sum(jnp.where(seg_mask, vs_ref[...], 0.0), axis=1,
                   keepdims=True)
    lr = lr_ref[0, 0]
    bc1 = bc1_ref[0, 0]
    bc2 = bc2_ref[0, 0]
    r = c_m.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (r, q4), 1)
    base = seg * blk

    def byte(c, k):
        bk = ((c >> (8 * k)) & jnp.uint32(0xFF)).astype(jnp.int32)
        return bk - 256 * (bk > 127).astype(jnp.int32)

    m1p, v1p = [], []
    for k in range(4):
        sl = slice(k * q4, (k + 1) * q4)
        valid = (base + k * q4 + col) < C
        g_k = jnp.where(valid, g_ref[:, sl].astype(jnp.float32), 0.0)
        p_k = jnp.where(valid, p_ref[:, sl].astype(jnp.float32), 0.0)
        m_k = _from_root(byte(c_m, k).astype(jnp.float32) * ms_s, pm)
        v_k = _from_root(byte(c_v, k).astype(jnp.float32) * vs_s, pv)
        m1 = b1 * m_k + (1.0 - b1) * g_k
        v1 = b2 * v_k + (1.0 - b2) * jnp.square(g_k)
        m1 = jnp.where(valid, m1, 0.0)
        v1 = jnp.where(valid, v1, 0.0)
        step = (m1 / bc1) / (jnp.sqrt(v1 / bc2) + eps)
        if wd:
            step = step + wd * p_k
        p_out[:, sl] = (p_k - lr * step).astype(p_out.dtype)
        m1p.append(_to_root(m1, pm))        # root domain for requant
        v1p.append(_to_root(v1, pv))

    def pack(planes, s_out, c_out):
        absmax = jnp.abs(planes[0]).max(axis=-1, keepdims=True)
        for t in planes[1:]:
            absmax = jnp.maximum(
                absmax, jnp.abs(t).max(axis=-1, keepdims=True))
        scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
        c = jnp.zeros_like(c_m)
        for k in range(4):
            q = jnp.clip(jnp.round(planes[k] / scale), -127, 127)
            c = c | ((q.astype(jnp.int32).astype(jnp.uint32)
                      & jnp.uint32(0xFF)) << (8 * k))
        # scale outputs use the same full-width [r, nseg] block for
        # every segment of this row tile (index map pins j=0): the
        # block persists in VMEM across the j sweep (Pallas output
        # revisiting) and each step merges in its own column; every
        # column is written exactly once over the sweep, so the
        # first-visit garbage in other columns never survives
        s_out[...] = jnp.where(
            seg_mask, jnp.broadcast_to(scale, (rr, nseg)), s_out[...])
        c_out[...] = jax.lax.bitcast_convert_type(c, jnp.float32)

    pack(m1p, ms_out, mq_out)
    pack(v1p, vs_out, vq_out)


def fused_adamw_update(p, g, mq, ms, vq, vs, lr, bc1, bc2, *,
                       b1, b2, eps, wd, power_m: int = 3,
                       power_v: int = 4, block: int = BLOCK,
                       interpret=None):
    """One-pass 8-bit AdamW on a leaf of ANY shape: (p, g, rowwise
    packed moments) -> (p', mq', ms', vq', vs') with NO layout copies
    (the [R, C] view and the rowwise containers match the native
    tiling, and all five states alias in place).  lr/bc1/bc2 are
    traced scalars (bias-corrected denominators), b1/b2/eps/wd
    static."""
    from jax.experimental import pallas as pl

    pv2 = _rowview(p)
    gv2 = _rowview(g)
    R, C = pv2.shape
    blk = _leaf_block(C, block)
    nseg = -(-C // blk)
    q4 = blk // 4

    r = min(_MAX_ROWS, R)
    grid = ((R + r - 1) // r, nseg)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    kern = functools.partial(_fused_kernel, b1=b1, b2=b2, eps=eps,
                             wd=wd, pm=power_m, pv=power_v, blk=blk,
                             C=C)
    scal = pl.BlockSpec((1, 1), lambda i, j: (0, 0))
    bp = pl.BlockSpec((r, blk), lambda i, j: (i, j))
    bq = pl.BlockSpec((r, q4), lambda i, j: (i, j))
    bs = pl.BlockSpec((r, nseg), lambda i, j: (i, 0))
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[scal, scal, scal, bp, bp, bq, bs, bq, bs],
        out_specs=[bp, bq, bs, bq, bs],
        out_shape=[
            jax.ShapeDtypeStruct((R, C), p.dtype),
            jax.ShapeDtypeStruct((R, nseg * q4), jnp.float32),
            jax.ShapeDtypeStruct((R, nseg), jnp.float32),
            jax.ShapeDtypeStruct((R, nseg * q4), jnp.float32),
            jax.ShapeDtypeStruct((R, nseg), jnp.float32),
        ],
        interpret=interpret,
        # update IN PLACE: p/moments containers are the train step's
        # donated state — aliasing keeps one live copy per leaf instead
        # of old+new side by side (embed/lm_head are 1 GB each)
        input_output_aliases={3: 0, 5: 1, 6: 2, 7: 3, 8: 4},
    )(jnp.asarray(lr, jnp.float32).reshape(1, 1),
      jnp.asarray(bc1, jnp.float32).reshape(1, 1),
      jnp.asarray(bc2, jnp.float32).reshape(1, 1),
      pv2, gv2, mq, ms, vq, vs)
    p1, mq1, ms1, vq1, vs1 = out
    return p1.reshape(p.shape), mq1, ms1, vq1, vs1


def zeros_like_quantized(x: jax.Array, block: int = BLOCK
                         ) -> Tuple[jax.Array, jax.Array]:
    """Packed representation of a zero moment for ``x`` WITHOUT
    materializing a dense f32 zero tensor (init path: the whole point
    is never allocating 4 bytes/param)."""
    pshape, sshape = container_shape(x.shape, block)
    return (jnp.zeros(pshape, jnp.float32), jnp.ones(sshape,
                                                     jnp.float32))
