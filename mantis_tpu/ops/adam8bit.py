"""Blockwise-int8 optimizer moments (8-bit Adam).

TPU-native equivalent of bitsandbytes' ``AdamW8bit`` (the reference
trains with DeepSpeed AdamW and reaches for bitsandbytes for its
memory-wall cases; SURVEY §2.4 maps bitsandbytes -> ops/quant.py for
weights — this module extends the mapping to optimizer state):

  - each moment tensor is stored flattened as int8 with one f32 absmax
    scale per ``block`` elements (blockwise linear quantization, the
    stable variant of Dettmers et al. 2021's 8-bit Adam);
  - the int8 payload is BITCAST-PACKED into a float32 array (4 int8s
    per f32).  This is not cosmetic: the packed moments ride through
    ``jax.custom_vjp`` cotangents in the optimizer-in-backward train
    step (train/trainer.py make_adamw_in_backward), and JAX assigns
    integer primals the float0 tangent space — an int8 arg could not
    carry its updated value out of the backward rule.  A float32
    container has a float32 cotangent, so the updated packed moments
    flow out as the "gradient" of the packed input.

Why it exists: one 16 GB v5e cannot hold flagship-depth params +
grads + fp32 (or even bf16) Adam moments, and host-offloaded moments
cost ~2 s/step of PCIe (measured ~11 GB/s — docs/PERF.md).  int8
moments keep the ENTIRE optimizer state in HBM at 1 byte/param
(+1/512 for scales), which is what makes the directly-measured
fwd+bwd+update single-program step fit at depth 8
(scripts/bench_mfu_honest.py full8_inbackward).

Layout contract (all shapes static, nb = n rounded up to ``block``):
  quantize_blockwise(x: f32/bf16 [n]) -> (packed f32 [nb/4],
                                          scale f32 [nb/block])
  dequantize_blockwise(packed, scale, n) -> f32 [n]
The tail is zero-padded in the quantized domain; zero blocks quantize
to scale 1.0 so a fresh (all-zero) moment is exact.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

BLOCK = 2048
# fused-kernel rows per grid step: divisible by 8 (Mosaic block-shape
# constraint); 128 rows measured 17.4M scoped VMEM inside a train step
# (16M limit), 64 is within budget and within noise of 128 on
# throughput.  The grid may overrun the array (partial edge block —
# Mosaic masks the writes), so containers stay at single-BLOCK
# granularity and the jumbo embed/lm_head leaves need NO padding
# copies (a 1 GB pad per leaf showed up as +3 GB of HLO temps).
_MAX_ROWS = 64


def _ceil_to(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def _alloc_elems(n: int, block: int = BLOCK) -> int:
    """Container length in ELEMENTS for an n-element tensor."""
    return _ceil_to(n, block)


def quantize_blockwise(x: jax.Array, block: int = BLOCK,
                       power: int = 1) -> Tuple[jax.Array, jax.Array]:
    """Flat tensor -> (f32-packed int8 payload, per-block f32 scales).

    ``power`` quantizes in the signed power-th-root domain
    (sign(x)*|x|^(1/power) linearly quantized, dequant raises back):
    a TPU-cheap stand-in for bitsandbytes' dynamic codebooks.  Linear
    int8 (power=1) zero-collapses any value <1/127 of its block's
    absmax — fatal for Adam's second moment, where collapsed v makes
    1/(sqrt(v)+eps) explode (observed: diverging loss within 5 steps).
    power=3 (mu) / power=4 (nu) compress the representable dynamic
    range 3-4x in log scale, so values within ~1e6x of the block max
    keep >=1 level of resolution.  A 256-entry codebook lookup would
    cost O(256) VPU ops/element (~0.2 s/step at flagship size); roots
    are 2-3 elementwise ops.

    Padding to the block boundary happens before the absmax (zeros, so
    padded tails cannot perturb any block's scale).
    """
    assert x.ndim == 1, x.shape
    n = x.shape[0]
    nb = _alloc_elems(n, block)  # block is a multiple of 4
    xf = jnp.pad(x.astype(jnp.float32), (0, nb - n))
    xf = _to_root(xf, power).reshape(-1, block)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int32)
    return _pack_int8_blocks(q), scale.reshape(-1)


def dequantize_blockwise(packed: jax.Array, scale: jax.Array, n: int,
                         block: int = BLOCK, power: int = 1,
                         dtype=jnp.float32) -> jax.Array:
    """Inverse of quantize_blockwise -> flat [n] tensor."""
    q = _unpack_int8_blocks(packed, block)
    y = (q.astype(jnp.float32) * scale[:, None]).reshape(-1)[:n]
    return _from_root(y, power).astype(dtype)


def _pack_int8_blocks(q: jax.Array) -> jax.Array:
    """int32 values in [-127,127], [nblocks, block] -> packed f32
    [nblocks*block/4].

    Four bytes combine into each u32 WORD-WISE WITHIN A BLOCK (word j
    of a block holds elements j, j+block/4, j+block/2, j+3*block/4):
    a plain ``bitcast_convert_type(int8[..., 4], f32)`` keeps a
    [..., 4]-minor u32 intermediate that the TPU pads 4->128 lanes —
    measured 32x memory expansion (a 128 MB chunk repack allocated
    4.00 GB).  The byte shuffle here is all 1-D-friendly u32
    shifts/ors on [nblocks, block/4] tiles, and block-internal
    interleaving keeps any block-aligned SLICE of the packed stream
    self-contained (the in-backward update chunks on block
    boundaries)."""
    b = q.shape[1]
    qq = (q & 0xFF).astype(jnp.uint32).reshape(-1, 4, b // 4)
    c = (qq[:, 0] | (qq[:, 1] << 8) | (qq[:, 2] << 16)
         | (qq[:, 3] << 24))
    return jax.lax.bitcast_convert_type(c, jnp.float32).reshape(-1)


def _unpack_int8_blocks(packed: jax.Array, block: int) -> jax.Array:
    """Inverse of _pack_int8_blocks -> int32 [nblocks, block]."""
    c = jax.lax.bitcast_convert_type(
        packed.reshape(-1, block // 4), jnp.uint32)
    parts = [((c >> (8 * k)) & jnp.uint32(0xFF)).astype(jnp.int32)
             for k in range(4)]
    x = jnp.stack(parts, axis=1)  # [nblocks, 4, block//4]
    x = x - 256 * (x > 127).astype(jnp.int32)  # sign-extend bytes
    return x.reshape(-1, block)


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
# dequant -> AdamW -> requant in ONE HBM pass.  The XLA composition of
# quantize/dequantize above is correct but ~35x off bandwidth: the
# byte extract/combine ops ([:, k] middle-axis slices and stacks) each
# force a physical relayout of the (8,128)-tiled buffers in HBM
# (measured 107 ms per 268M params; the kernel below runs the same
# update at ~10 bytes/param of true traffic).  Inside the kernel every
# shuffle happens in VMEM/registers.


def _fused_kernel(lr_ref, bc1_ref, bc2_ref,
                  p_ref, g_ref, mq_ref, ms_ref, vq_ref, vs_ref,
                  p_out, mq_out, ms_out, vq_out, vs_out,
                  *, b1, b2, eps, wd, pm, pv, block):
    """PLANE-WISE formulation: byte k of packed word j is element
    k*(block/4)+j of the block, so plane k of the moments lines up with
    the contiguous LAST-DIM slice [k*q4:(k+1)*q4] of p/g.  Everything
    is [R, block/4] elementwise + lane-contiguous slicing — no
    stack/reshape interleave (the interleaving variant spent 5x the
    HBM-bound time in cross-lane shuffles)."""
    q4 = block // 4
    c_m = mq_ref[...]                       # u32 [R, block/4]
    c_v = vq_ref[...]
    ms_s = ms_ref[...]                      # f32 [R, 1]
    vs_s = vs_ref[...]
    lr = lr_ref[0, 0]
    bc1 = bc1_ref[0, 0]
    bc2 = bc2_ref[0, 0]

    def byte(c, k):
        bk = ((c >> (8 * k)) & jnp.uint32(0xFF)).astype(jnp.int32)
        return bk - 256 * (bk > 127).astype(jnp.int32)

    m1p, v1p = [], []
    for k in range(4):
        sl = slice(k * q4, (k + 1) * q4)
        g_k = g_ref[:, sl].astype(jnp.float32)
        p_k = p_ref[:, sl].astype(jnp.float32)
        m_k = _from_root(byte(c_m, k).astype(jnp.float32) * ms_s, pm)
        v_k = _from_root(byte(c_v, k).astype(jnp.float32) * vs_s, pv)
        m1 = b1 * m_k + (1.0 - b1) * g_k
        v1 = b2 * v_k + (1.0 - b2) * jnp.square(g_k)
        step = (m1 / bc1) / (jnp.sqrt(v1 / bc2) + eps)
        if wd:
            step = step + wd * p_k
        p_out[:, sl] = (p_k - lr * step).astype(p_out.dtype)
        m1p.append(_to_root(m1, pm))        # root domain for requant
        v1p.append(_to_root(v1, pv))

    def pack(planes, s_out, c_out):
        absmax = jnp.abs(planes[0]).max(axis=-1, keepdims=True)
        for r in planes[1:]:
            absmax = jnp.maximum(
                absmax, jnp.abs(r).max(axis=-1, keepdims=True))
        scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
        c = jnp.zeros_like(c_m)
        for k in range(4):
            q = jnp.clip(jnp.round(planes[k] / scale), -127, 127)
            c = c | ((q.astype(jnp.int32).astype(jnp.uint32)
                      & jnp.uint32(0xFF)) << (8 * k))
        s_out[...] = scale
        c_out[...] = c

    pack(m1p, ms_out, mq_out)
    pack(v1p, vs_out, vq_out)


def fused_adamw_update(p, g, mq, ms, vq, vs, lr, bc1, bc2, *,
                       b1, b2, eps, wd, power_m: int = 3,
                       power_v: int = 4, block: int = BLOCK,
                       interpret=None):
    """One-pass 8-bit AdamW on a FLAT leaf: (p[n], g[n], packed
    moments) -> (p', mq', ms', vq', vs').  n may be any size; the tail
    past the last full ``block`` is padded in-kernel inputs by the
    caller contract being nb-aligned containers (quantize layout), and
    p/g are padded here if needed.  lr/bc1/bc2 are traced scalars
    (bias-corrected denominators), b1/b2/eps/wd static."""
    from jax.experimental import pallas as pl

    n = p.size
    nb = _alloc_elems(n, block)
    nblocks = nb // block
    pf = p.reshape(-1)
    gf = g.reshape(-1)
    if nb != n:
        pf = jnp.pad(pf, (0, nb - n))
        gf = jnp.pad(gf, (0, nb - n))
    pf = pf.reshape(nblocks, block)
    gf = gf.reshape(nblocks, block)
    mqu = jax.lax.bitcast_convert_type(
        mq, jnp.uint32).reshape(nblocks, block // 4)
    vqu = jax.lax.bitcast_convert_type(
        vq, jnp.uint32).reshape(nblocks, block // 4)
    ms2 = ms.reshape(nblocks, 1)
    vs2 = vs.reshape(nblocks, 1)

    # _MAX_ROWS rows per grid step; the grid may overrun nblocks (the
    # edge block is partial — Mosaic masks its writes, and every
    # computation here is row-independent so garbage edge rows cannot
    # contaminate valid ones).  Tiny tensors take a single full-array
    # step (the "block == array dims" escape from the div-by-8 rule).
    r = min(_MAX_ROWS, nblocks)
    grid = ((nblocks + r - 1) // r,)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    row = lambda i: (i, 0)  # noqa: E731
    import functools as _ft

    kern = _ft.partial(_fused_kernel, b1=b1, b2=b2, eps=eps, wd=wd,
                       pm=power_m, pv=power_v, block=block)
    scal = pl.BlockSpec((1, 1), lambda i: (0, 0))
    bp = pl.BlockSpec((r, block), row)
    bq = pl.BlockSpec((r, block // 4), row)
    bs = pl.BlockSpec((r, 1), row)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[scal, scal, scal, bp, bp, bq, bs, bq, bs],
        out_specs=[bp, bq, bs, bq, bs],
        out_shape=[
            jax.ShapeDtypeStruct((nblocks, block), p.dtype),
            jax.ShapeDtypeStruct((nblocks, block // 4), jnp.uint32),
            jax.ShapeDtypeStruct((nblocks, 1), jnp.float32),
            jax.ShapeDtypeStruct((nblocks, block // 4), jnp.uint32),
            jax.ShapeDtypeStruct((nblocks, 1), jnp.float32),
        ],
        interpret=interpret,
        # update IN PLACE: p/moments containers are the train step's
        # donated state — aliasing keeps one live copy per leaf instead
        # of old+new side by side (embed/lm_head are 1 GB each)
        input_output_aliases={3: 0, 5: 1, 6: 2, 7: 3, 8: 4},
    )(jnp.asarray(lr, jnp.float32).reshape(1, 1),
      jnp.asarray(bc1, jnp.float32).reshape(1, 1),
      jnp.asarray(bc2, jnp.float32).reshape(1, 1),
      pf, gf, mqu, ms2, vqu, vs2)
    p1, mq1, ms1, vq1, vs1 = out
    p1 = p1.reshape(-1)[:n].reshape(p.shape)
    return (p1,
            jax.lax.bitcast_convert_type(mq1, jnp.float32).reshape(-1),
            ms1.reshape(-1),
            jax.lax.bitcast_convert_type(vq1, jnp.float32).reshape(-1),
            vs1.reshape(-1))


def zeros_like_quantized(x: jax.Array, block: int = BLOCK
                         ) -> Tuple[jax.Array, jax.Array]:
    """Packed representation of a zero moment for ``x`` WITHOUT
    materializing a dense f32 zero tensor (init path: the whole point
    is never allocating 4 bytes/param)."""
    n = x.size
    packed = jnp.zeros((_alloc_elems(n, block) // 4,), jnp.float32)
    scale = jnp.ones((_alloc_elems(n, block) // block,), jnp.float32)
    return packed, scale
