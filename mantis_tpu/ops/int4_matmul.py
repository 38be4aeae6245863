"""Pallas int4 weight-only matvec — KEPT UNWIRED (negative result).

Decode is HBM-bound, so halving weight bytes looked like a ~1.7x win.
This kernel streams only the packed bytes through VMEM and unpacks
in-register (arithmetic right shift + multiply + compare-select; Mosaic
cannot legalize arith.shli), then MXU dots against the activation's
even/odd columns (the pack interleaves group elements, ops/quant.py).

Measured on the full-depth 8B decode (v5e): **36.8 tok/s** vs 45.6 for
the XLA two-dot shift formulation in ops/quant.py and **57.7 for int8**
— the VPU nibble unpack at full weight volume (~4 int32 vector ops per
weight, ~8.5G weights/token) costs more than the halved HBM reads save.
XLA-native jnp.int4 was also measured: the bitcast+reshape view
materializes at 17x the packed bytes, and int4 jit arguments crash
JAX's layout handling outright.  int8 remains the serving config; this
file is kept as the tested record of the attempt (docs/PERF.md).

Layout contract (ops/quant.py quantize(bits=4)):
    q     [G, gs/2, dout] int8 — low nibble = even k within the group,
                                  high nibble = odd k (sign extended by
                                  arithmetic shifts)
    scale [G, 1, dout] f32
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xe_ref, xo_ref, q_ref, s_ref, o_ref, acc_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    qb = q_ref[...].astype(jnp.int32)     # [GB, gs2, N]
    # Mosaic cannot legalize arith.shli; right arithmetic shift + a
    # multiply + compare-select reconstruct both nibbles
    high = jax.lax.shift_right_arithmetic(qb, 4)
    low_u = qb - high * 16                # 0..15
    low = low_u - jnp.where(low_u >= 8, 16, 0)
    s = s_ref[...].astype(jnp.bfloat16)   # [GB, 1, N]
    # match the serving dequantize convention (int4 values exact in
    # bf16; only the scale multiply rounds)
    gb, gs2, n = qb.shape
    wl = (low.astype(jnp.bfloat16) * s).reshape(gb * gs2, n)
    wh = (high.astype(jnp.bfloat16) * s).reshape(gb * gs2, n)
    acc_ref[...] += (
        jnp.dot(xe_ref[...], wl, preferred_element_type=jnp.float32)
        + jnp.dot(xo_ref[...], wh, preferred_element_type=jnp.float32))

    @pl.when(k == pl.num_programs(1) - 1)
    def _emit():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


from mantis_tpu.ops.flash_attention import (  # noqa: E402
    _interpret_default,
)


@functools.partial(jax.jit, static_argnames=("interpret",))
def int4_matvec(x: jax.Array, q: jax.Array, scale: jax.Array,
                *, interpret: bool = None) -> jax.Array:
    """x [B, din] @ unpack(q)*scale -> [B, dout].

    B small (decode rows); din = G * 2 * gs2.  Grid tiles dout and
    streams GB groups per step; the packed q block is the only
    weight-sized HBM traffic.
    """
    if interpret is None:
        interpret = _interpret_default()
    b, din = x.shape
    g, gs2, dout = q.shape
    gs = 2 * gs2
    assert din == g * gs, (x.shape, q.shape)

    xg = x.reshape(b, g, gs)
    xe = xg[:, :, 0::2].reshape(b, g * gs2).astype(jnp.bfloat16)
    xo = xg[:, :, 1::2].reshape(b, g * gs2).astype(jnp.bfloat16)

    n_tile = 512 if dout % 512 == 0 else 256
    assert dout % n_tile == 0, dout
    gb = 8
    while g % gb:
        gb //= 2
    grid = (dout // n_tile, g // gb)

    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, gb * gs2), lambda j, k: (0, k)),
            pl.BlockSpec((b, gb * gs2), lambda j, k: (0, k)),
            pl.BlockSpec((gb, gs2, n_tile), lambda j, k: (k, 0, j)),
            pl.BlockSpec((gb, 1, n_tile), lambda j, k: (k, 0, j)),
        ],
        out_specs=pl.BlockSpec((b, n_tile), lambda j, k: (0, j)),
        out_shape=jax.ShapeDtypeStruct((b, dout), x.dtype),
        scratch_shapes=[pltpu.VMEM((b, n_tile), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(xe, xo, q, scale)
