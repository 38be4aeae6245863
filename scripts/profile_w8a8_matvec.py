"""W8A8 decode matvecs — TESTED NEGATIVE (round 5).

Hypothesis: the decode weight stream sustains ~650 GB/s (79% of HBM
peak), and the int8->bf16 operand convert of the (32,128)-tiled int8
weights might be the cap (the same relayout family that sank int8 KV
reads).  At batch 1 the activation quantization is trivial ([1, 4096]
per matvec), so feeding the MXU int8 x int8 directly would skip the
weight convert entirely.

Measured end to end (full 32-layer decode, ctx 6016): **79.3 tok/s
W8A8 vs 78.8-79.6 bf16-dequant** — no change.  The weight stream is
not convert-limited; the residual ~20% off peak is DMA/scheduling
bound that neither operand dtype moves.  Weight-only int8 with the
dequant fused into the dot stays the shipped serving path.

Usage: python scripts/profile_w8a8_matvec.py
"""

import sys
sys.path.insert(0, ".")
import numpy as np
import jax, jax.numpy as jnp
from mantis_tpu.ops import quant as Q

def quant_matmul_w8a8(x, qt):
    if qt.bits != 8:
        return _orig(x, qt)
    rows = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1
    if rows > 8:
        return _orig(x, qt)
    q = qt.q
    g, gs, dout = q.shape
    xg = x.reshape(*x.shape[:-1], g, gs).astype(jnp.float32)
    xa = jnp.maximum(jnp.max(jnp.abs(xg), axis=-1, keepdims=True),
                     1e-20) / 127.0
    x_i8 = jnp.round(xg / xa).astype(jnp.int8)
    part = jnp.einsum("...gk,gko->...go", x_i8, q,
                      preferred_element_type=jnp.int32)
    scale = qt.scale.reshape(g, dout)
    out = jnp.sum(part.astype(jnp.float32) * (xa * scale), axis=-2)
    return out.astype(x.dtype)

_orig = Q.quant_matmul
Q.quant_matmul = quant_matmul_w8a8
# llama imports _mm which closes over quant usage — check import binding
from mantis_tpu.models import llama
import bench
ttft, tok_s = bench.bench_decode()
print(f"W8A8 matvec: TTFT {ttft:.1f} ms   decode {tok_s:.1f} tok/s", flush=True)
