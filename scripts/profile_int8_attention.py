"""int8 single-block attention at ViT encode shapes — TESTED NEGATIVE.

Shapes: [64 imgs, 768 seq (729 valid), 16 heads, 72 dim], non-causal,
the W8A8 serving-encode attention (docs/PERF.md).  PERF.md round 2
estimated an int8 QK^T + int8 P@V kernel would cut attention from
4.3 ms/layer to ~2.2-2.9 and land ~242-251 img/s.  Measured (v5e,
chained x26 inside one jit so the axon-tunnel RTT amortizes; the
output feeds the next input to defeat LICM/result caching):

    bf16 single-block kernel   4.25 ms/layer   (the shipped path)
    int8 QK^T + int8 P@V       5.75 ms/layer
    int8 QK^T only             4.83 ms/layer
    int8 P@V only              5.08 ms/layer

Accuracy was NOT the problem (cos vs f32 reference 0.99995 at qk+pv):
the kernel is VPU-bound, and the added passes over the [768,768]
matrix — int32->f32 rescale of the score accumulator, f32->int8
relayout of the probs (int8 lives in (32,128) tiles vs f32 (8,128), so
the convert is a cross-sublane shuffle), per-row scale multiplies —
cost more than the 2x-rate int8 MXU saves on dots whose contraction/
output dim is only 72 (padded to 128 either way).  Consistent with the
other quant findings: XLA int8 dot = +25% at encoder shapes, int4
decode slower than int8 (ops/int4_matmul.py).  The bf16 flash kernel
stays; 222 img/s W8A8 (int8 linears, bf16 attention) is the serving
ceiling on this chip.

Quantization scheme measured (kept for the record): per-row symmetric
int8 for q/k with the softmax scale folded into the q row scales;
probs quantized by folding a 126.5x gain into the exponent
(p*126.5 = exp(s - m + log 126.5), then floor(p+0.5) -> int8, strictly
below the saturation edge) and normalizing by the QUANTIZED row sum so
the constant gain and rounding bias cancel; per-column symmetric int8
for v so its scale factors out of the contraction.
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mantis_tpu.ops.flash_attention import flash_attention, mha_reference

MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)
B, S, H, D = 64, 768, 16, 72
KV_LEN = 729
SCALE = D ** -0.5
# fold the int8 prob scale into the exponent; 126.5 (not 127) keeps
# p127 + 0.5 strictly below the int8 saturation edge
LOG_P = float(np.log(126.5))


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale, kv_len, block,
            int8_qk, int8_pv):
    if int8_qk:
        qf = q_ref[0, 0].astype(jnp.float32)
        kf = k_ref[0, 0].astype(jnp.float32)
        qs = jnp.max(jnp.abs(qf), axis=-1, keepdims=True) * (1.0 / 127.0)
        qs = jnp.where(qs == 0, 1.0, qs)
        qq = jnp.round(qf / qs).astype(jnp.int8)
        ks = jnp.max(jnp.abs(kf), axis=-1, keepdims=True) * (1.0 / 127.0)
        ks = jnp.where(ks == 0, 1.0, ks)
        kq = jnp.round(kf / ks).astype(jnp.int8)
        acc = jax.lax.dot_general(
            qq, kq, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        s = acc.astype(jnp.float32) * (qs * scale) * ks.reshape(1, -1)
    else:
        s = jax.lax.dot_general(
            q_ref[0, 0], k_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
    if kv_len is not None:
        col = jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
        s = jnp.where(col < kv_len, s, MASK_VALUE)
    m = jnp.max(s, axis=-1, keepdims=True)
    if int8_pv:
        p127 = jnp.exp(s - m + LOG_P)
        pq = (p127 + 0.5).astype(jnp.int8)
        vf = v_ref[0, 0].astype(jnp.float32)
        vs = jnp.max(jnp.abs(vf), axis=0, keepdims=True) * (1.0 / 127.0)
        vs = jnp.where(vs == 0, 1.0, vs)
        vq = jnp.round(vf / vs).astype(jnp.int8)
        pv = jax.lax.dot_general(
            pq, vq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        lq = jnp.sum(pq.astype(jnp.int32), axis=-1,
                     keepdims=True).astype(jnp.float32)
        l_safe = jnp.where(lq == 0, 1.0, lq)
        o = pv.astype(jnp.float32) * vs * (1.0 / l_safe)
    else:
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o = pv * (1.0 / l_safe)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def int8_attn(q, k, v, *, kv_len, int8_qk=True, int8_pv=True):
    # q,k,v: [B, S, H, D] -> BHSD, one (b, h) block per grid step
    b, s, h, d = q.shape
    qp = q.transpose(0, 2, 1, 3)
    kp = k.transpose(0, 2, 1, 3)
    vp = v.transpose(0, 2, 1, 3)
    spec = pl.BlockSpec((1, 1, s, d), lambda b_, h_: (b_, h_, 0, 0))
    out = pl.pallas_call(
        functools.partial(_kernel, scale=SCALE, kv_len=kv_len, block=s,
                          int8_qk=int8_qk, int8_pv=int8_pv),
        grid=(b, h),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * b * h * s * s * d),
            bytes_accessed=int(4 * qp.size * q.dtype.itemsize),
            transcendentals=int(b * h * s * s)),
    )(qp, kp, vp)
    return out.transpose(0, 2, 1, 3)


def bench(name, fn, args_list):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args_list[0]))  # compile
    t0 = time.perf_counter()
    accs = 0.0
    for a in args_list[1:]:
        # distinct inputs + a value fetch per call: the axon tunnel
        # result-caches identical executions
        accs += float(jnp.sum(f(*a).astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / (len(args_list) - 1)
    print(f"{name:24s} {dt*1000:8.2f} ms  (acc {accs:.3f})", flush=True)
    return dt


def chained(attn_fn, n_iter=26):
    # sequential dependency (output -> next input) so 26 kernel calls
    # execute inside ONE dispatch; single-call timings are swamped by
    # the ~35 ms tunnel round-trip
    def f(q, k, v):
        def body(c, _):
            return attn_fn(c, k, v), ()
        o, _ = jax.lax.scan(body, q, None, length=n_iter)
        return o
    return f


def main():
    rng = np.random.RandomState(1)
    sets = []
    for i in range(4):
        q = jnp.asarray(rng.randn(B, S, H, D) * 0.3, jnp.bfloat16)
        k = jnp.asarray(rng.randn(B, S, H, D) * 0.3, jnp.bfloat16)
        v = jnp.asarray(rng.randn(B, S, H, D) * 0.3, jnp.bfloat16)
        sets.append((q, k, v))
    for s_ in sets:
        jax.block_until_ready(s_)

    q, k, v = sets[0]
    ref = mha_reference(q[:2, :KV_LEN].astype(jnp.float32),
                        k[:2, :KV_LEN].astype(jnp.float32),
                        v[:2, :KV_LEN].astype(jnp.float32),
                        causal=False, softmax_scale=SCALE)
    for qk, pv_ in ((True, True), (True, False), (False, True)):
        out = int8_attn(q[:2], k[:2], v[:2], kv_len=KV_LEN,
                        int8_qk=qk, int8_pv=pv_)[:, :KV_LEN]
        a = np.asarray(out, np.float32).ravel()
        b_ = np.asarray(ref, np.float32).ravel()
        cos = float(np.dot(a, b_) /
                    (np.linalg.norm(a) * np.linalg.norm(b_)))
        rel = float(np.max(np.abs(a - b_)) / np.max(np.abs(b_)))
        print(f"int8_qk={qk} int8_pv={pv_}: cos {cos:.6f} "
              f"relmax {rel:.4f}", flush=True)

    bench("warmup (ignore)",
          chained(lambda q_, k_, v_: flash_attention(
              q_, k_, v_, causal=False, softmax_scale=SCALE,
              kv_valid_len=KV_LEN), 2), sets)
    results = [
        ("bf16", bench("bf16 x26", chained(
            lambda q_, k_, v_: flash_attention(
                q_, k_, v_, causal=False, softmax_scale=SCALE,
                kv_valid_len=KV_LEN)), sets)),
        ("int8 qk+pv", bench("int8 qk+pv x26", chained(
            lambda q_, k_, v_: int8_attn(q_, k_, v_, kv_len=KV_LEN)),
            sets)),
        ("int8 qk", bench("int8 qk only x26", chained(
            lambda q_, k_, v_: int8_attn(q_, k_, v_, kv_len=KV_LEN,
                                         int8_pv=False)), sets)),
        ("int8 pv", bench("int8 pv only x26", chained(
            lambda q_, k_, v_: int8_attn(q_, k_, v_, kv_len=KV_LEN,
                                         int8_qk=False)), sets)),
    ]
    for nm, t in results:
        print(f"{nm:12s} {t*1000/26:6.2f} ms/layer", flush=True)


if __name__ == "__main__":
    main()
