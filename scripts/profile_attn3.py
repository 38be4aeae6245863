"""More kernel variants at ViT shapes: grid semantics, batch blocking."""
import functools, sys, time
import numpy as np
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from mantis_tpu.ops.flash_attention import flash_attention

B, S, H, D = 64, 768, 16, 72
N = 6
rng = np.random.RandomState(0)
qkv = [tuple(jnp.asarray(rng.randn(B, S, H, D), jnp.bfloat16)
             for _ in range(3)) for _ in range(N + 1)]
scale = D ** -0.5

def bench(fn, name, reps=26):
    @jax.jit
    def f(q, k, v):
        def body(c, i):
            qq = q + (i * 1e-6).astype(q.dtype)
            return c + fn(qq, k, v).astype(jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.zeros(q.shape, jnp.float32),
                              jnp.arange(reps, dtype=jnp.bfloat16))
        return jnp.sum(acc)
    try:
        float(f(*qkv[-1]))
    except Exception as e:
        print(f"{name:44s} FAILED {type(e).__name__}: {str(e)[:80]}")
        return
    t0 = time.perf_counter()
    acc = 0.0
    for t in qkv[:N]:
        acc = acc + f(*t)
    float(acc)
    dt = (time.perf_counter() - t0) / N
    print(f"{name:44s} {dt*1000:7.1f} ms/{reps}L ({dt*1000/reps:5.2f} ms/L)")

def _kern(q_ref, k_ref, v_ref, o_ref, *, scale, bblk):
    q = q_ref[...]  # [bblk,1,S,D] or [1,1,S,D]
    k = k_ref[...]
    v = v_ref[...]
    q2 = q.reshape(-1, q.shape[-2], q.shape[-1])
    k2 = k.reshape(-1, k.shape[-2], k.shape[-1])
    v2 = v.reshape(-1, v.shape[-2], v.shape[-1])
    s = jax.lax.dot_general(q2, k2, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(p.astype(v.dtype), v2,
                             (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    o_ref[...] = (pv * (1.0 / l)).reshape(q.shape).astype(o_ref.dtype)

def attn(q, k, v, bblk=1, sem="parallel"):
    b, s, h, d = q.shape
    qt = q.transpose(0, 2, 1, 3); kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    spec = pl.BlockSpec((bblk, 1, s, d),
                        lambda b_, h_: (b_, h_, 0, 0))
    out = pl.pallas_call(
        functools.partial(_kern, scale=scale, bblk=bblk),
        grid=(b // bblk, h),
        in_specs=[spec, spec, spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(sem, sem)),
    )(qt, kt, vt)
    return out.transpose(0, 2, 1, 3)

bench(lambda q,k,v: flash_attention(q,k,v,causal=False,softmax_scale=scale),
      "production single-block")
bench(lambda q,k,v: attn(q,k,v,bblk=1,sem="arbitrary"), "arbitrary sem")
bench(lambda q,k,v: attn(q,k,v,bblk=2), "batch-block 2")
bench(lambda q,k,v: attn(q,k,v,bblk=4), "batch-block 4")

# bisect the production-wrapper slowdown
from mantis_tpu.ops.flash_attention import (
    _flash_attention_core, _fwd_kernel_single)

def core_direct(q, k, v):
    qt = q.transpose(0, 2, 1, 3); kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    qseg = jnp.zeros((B, S), jnp.int32)
    return _flash_attention_core(
        qt, kt, vt, qseg, qseg, scale, False, False, 768, 768,
        False, None, None, 0).transpose(0, 2, 1, 3)
bench(core_direct, "core direct (no pad logic)")

def kern4(q, k, v, cost=False, sem4=("parallel",)*3 + ("arbitrary",)):
    qt = q.transpose(0, 2, 1, 3); kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    spec = pl.BlockSpec((1, 1, S, D), lambda b_, h_, qi, ki: (b_, h_, qi, 0))
    kw = {}
    if cost:
        kw["cost_estimate"] = pl.CostEstimate(
            flops=int(4 * B * H * S * S * D),
            bytes_accessed=int(4 * qt.size * 2),
            transcendentals=int(B * H * S * S))
    base = functools.partial(
        _fwd_kernel_single, scale=scale, causal=False,
        has_segments=False, block_q=S, block_k=S, kv_len=None,
        window=None, causal_offset=0)
    def kernel(q_ref, k_ref, v_ref, o_ref):
        base(q_ref, k_ref, v_ref, None, None, o_ref, None)
    out = pl.pallas_call(
        kernel, grid=(B, H, 1, 1),
        in_specs=[spec, spec, spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=sem4),
        **kw,
    )(qt, kt, vt)
    return out.transpose(0, 2, 1, 3)

bench(lambda q,k,v: kern4(q,k,v,cost=False), "prod kernel, 4d grid, no cost")
bench(lambda q,k,v: kern4(q,k,v,cost=True), "prod kernel, 4d grid, WITH cost")
