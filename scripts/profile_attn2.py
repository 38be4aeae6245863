"""Pallas kernel variants for the ViT encode shape, defeating LICM by
varying q per scan iteration."""
import functools, sys, time
import numpy as np
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from mantis_tpu.ops.flash_attention import flash_attention

B, S, H, D = 64, 729, 16, 72
SP = 768  # padded
N = 6
rng = np.random.RandomState(0)
qkv = [tuple(jnp.asarray(rng.randn(B, SP, H, D), jnp.bfloat16)
             for _ in range(3)) for _ in range(N + 1)]
scale = D ** -0.5

def bench(fn, name, reps=26):
    @jax.jit
    def f(q, k, v):
        def body(c, i):
            qq = q + (i * 1e-6).astype(q.dtype)  # defeat LICM
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

# --- variant A: single-block softmax, no online rescale, no segments
def _kern_a(q_ref, k_ref, v_ref, o_ref, *, scale, hblk):
    q = q_ref[0, :, :, :] if hblk > 1 else q_ref[0, 0, :, :]
    k = k_ref[0, :, :, :] if hblk > 1 else k_ref[0, 0, :, :]
    v = v_ref[0, :, :, :] if hblk > 1 else v_ref[0, 0, :, :]
    if hblk > 1:
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[0, :, :, :] = (pv / l).astype(o_ref.dtype)
    else:
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, 0, :, :] = (pv / l).astype(o_ref.dtype)

def simple_attn(q, k, v, hblk=1, bq=SP):
    b, s, h, d = q.shape
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    nq = s // bq
    if hblk > 1:
        grid = (b, h // hblk, nq)
        spec = pl.BlockSpec((1, hblk, bq, d), lambda b_, h_, qi: (b_, h_, qi, 0))
        kspec = pl.BlockSpec((1, hblk, s, d), lambda b_, h_, qi: (b_, h_, 0, 0))
    else:
        grid = (b, h, nq)
        spec = pl.BlockSpec((1, 1, bq, d), lambda b_, h_, qi: (b_, h_, qi, 0))
        kspec = pl.BlockSpec((1, 1, s, d), lambda b_, h_, qi: (b_, h_, 0, 0))
    out = pl.pallas_call(
        functools.partial(_kern_a, scale=scale, hblk=hblk),
        grid=grid,
        in_specs=[spec, kspec, kspec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",) * 3),
        interpret=False,
    )(qt, kt, vt)
    return out.transpose(0, 2, 1, 3)

bench(lambda q,k,v: flash_attention(q,k,v,causal=False,softmax_scale=scale),
      "pallas current")
bench(lambda q,k,v: simple_attn(q,k,v), "simple single-block")
bench(lambda q,k,v: simple_attn(q,k,v,hblk=2), "simple hblk=2")
bench(lambda q,k,v: simple_attn(q,k,v,hblk=4), "simple hblk=4")
bench(lambda q,k,v: simple_attn(q,k,v,bq=256), "simple bq=256")
def xla_fast(q,k,v):
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)
bench(xla_fast, "xla einsum (LICM-proof)")

LOG2E = float(np.log2(np.e))

def _kern_b(q_ref, k_ref, v_ref, o_ref, *, scale, mode):
    q = q_ref[0, 0, :, :]
    k = k_ref[0, 0, :, :]
    v = v_ref[0, 0, :, :]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if mode == "exp2":
        s = s * (scale * LOG2E)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
    elif mode == "nomax":
        p = jnp.exp(s * scale)  # ABLATION ONLY (unsafe)
    elif mode == "bf16exp":
        s = s * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp((s - m).astype(jnp.bfloat16)).astype(jnp.float32)
    l = jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0, 0, :, :] = (pv * (1.0 / l)).astype(o_ref.dtype)

def attn_b(q, k, v, mode):
    b, s, h, d = q.shape
    qt = q.transpose(0, 2, 1, 3); kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    spec = pl.BlockSpec((1, 1, s, d), lambda b_, h_: (b_, h_, 0, 0))
    out = pl.pallas_call(
        functools.partial(_kern_b, scale=scale, mode=mode),
        grid=(b, h), in_specs=[spec, spec, spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(qt, kt, vt)
    return out.transpose(0, 2, 1, 3)

bench(lambda q,k,v: attn_b(q,k,v,"exp2"), "simple exp2")
bench(lambda q,k,v: attn_b(q,k,v,"nomax"), "ABLATION no-max exp")
bench(lambda q,k,v: attn_b(q,k,v,"bf16exp"), "bf16 exp")

# matmul-only ablation: no softmax at all
def _kern_c(q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[0, 0, :, :]; k = k_ref[0, 0, :, :]; v = v_ref[0, 0, :, :]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    pv = jax.lax.dot_general(s.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    o_ref[0, 0, :, :] = pv.astype(o_ref.dtype)

def attn_c(q, k, v):
    b, s, h, d = q.shape
    qt = q.transpose(0, 2, 1, 3); kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    spec = pl.BlockSpec((1, 1, s, d), lambda b_, h_: (b_, h_, 0, 0))
    out = pl.pallas_call(
        functools.partial(_kern_c, scale=scale),
        grid=(b, h), in_specs=[spec, spec, spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(qt, kt, vt)
    return out.transpose(0, 2, 1, 3)

bench(attn_c, "ABLATION matmuls only")

# variant D: k supplied pre-transposed [b,h,d,s] -> classic matmul layout
def _kern_d(q_ref, kt_ref, v_ref, o_ref, *, scale):
    q = q_ref[0, 0, :, :]          # [bq, d]
    kt = kt_ref[0, 0, :, :]        # [d, s]
    v = v_ref[0, 0, :, :]          # [s, d]
    s = jax.lax.dot_general(q, kt, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    o_ref[0, 0, :, :] = (pv * (1.0 / l)).astype(o_ref.dtype)

def attn_d(q, k, v):
    b, s, h, d = q.shape
    qt = q.transpose(0, 2, 1, 3)
    ktt = k.transpose(0, 2, 3, 1)  # [b,h,d,s]
    vt = v.transpose(0, 2, 1, 3)
    spec = pl.BlockSpec((1, 1, s, d), lambda b_, h_: (b_, h_, 0, 0))
    kspec = pl.BlockSpec((1, 1, d, s), lambda b_, h_: (b_, h_, 0, 0))
    out = pl.pallas_call(
        functools.partial(_kern_d, scale=scale),
        grid=(b, h), in_specs=[spec, kspec, spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(qt, ktt, vt)
    return out.transpose(0, 2, 1, 3)

bench(attn_d, "kT classic layout")

# control: D=128 inputs through the same simple kernel
qkv128 = [tuple(jnp.asarray(rng.randn(B, SP, H, 128), jnp.bfloat16)
                for _ in range(3)) for _ in range(2)]
def bench128():
    @jax.jit
    def f(q, k, v):
        def body(c, i):
            qq = q + (i * 1e-6).astype(q.dtype)
            return c + simple_attn(qq, k, v).astype(jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.zeros(q.shape, jnp.float32),
                              jnp.arange(26, dtype=jnp.bfloat16))
        return jnp.sum(acc)
    float(f(*qkv128[-1]))
    t0 = time.perf_counter()
    acc = f(*qkv128[0])
    float(acc)
    dt = time.perf_counter() - t0
    print(f"{'simple D=128 control':44s} {dt*1000:7.1f} ms/26L "
          f"({dt*1000/26:5.2f} ms/L)")
bench128()
