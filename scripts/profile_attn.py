"""Attention variants at ViT-encode shapes on the real TPU."""
import sys, time
import numpy as np
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from mantis_tpu.ops.flash_attention import flash_attention

B, S, H, D = 64, 729, 16, 72
N = 6
rng = np.random.RandomState(0)
qkv = [tuple(jnp.asarray(rng.randn(B, S, H, D), jnp.bfloat16)
             for _ in range(3)) for _ in range(N + 1)]
scale = D ** -0.5

def bench(fn, name, reps=26):
    @jax.jit
    def f(q, k, v):
        def body(c, _):
            return c + fn(q, k, v).astype(jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.zeros(q.shape, jnp.float32),
                              None, length=reps)
        return jnp.sum(acc)
    try:
        float(f(*qkv[-1]))
    except Exception as e:
        print(f"{name:40s} FAILED {type(e).__name__}: {str(e)[:90]}")
        return
    t0 = time.perf_counter()
    acc = 0.0
    for t in qkv[:N]:
        acc = acc + f(*t)
    float(acc)
    dt = (time.perf_counter() - t0) / N
    print(f"{name:40s} {dt*1000:8.1f} ms/{reps}-layers "
          f"({dt*1000/reps:5.2f} ms/layer)")

bench(lambda q,k,v: flash_attention(q,k,v,causal=False,softmax_scale=scale),
      "pallas current (768 block)")
bench(lambda q,k,v: flash_attention(q,k,v,causal=False,softmax_scale=scale,
                                    block_q=256, block_k=768),
      "pallas bq=256")
bench(lambda q,k,v: flash_attention(q,k,v,causal=False,softmax_scale=scale,
                                    block_q=128, block_k=768),
      "pallas bq=128")
def xla_fast(q,k,v):
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)
bench(xla_fast, "xla bf16 einsum + f32 softmax")
def dpa(q,k,v):
    return jax.nn.dot_product_attention(q, k, v, scale=scale)
bench(dpa, "jax.nn.dot_product_attention")
def xla_bhsd(q,k,v):
    q = q.transpose(0,2,1,3); k = k.transpose(0,2,1,3)
    v = v.transpose(0,2,1,3)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v).transpose(0,2,1,3)
bench(xla_bhsd, "xla BHSD einsum")
