"""Is decode attention paying a cache transpose?

Hypothesis from profile_decode_gap.py: attention+KV at ctx 6016 costs
2.93 ms/token vs a ~0.5 ms HBM floor (394 MB int8 KV at 819 GB/s).
The cache is stored [B, M, H, D] but both attention dots batch over
(b, h) — XLA may materialize a [B, H, M, D] transpose of the whole
cache every token.  Measure the same attention math with the cache
pre-stored in each layout, 32 layers back-to-back like a decode step.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  "/root/.cache/jax_comp_cache")

B, M, HQ, HK, DH, L = 1, 6048, 32, 8, 128, 32
G = HQ // HK
SCALE = DH ** -0.5


def attn_bmhd(q, k, v, ks, vs):
    """current layout: k/v [B, M, Hk, D], scales [B, M, Hk]"""
    qg = q.reshape(B, 1, HK, G, DH)
    logits = jnp.einsum("bqhgd,bmhd->bhgqm", qg, k.astype(q.dtype),
                        preferred_element_type=jnp.float32) * SCALE
    logits = logits * ks.transpose(0, 2, 1)[:, :, None, None, :]
    probs = jax.nn.softmax(logits, axis=-1)
    probs = (probs * vs.transpose(0, 2, 1)[:, :, None, None, :]
             ).astype(q.dtype)
    out = jnp.einsum("bhgqm,bmhd->bqhgd", probs, v.astype(q.dtype))
    return out.reshape(B, 1, HQ, DH)


def attn_bhmd(q, k, v, ks, vs):
    """flipped layout: k/v [B, Hk, M, D], scales [B, Hk, M]"""
    qg = q.reshape(B, 1, HK, G, DH)
    logits = jnp.einsum("bqhgd,bhmd->bhgqm", qg, k.astype(q.dtype),
                        preferred_element_type=jnp.float32) * SCALE
    logits = logits * ks[:, :, None, None, :]
    probs = jax.nn.softmax(logits, axis=-1)
    probs = (probs * vs[:, :, None, None, :]).astype(q.dtype)
    out = jnp.einsum("bhgqm,bhmd->bqhgd", probs, v.astype(q.dtype))
    return out.reshape(B, 1, HQ, DH)


def run(name, fn, kshape, sshape):
    rng = np.random.RandomState(0)

    def mk(i):
        k = jnp.asarray(rng.randint(-127, 128, size=(L,) + kshape),
                        jnp.int8)
        v = jnp.asarray(rng.randint(-127, 128, size=(L,) + kshape),
                        jnp.int8)
        ks = jnp.asarray(rng.rand(L, *sshape), jnp.float32) * 1e-2
        vs = jnp.asarray(rng.rand(L, *sshape), jnp.float32) * 1e-2
        q = jnp.asarray(rng.randn(B, 1, HQ, DH), jnp.bfloat16)
        return k, v, ks, vs, q

    @jax.jit
    def step(k, v, ks, vs, q):
        def body(i, acc):
            o = fn(q + acc[:, :1] * 0, k[i], v[i], ks[i], vs[i])
            return acc + o.reshape(B, HQ * DH)
        return jax.lax.fori_loop(0, L, body,
                                 jnp.zeros((B, HQ * DH), jnp.bfloat16))

    args = [mk(i) for i in range(3)]
    jax.block_until_ready(step(*args[0]))
    best = None
    for a in args:
        t0 = time.perf_counter()
        jax.block_until_ready(step(*a))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    gb = (2 * L * B * M * HK * DH + 2 * L * B * M * HK * 4) / 1e9
    print(f"{name}: {best*1e3:7.2f} ms/step  "
          f"({gb:.2f} GB KV -> eff {gb/best:6.0f} GB/s)")
    return best


run("bmhd (current)", attn_bmhd, (B, M, HK, DH), (B, M, HK))
run("bhmd (flipped)", attn_bhmd, (B, HK, M, DH), (B, HK, M))
