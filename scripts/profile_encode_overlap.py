"""Encode-attention overlap attempt (VERDICT r4 item 8, round 5).

The last named encode lever: the single-block ViT attention kernel
(ops/flash_attention.py _fwd_kernel_single) measures ~4.2 us/grid-step
at [64, 768, 16, 72] — ~1.6 us of MXU (QK+PV at 56% util from the
72->128 pad) + ~2.7 us of VPU softmax (5 passes over the [768, 768]
f32 score tile).  MXU and VPU are independent units; inside ONE kernel
body Mosaic's scheduler may overlap independent chains, so processing
TWO heads per grid step — dot(h2) issuable while softmax(h1) runs on
the VPU — bounds the step at max(VPU, MXU) instead of their sum.

This script A/Bs three variants at the encode shape, chained
data-dependently inside one jit (the harness rule from
profile_head_packing.py: an additive perturbation lets XLA hoist
loop-invariant work and report impossible numbers):

  A  shipped single-block kernel (block_h=1)    — baseline
  B  2-heads-per-step kernel (block_h=2)        — the overlap attempt
  C  2-heads-per-step, interleaved emission     — dots issued first,
     then both softmaxes, then both PVs (hand-hoisted independence)

Any outcome is recorded in docs/PERF.md per the round-5 plan.
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  "/root/.cache/jax_comp_cache")

B, S, H, D = 64, 768, 16, 72
KV_LEN = 729
SCALE = D ** -0.5
LAYERS = 26
MASK = -0.7 * float(np.finfo(np.dtype("float32")).max)


def kern_h(q_ref, k_ref, v_ref, o_ref, *, block_h, interleave):
    col = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    mask = col < KV_LEN

    qs = [q_ref[0, h] for h in range(block_h)]
    ks = [k_ref[0, h] for h in range(block_h)]
    vs = [v_ref[0, h] for h in range(block_h)]

    def dot_qk(q, k):
        return jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * SCALE

    def soft(s):
        s = jnp.where(mask, s, MASK)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        return p, jnp.where(l == 0.0, 1.0, l)

    def pv(p, l, v):
        out = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return (out / l).astype(o_ref.dtype)

    if interleave:
        ss = [dot_qk(qs[h], ks[h]) for h in range(block_h)]
        pls = [soft(ss[h]) for h in range(block_h)]
        for h in range(block_h):
            o_ref[0, h] = pv(*pls[h], vs[h])
    else:
        for h in range(block_h):
            p, l = soft(dot_qk(qs[h], ks[h]))
            o_ref[0, h] = pv(p, l, vs[h])


def make_attn(block_h, interleave):
    spec = pl.BlockSpec((1, block_h, S, D),
                        lambda b, h: (b, h, 0, 0))

    f = pl.pallas_call(
        functools.partial(kern_h, block_h=block_h,
                          interleave=interleave),
        grid=(B, H // block_h),
        in_specs=[spec] * 3,
        out_specs=[spec],
        out_shape=[jax.ShapeDtypeStruct((B, H, S, D), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * B * H * S * S * D),
            bytes_accessed=int(3 * B * H * S * D * 2),
            transcendentals=int(B * H * S * S)),
        interpret=jax.default_backend() != "tpu",
    )

    def attn(q, k, v):
        (o,) = f(q, k, v)
        return o
    return attn


def bench(name, attn):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)

    @jax.jit
    def chain(q, k, v):
        def body(i, q):
            o = attn(q, k, v)
            return (0.999 * q + 1e-3 * o).astype(jnp.bfloat16)
        return jnp.sum(jax.lax.fori_loop(0, LAYERS, body, q)
                       .astype(jnp.float32))

    float(chain(q, k, v))
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(q, k, v))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    per_layer = best / LAYERS
    print(f"{name}: {per_layer*1e3:6.2f} ms/layer "
          f"({best*1e3:7.1f} ms x{LAYERS})", flush=True)
    return per_layer


def check_parity():
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(2, 4, S, D), jnp.float32)
    k = jnp.asarray(rng.randn(2, 4, S, D), jnp.float32)
    v = jnp.asarray(rng.randn(2, 4, S, D), jnp.float32)

    def ref(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * SCALE
        s = jnp.where(jnp.arange(S)[None, None, None, :] < KV_LEN,
                      s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)

    global B, H
    B_, H_ = B, H
    B, H = 2, 4
    try:
        for bh, il in ((1, False), (2, False), (2, True)):
            got = make_attn(bh, il)(
                q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                v.astype(jnp.bfloat16))
            err = np.abs(np.asarray(got, np.float32)
                         - np.asarray(ref(q, k, v))).max()
            assert err < 0.05, (bh, il, err)
            print(f"parity block_h={bh} interleave={il}: "
                  f"max err {err:.4f} OK", flush=True)
    finally:
        B, H = B_, H_


if __name__ == "__main__":
    if jax.default_backend() != "tpu":
        check_parity()
        print("CPU: parity only (interpret mode); run on TPU for "
              "timings")
        sys.exit(0)
    bench("A block_h=1 (baseline) ", make_attn(1, False))
    bench("B block_h=2            ", make_attn(2, False))
    bench("C block_h=2 interleaved", make_attn(2, True))
