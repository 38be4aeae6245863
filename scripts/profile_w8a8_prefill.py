"""W8A8 vs bf16-dequant matmul at LM prefill shapes — TESTED NEGATIVE.

[6016, 4096] @ [4096, 14336] (the gate/up shape at the 8-image TTFT
prompt length) chained x16 inside one jit so the tunnel RTT amortizes.
Variants:
  1. bf16 @ bf16 (weights resident bf16)
  2. bf16 @ dequant(int8)  (current quant_matmul prefill path)
  3. dyn-quant x -> int8 @ int8 per-channel + rescale (W8A8)

Measured (v5e, order-randomized, stable across repeats):
  bf16 @ bf16     3.0-3.3 ms/matmul
  bf16 @ dequant  3.0-3.9 ms/matmul   (the shipped TTFT path)
  w8a8 int8       4.0-4.2 ms/matmul   (~30% SLOWER)

The XLA int8 dot does not realize the 2x MXU rate even at 4096/14336
contractions: the dynamic activation quant ([6016,4096] abs-max +
round + cast) and the int32->f32 rescale of the [6016,14336] result
are unfused VPU passes that cost more than the MXU saves — the same
shape-independent pattern as the encoder W8A8 (+25% only) and the
int8-attention kernel (slower outright).  Prefill stays bf16-dequant;
TTFT 717 ms stands as the chip number.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import jax.numpy as jnp

S, DIN, DOUT = 6016, 4096, 14336
N_ITER = 16


def w_bf16(key):
    return jax.random.normal(key, (DIN, DOUT), jnp.bfloat16) * 0.02


def w_int8(key):
    q = jax.random.randint(key, (DIN, DOUT), -127, 128, jnp.int8)
    s = jnp.full((1, DOUT), 2e-4, jnp.float32)
    return q, s


def chain(fn):
    def f(x, w):
        def body(c, _):
            y = fn(c, w)
            # project back to DIN so the loop chains; cheap vs the dot
            return y[:, :DIN].astype(jnp.bfloat16), ()
        o, _ = jax.lax.scan(body, x, None, length=N_ITER)
        return o
    return f


def mm_bf16(x, w):
    return x @ w


def mm_dequant(x, w):
    q, s = w
    return x @ (q.astype(jnp.bfloat16) * s.astype(jnp.bfloat16))


def mm_w8a8(x, w):
    q, s = w
    xs = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(
        jnp.float32) / 127.0
    xs = jnp.where(xs == 0, 1.0, xs)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / xs),
                  -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * xs * s).astype(jnp.bfloat16)


def bench(name, fn, w, xs_list):
    f = jax.jit(chain(fn))
    jax.block_until_ready(f(xs_list[0], w))
    t0 = time.perf_counter()
    acc = 0.0
    for x in xs_list[1:]:
        acc += float(jnp.sum(f(x, w)[:1].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / (len(xs_list) - 1) / N_ITER
    tf = 2 * S * DIN * DOUT / dt / 1e12
    print(f"{name:18s} {dt*1000:7.2f} ms/matmul  {tf:6.1f} TF/s-equiv  "
          f"(acc {acc:.2f})", flush=True)
    return dt


def main():
    k = jax.random.PRNGKey(0)
    kw, kx = jax.random.split(k)
    wb = jax.block_until_ready(w_bf16(kw))
    wq = jax.block_until_ready(w_int8(kw))
    xs_list = [jax.block_until_ready(
        jax.random.normal(jax.random.PRNGKey(i + 1), (S, DIN),
                          jnp.bfloat16) * 0.5) for i in range(4)]
    bench("warmup (ignore)", mm_bf16, wb, xs_list)
    bench("w8a8 int8", mm_w8a8, wq, xs_list)
    bench("bf16 @ dequant", mm_dequant, wq, xs_list)
    bench("bf16 @ bf16", mm_bf16, wb, xs_list)
    bench("w8a8 int8 (2nd)", mm_w8a8, wq, xs_list)
    bench("bf16 @ dequant (2nd)", mm_dequant, wq, xs_list)


if __name__ == "__main__":
    main()
