"""Head-dim packing ablation for the encode attention (VERDICT round-2
item 4 — the round-1 idea that was never measured).

Claim to test: packing two 72-dim heads "fills the 128-lane MXU" and
recovers the 44% pad waste on the QK/PV dots.

Arithmetic first (why packing cannot win):
  - The QK dot contracts over head_dim = 72.  The MXU consumes the
    contraction in 128-deep passes, so a 72-deep contraction costs one
    full pass: useful/executed = 72/128 = 56% — exactly the measured
    MXU utilization (docs/PERF.md).
  - Packing two heads along the CONTRACTION ([Sq, 144] x [144, Sk])
    computes q_h1·k_h2 cross terms — wrong result.  Making it correct
    needs block-diagonal zeros: q2 [Sq, 144], k2 [144, 2*Sk] —
    useful/executed = (2*Sq*Sk*72) / (Sq*2*Sk*160) = 45% < 56%.
    Every packing along a non-contraction axis (heads -> Sq rows, or
    V columns for PV) leaves the 72-deep (or 72-wide output tile)
    padding untouched.
  - Conclusion: 56% is the information-theoretic MXU ceiling for
    dh=72 dots; there is nothing to pack.  The remaining encode
    attention gap (4.3 vs 1.7 ms/layer ideal) is softmax VPU work +
    per-step DMA, which head packing does not address.

This script MEASURES the three layouts at the real encode shapes so
the ablation record has numbers, not just arithmetic:
  A. dh=72 per-head dots (what the kernel does; XLA pads to 128)
  B. dh=128 dense dots (the hypothetical if heads were 128-dim —
     upper bound on any packing win)
  C. 2-head block-diagonal pack (the literal proposal, made correct)

Useful-FLOP throughput is reported for each; B/A is the theoretical
headroom, C/A shows the proposal losing it to zero blocks.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  "/root/.cache/jax_comp_cache")

BH = 64 * 16   # batch 64 images x 16 heads
S = 768        # padded patch count per image
REPS = 8


def bench(fn, args, useful_flops, label, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        float(fn(*args))
        dt = (time.perf_counter() - t0) / REPS
        best = dt if best is None else min(best, dt)
    print(f"{label}: {best * 1e3:.2f} ms/rep -> "
          f"{useful_flops / best / 1e12:.1f} TF/s useful", flush=True)
    return useful_flops / best


def chain(dot, dh):
    """REPS dependent dots in one jit (amortizes the ~35 ms tunnel
    dispatch).  The carry q_{i+1} = q_i + eps*o[:, :, :dh] is a
    FULL-TENSOR data dependence: an additive scalar perturbation
    (q + c) lets XLA distribute dot(q+c, k) = dot(q, k) + c*dot(1, k)
    and hoist the loop-invariant dot — measured 262 TF/s "useful" on
    the dense case, above the 197 TF/s chip peak, i.e. the dots were
    not re-executed.  A data-dependent q defeats that rewrite."""
    @jax.jit
    def run(q, k):
        def body(i, state):
            q, acc = state
            o = dot(q, k)
            return (q + o[:, :, :dh].astype(q.dtype) * 1e-6,
                    acc + jnp.mean(o.astype(jnp.float32)))
        return jax.lax.fori_loop(0, REPS, body, (q, 0.0))[1]
    return run


def main():
    rng = np.random.RandomState(0)
    useful = 2 * BH * S * S * 72 * REPS  # per-head useful QK FLOPs

    def dot(q, k):
        return jnp.einsum("bsd,bdt->bst", q, k,
                          preferred_element_type=jnp.float32)

    # A. dh=72 per-head (XLA pads the contraction to 128)
    q72 = jnp.asarray(rng.randn(BH, S, 72), jnp.bfloat16)
    k72 = jnp.asarray(rng.randn(BH, 72, S), jnp.bfloat16)

    # B. dh=128 dense (hypothetical if heads were 128-dim; upper bound)
    q128 = jnp.asarray(rng.randn(BH, S, 128), jnp.bfloat16)
    k128 = jnp.asarray(rng.randn(BH, 128, S), jnp.bfloat16)

    # C. the literal 2-head pack, made correct via block-diagonal k:
    #    [Sq, 144] x [144, 2*Sk] per head-PAIR
    q144 = jnp.asarray(rng.randn(BH // 2, S, 144), jnp.bfloat16)
    kbd = np.zeros((BH // 2, 144, 2 * S), np.float32)
    kbd[:, :72, :S] = rng.randn(BH // 2, 72, S)
    kbd[:, 72:, S:] = rng.randn(BH // 2, 72, S)
    kbd = jnp.asarray(kbd, jnp.bfloat16)

    # the first measurement in a fresh process absorbs the tunnel
    # pipeline drain (1.8-17 s observed) -- discard it
    bench(chain(dot, 128), (q128, k128), 1, "  (discard warm-up)", n=1)

    a = bench(chain(dot, 72), (q72, k72), useful,
              "A dh=72  per-head  ")
    b = bench(chain(dot, 128), (q128, k128),
              2 * BH * S * S * 128 * REPS, "B dh=128 dense     ")
    c = bench(chain(dot, 144), (q144, kbd), useful,
              "C 2-head block-diag")

    print(f"\nB/A (128-dim upper bound over the padded 72 dot): "
          f"{b / a:.2f}x; C/A (the packing proposal): {c / a:.2f}x",
          flush=True)


if __name__ == "__main__":
    main()
