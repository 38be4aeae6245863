"""ops/adam8bit.py: blockwise-int8 moment quantization + the fused
Pallas update kernel (bitsandbytes-AdamW8bit equivalent).

The fused kernel must be BIT-IDENTICAL to the XLA composition
(dequantize -> adamw -> quantize): both share _to_root/_from_root and
the same rounding, so the packed payloads compare with array_equal.
Runs in interpret mode on CPU; tests/test_trainer.py covers the
trainer-integrated path and scripts/bench_mfu_honest.py the on-chip
one.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mantis_tpu.ops import adam8bit as Q8


@pytest.mark.parametrize("n", [2048 * 3, 5000, 2048 * 8, 130 * 2048])
def test_fused_kernel_matches_xla_composition(n):
    rng = np.random.RandomState(0)
    p = jnp.asarray(rng.randn(n).astype(np.float32) * 0.02)
    g = jnp.asarray(rng.randn(n).astype(np.float32) * 1e-3)
    m0 = rng.randn(n).astype(np.float32) * 1e-3
    v0 = np.abs(rng.randn(n).astype(np.float32)) * 1e-6
    mq, ms = Q8.quantize_blockwise(jnp.asarray(m0), power=3)
    vq, vs = Q8.quantize_blockwise(jnp.asarray(v0), power=4)
    lr, bc1, bc2 = 1e-3, 0.1, 0.001
    b1, b2, eps, wd = 0.9, 0.999, 1e-8, 0.01

    m = Q8.dequantize_blockwise(mq, ms, n, power=3)
    v = Q8.dequantize_blockwise(vq, vs, n, power=4)
    m1 = b1 * m + (1 - b1) * g
    v1 = b2 * v + (1 - b2) * jnp.square(g)
    step = (m1 / bc1) / (jnp.sqrt(v1 / bc2) + eps) + wd * p
    p1_ref = p - lr * step
    mq1r, ms1r = Q8.quantize_blockwise(m1, power=3)
    vq1r, vs1r = Q8.quantize_blockwise(v1, power=4)

    p1, mq1, ms1, vq1, vs1 = Q8.fused_adamw_update(
        p, g, mq, ms, vq, vs, lr, bc1, bc2,
        b1=b1, b2=b2, eps=eps, wd=wd, interpret=True)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p1_ref),
                               rtol=2e-5, atol=2e-7)

    # same formulas on both sides, but XLA may fuse the fp chain
    # differently per program (FMA contraction) — so compare at the
    # quantized-integer level with a <=1-code tolerance rather than
    # bitwise (on real TPU the payloads come out bit-identical)
    def codes(packed, scale):
        if packed.dtype != jnp.float32:
            packed = jax.lax.bitcast_convert_type(packed, jnp.float32)
        c = np.asarray(jax.lax.bitcast_convert_type(packed,
                                                    jnp.uint32))
        q = np.stack([((c >> (8 * k)) & 0xFF).astype(np.int32)
                      for k in range(4)], axis=-1)
        return q - 256 * (q > 127), np.asarray(scale)

    for (pk, sc), (pkr, scr) in (((mq1, ms1), (mq1r, ms1r)),
                                 ((vq1, vs1), (vq1r, vs1r))):
        qa, sa = codes(pk, sc)
        qb, sb = codes(pkr, scr)
        np.testing.assert_allclose(sa, sb, rtol=1e-6)
        assert np.abs(qa - qb).max() <= 1


def test_fused_kernel_bf16_params_and_2d_shape():
    """bf16 leaves with a 2-D shape (the real parameter case)."""
    rng = np.random.RandomState(1)
    p = jnp.asarray(rng.randn(96, 128), jnp.bfloat16)
    g = jnp.asarray(rng.randn(96, 128) * 1e-3, jnp.bfloat16)
    mq, ms = Q8.zeros_like_quantized(p)
    vq, vs = Q8.zeros_like_quantized(p)
    p1, mq1, ms1, vq1, vs1 = Q8.fused_adamw_update(
        p, g, mq, ms, vq, vs, 1e-2, 0.1, 0.001,
        b1=0.9, b2=0.999, eps=1e-8, wd=0.0, interpret=True)
    assert p1.shape == p.shape and p1.dtype == p.dtype
    assert mq1.shape == mq.shape and ms1.shape == ms.shape
    # fresh moments: m1 = 0.1*g, v1 = 0.001*g^2 -> step direction = -g
    moved = np.asarray(p1, np.float32) - np.asarray(p, np.float32)
    gf = np.asarray(g, np.float32)
    mask = np.abs(gf) > 1e-3
    assert (np.sign(moved[mask]) == -np.sign(gf[mask])).mean() > 0.98


def test_roundtrip_error_bounds_and_root_domains():
    rng = np.random.RandomState(0)
    for n in (5, 2048, 2049, 100000):
        x = jnp.asarray(rng.randn(n).astype(np.float32) * 0.01)
        pq, s = Q8.quantize_blockwise(x)
        y = Q8.dequantize_blockwise(pq, s, n)
        assert float(jnp.abs(y - x).max()) <= float(
            jnp.abs(x).max()) / 120
    # 4th-root domain keeps resolution 1e6x below block max
    v = jnp.asarray([1e-8, 1e-6, 1e-4, 1e-2] * 512, jnp.float32)
    pq, ps = Q8.quantize_blockwise(v, power=4)
    back = Q8.dequantize_blockwise(pq, ps, v.size, power=4)
    ratio = np.asarray(back[:4]) / np.asarray(v[:4])
    assert (ratio > 0.85).all() and (ratio < 1.18).all(), ratio
