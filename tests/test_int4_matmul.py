"""int4 quant-matmul paths: the wired XLA two-dot formulation and the
(unwired, negative-result) Pallas in-register-unpack kernel both match
the dequantized reference exactly."""

import numpy as np

import jax
import jax.numpy as jnp

from mantis_tpu.ops.int4_matmul import int4_matvec
from mantis_tpu.ops.quant import dequantize, quant_matmul, quantize


def _setup(din=1024, dout=1536):
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(din, dout), jnp.float32)
    qt = quantize(w, bits=4, group_size=128)
    x = jnp.asarray(rng.randn(1, din) * 0.3, jnp.bfloat16)
    ref = (x @ dequantize(qt, jnp.bfloat16)).astype(jnp.float32)
    return x, qt, ref


def test_quant_matmul_int4_decode_rows():
    x, qt, ref = _setup()
    out = quant_matmul(x, qt).astype(jnp.float32)
    rel = float(jnp.max(jnp.abs(out - ref))
                / (jnp.max(jnp.abs(ref)) + 1e-9))
    assert rel < 5e-3, rel


def test_pallas_int4_matvec_matches_dequant():
    x, qt, ref = _setup()
    out = int4_matvec(x, qt.q, qt.scale).astype(jnp.float32)
    rel = float(jnp.max(jnp.abs(out - ref))
                / (jnp.max(jnp.abs(ref)) + 1e-9))
    assert rel < 5e-3, rel


def test_pallas_int4_batch_rows():
    rng = np.random.RandomState(1)
    w = jnp.asarray(rng.randn(512, 512), jnp.float32)
    qt = quantize(w, bits=4, group_size=128)
    x = jnp.asarray(rng.randn(4, 512) * 0.3, jnp.bfloat16)
    ref = (x @ dequantize(qt, jnp.bfloat16)).astype(jnp.float32)
    out = int4_matvec(x, qt.q, qt.scale).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-2, rtol=1e-2)
