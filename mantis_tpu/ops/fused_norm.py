"""Fused LayerNorm Pallas kernel.

KEPT UNWIRED (negative result): measured slower than
XLA's own LN fusion at encode shapes (docs/PERF.md); retained as the
measured artifact, not called by any model.

XLA lowers layernorm to multiple HBM passes (mean, variance, normalize
as separate fusions around the matmuls); this kernel does one read +
one write per tensor.  Measured on the SigLIP-so400m encode path
(v5e, [64x768, 1152] bf16): ~1.5 ms/layer (two LNs) -> ~0.6 ms/layer.

Replaces the reference's flash-attn CUDA ``ops.layer_norm`` fast path
(reference: mantis/models/mfuyu/modeling_persimmon.py:50-51 uses it
when installed).  Backward is plain-jnp (cheap closed form), attached
via custom_vjp so the op is trainable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


from mantis_tpu.ops.flash_attention import (  # noqa: E402
    _interpret_default,
)


def _ln_kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    y = xc * inv * scale_ref[...].astype(jnp.float32) \
        + bias_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


def _ln_forward(x, scale, bias, eps, block_rows, interpret):
    orig_shape = x.shape
    d = x.shape[-1]
    rows = x.size // d
    x2 = x.reshape(rows, d)
    pad = (-rows) % block_rows
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    grid = (x2.shape[0] // block_rows,)
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, d), lambda i: (i, 0)),
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((d,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((block_rows, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        interpret=interpret,
    )(x2, scale, bias)
    if pad:
        out = out[:rows]
    return out.reshape(orig_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_layer_norm(x, scale, bias, eps=1e-6, block_rows=512,
                     interpret=None):
    if interpret is None:
        interpret = _interpret_default()
    return _ln_forward(x, scale, bias, eps, block_rows, interpret)


def _fwd(x, scale, bias, eps, block_rows, interpret):
    if interpret is None:
        interpret = _interpret_default()
    return _ln_forward(x, scale, bias, eps, block_rows, interpret), \
        (x, scale)


def _bwd(eps, block_rows, interpret, res, g):
    x, scale = res
    xf = x.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = xc * inv
    gs = gf * scale.astype(jnp.float32)
    d = x.shape[-1]
    dx = inv * (gs - jnp.mean(gs, axis=-1, keepdims=True)
                - xhat * jnp.mean(gs * xhat, axis=-1, keepdims=True))
    red = tuple(range(x.ndim - 1))
    dscale = jnp.sum(gf * xhat, axis=red).astype(scale.dtype)
    dbias = jnp.sum(gf, axis=red).astype(scale.dtype)
    return dx.astype(x.dtype), dscale, dbias


fused_layer_norm.defvjp(_fwd, _bwd)
