"""Chunked cross-entropy: never materializes the full logits tensor.

The liger-kernel fused-CE equivalent (reference uses it via HF
``--use_liger_kernel``, scripts/train_qwen2_vl.sh:50): at flagship
scale the logits are [B, 8192, 128258] f32 = 8.4 GB — more than half a
v5e's HBM just for one activation.  Here the sequence is scanned in
chunks: each chunk projects through the LM head, takes its CE partial
sums, and is rematerialized in the backward pass (jax.checkpoint), so
peak memory holds one [B, chunk, V] block instead of the full tensor.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def chunked_cross_entropy(
    hidden: jax.Array,         # [B, S, D] final hidden states
    lm_head: jax.Array,        # [D, V]
    labels: jax.Array,         # [B, S] (ALREADY shifted/aligned)
    valid: Optional[jax.Array] = None,   # [B, S] bool
    chunk_size: int = 1024,
) -> jax.Array:
    """Mean NLL over valid positions, O(B * chunk * V) live memory."""
    b, s, d = hidden.shape
    if valid is None:
        valid = labels != -100
    pad = (-s) % chunk_size
    if pad:
        hidden = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0)))
        labels = jnp.pad(labels, ((0, 0), (0, pad)))
        valid = jnp.pad(valid, ((0, 0), (0, pad)))
    n_chunks = hidden.shape[1] // chunk_size
    hc = hidden.reshape(b, n_chunks, chunk_size, d).transpose(1, 0, 2, 3)
    lc = labels.reshape(b, n_chunks, chunk_size).transpose(1, 0, 2)
    vc = valid.reshape(b, n_chunks, chunk_size).transpose(1, 0, 2)

    @jax.checkpoint
    def one_chunk(h, lab, val):
        logits = (h @ lm_head.astype(h.dtype)).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        safe = jnp.where(val, lab, 0)
        tok = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        return (jnp.sum(jnp.where(val, -tok, 0.0)),
                jnp.sum(val.astype(jnp.float32)))

    def body(carry, xs):
        nll, cnt = carry
        h, lab, val = xs
        dn, dc = one_chunk(h, lab, val)
        return (nll + dn, cnt + dc), None

    (nll, cnt), _ = jax.lax.scan(
        body, (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)),
        (hc, lc, vc))
    return nll / jnp.maximum(cnt, 1.0)
