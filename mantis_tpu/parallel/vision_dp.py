"""Vision-encoder data parallelism inside the ring/context group.

TPU-native equivalent of the reference's image chunking across ring
ranks with a differentiable all-gather (reference:
modeling_internvl_chat.py:200-228 ``extract_feature`` per rank +
``GatherLayer.apply``; GatherLayer modeling_internlm2.py:219-257):
the image batch is sharded over the ``context`` mesh axis inside
``shard_map``, each rank encodes its chunk, and ``jax.lax.all_gather``
reassembles the features — jax differentiates the collective, so
gradients flow to the vision tower exactly like the reference's
autograd GatherLayer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_context_vision_encoder(encode_fn, mesh: Mesh,
                                axis: str = "context"):
    """Wrap ``encode_fn(pixel_values) -> features`` so the image batch
    is processed data-parallel over ``axis``.

    pixel_values [N, ...] must have N divisible by the axis size (the
    data layer pads image counts to buckets); returns features in the
    original order, replicated across the axis (every ring rank holds
    all features, like the reference's all-gather).
    """
    n_ranks = mesh.shape[axis]

    def sharded(pix):
        feats = encode_fn(pix)           # [N/n_ranks, P, D] per rank
        # differentiable all-gather: [n_ranks, N/n_ranks, P, D]
        gathered = jax.lax.all_gather(feats, axis)
        return gathered.reshape(-1, *feats.shape[1:])

    fn = jax.shard_map(
        sharded, mesh=mesh,
        in_specs=P(axis),
        out_specs=P(),
        check_vma=False)

    @functools.wraps(encode_fn)
    def wrapper(pixel_values):
        n = pixel_values.shape[0]
        assert n % n_ranks == 0, (
            f"image count {n} not divisible by {axis} size {n_ranks}")
        return fn(pixel_values)

    return wrapper
