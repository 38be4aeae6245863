"""GPipe-style pipeline parallelism over a ``pipe`` mesh axis.

The reference has NO pipeline parallelism (SURVEY §2.5: "TP / PP / EP /
Ulysses — absent"); this is a TPU-native extension of the parallelism
surface, built the idiomatic way rather than with process groups:

- the decoder's **stacked layer params** (leading ``L`` axis,
  models/llama.py init_params) shard on that axis over ``pipe`` — each
  device owns a contiguous block of ``L/S`` layers, which is also the
  natural ZeRO-free way to shard optimizer state for very deep models;
- activations rotate stage-to-stage with ``lax.ppermute`` inside
  ``shard_map`` — the collective rides ICI, no send/recv plumbing;
- ``M`` microbatches fill the pipeline (classic GPipe schedule:
  ``M + S - 1`` rotation steps, bubble fraction ``(S-1)/(M+S-1)``);
- ``jax.grad`` differentiates straight through the rotation
  (``ppermute`` transposes to the reverse permutation), so the backward
  pipeline falls out of autodiff instead of a hand-written schedule.

Embedding, final norm, and the LM head run OUTSIDE the shard_map under
plain GSPMD (they are replicated over ``pipe``; the batch axis shards
over ``data``), so the pipeline composes with the data-parallel loss /
optimizer machinery unchanged (train/trainer.py).

Semantics are pinned to the dense decoder: the stage body is
``models/llama.decoder_block`` — the same function ``llama.forward``
scans — so the pipelined forward is bit-for-bit the same math, just
scheduled across devices (tests/test_pipeline.py asserts logits AND
gradient parity on an 8-device mesh).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from mantis_tpu.models.configs import LlamaConfig
from mantis_tpu.models import llama


PIPE_AXES = ("data", "pipe")


def create_pipeline_mesh(data: int = 1, pipe: int = -1,
                         devices: Optional[Sequence] = None) -> Mesh:
    """2-axis (data, pipe) mesh; pipe=-1 absorbs remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if pipe == -1:
        assert n % data == 0, (n, data)
        pipe = n // data
    assert data * pipe == n, f"mesh {data}x{pipe} != {n} devices"
    return Mesh(np.asarray(devices).reshape(data, pipe), PIPE_AXES)


def pipeline_param_shardings(params, mesh: Mesh):
    """NamedShardings for an LM param tree on a (data, pipe) mesh:
    stacked layer tensors shard their leading layer axis over ``pipe``;
    everything else (embed/norm/head) replicates."""

    def f(path, leaf):
        keys = [getattr(p, "key", None) for p in path]
        if "layers" in keys:
            return NamedSharding(mesh, P("pipe"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(f, params)


def _stage_fn(local_layers, h, seg, cos, sin, *, cfg, scale, attn_impl,
              use_remat):
    """Run this device's block of layers over one microbatch."""

    def lf(carry, lp):
        out = llama.decoder_block(
            carry, lp, cfg=cfg, cos=cos, sin=sin, segment_ids=seg,
            scale=scale, attn_impl=attn_impl)
        return out, None

    if use_remat:
        lf = jax.checkpoint(lf, prevent_cse=False)
    h, _ = jax.lax.scan(lf, h, local_layers)
    return h


def make_pipeline_forward(mesh: Mesh, cfg: LlamaConfig,
                          n_microbatches: int,
                          attn_impl: Optional[str] = None,
                          use_remat: bool = True):
    """Build ``fwd(params, input_ids, positions, segment_ids) -> logits``
    with the decoder stack pipelined over the mesh's ``pipe`` axis.

    Constraints (asserted): ``cfg.num_hidden_layers % pipe == 0``,
    batch % (n_microbatches * data) == 0, no M-RoPE (pipeline serves the
    flagship text stack; M-RoPE models decode through the engine path).
    """
    S = mesh.shape["pipe"]
    M = n_microbatches
    assert cfg.num_hidden_layers % S == 0, (
        f"layers {cfg.num_hidden_layers} not divisible by pipe={S}")
    assert cfg.mrope_section is None, "pipeline does not support M-RoPE"
    scale = cfg.head_dim_ ** -0.5
    stage = functools.partial(
        _stage_fn, cfg=cfg, scale=scale, attn_impl=attn_impl,
        use_remat=use_remat)

    def pipeline_body(layers, hm, segm, cosm, sinm):
        # layers: local [L/S, ...] block; hm/segm/cosm/sinm: [M, bm, ...]
        my_stage = jax.lax.axis_index("pipe")
        perm = [(i, (i + 1) % S) for i in range(S)]

        def step(carry, t):
            h_cur, outs = carry
            # stage 0 injects microbatch t; others take the rotated
            # activation from stage-1 (microbatch t - my_stage)
            inj = jnp.clip(t, 0, M - 1)
            mb = t - my_stage
            mb_idx = jnp.clip(mb, 0, M - 1)
            h_in = jnp.where(
                my_stage == 0,
                jax.lax.dynamic_index_in_dim(hm, inj, 0, keepdims=False),
                h_cur)
            seg = jax.lax.dynamic_index_in_dim(segm, mb_idx, 0, False)
            cos = jax.lax.dynamic_index_in_dim(cosm, mb_idx, 0, False)
            sin = jax.lax.dynamic_index_in_dim(sinm, mb_idx, 0, False)
            h_out = stage(layers, h_in, seg, cos, sin)
            # bubble steps (mb outside [0, M)) compute on clamped data;
            # their outputs are never written, so autodiff sends them
            # zero cotangents — no masking needed in the stage body
            write = ((my_stage == S - 1) & (mb >= 0) & (mb < M))
            upd = jax.lax.dynamic_update_index_in_dim(
                outs, h_out.astype(outs.dtype), mb_idx, 0)
            outs = jnp.where(write, upd, outs)
            h_next = jax.lax.ppermute(h_out, "pipe", perm)
            return (h_next, outs), None

        outs0 = jnp.zeros_like(hm)
        (_, outs), _ = jax.lax.scan(
            step, (jnp.zeros_like(hm[0]), outs0), jnp.arange(M + S - 1))
        # finished activations live only on the last stage; psum
        # broadcasts them (every other stage contributed zeros)
        return jax.lax.psum(outs, "pipe")

    sharded_body = shard_map(
        pipeline_body, mesh=mesh,
        in_specs=(P("pipe"), P(None, "data"), P(None, "data"),
                  P(None, "data"), P(None, "data")),
        out_specs=P(None, "data"),
        check_vma=False)

    def fwd(params, input_ids, positions=None, segment_ids=None):
        b, s = input_ids.shape
        assert b % M == 0, f"batch {b} not divisible by microbatches {M}"
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(s), (b, s))
        if segment_ids is None:
            segment_ids = jnp.ones((b, s), jnp.int32)
        h = params["embed_tokens"][input_ids]
        cos, sin = llama.rope_cos_sin(
            positions, cfg.head_dim_, cfg.rope_theta)
        bm = b // M

        def mb(x):
            return x.reshape((M, bm) + x.shape[1:])

        outs = sharded_body(params["layers"], mb(h), mb(segment_ids),
                            mb(cos), mb(sin))
        h = outs.reshape(b, s, -1)
        h = llama.rms_norm(h, params["norm"], cfg.rms_norm_eps)
        if cfg.tie_word_embeddings:
            return h @ params["embed_tokens"].T
        return llama._mm(h, params["lm_head"])

    return fwd
