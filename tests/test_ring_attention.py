"""Ring attention parity vs single-device attention on a virtual mesh.

This is the TPU-native version of the reference's inline
``debug_ring_attention`` parity harness
(reference: modeling_internlm2.py:2545-2656)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mantis_tpu.ops.flash_attention import mha_reference
from mantis_tpu.ops.ring_attention import (
    make_context_attention,
    zigzag_inverse,
    zigzag_reorder,
)
from mantis_tpu.parallel.mesh import create_mesh

W = 4
C = 128  # chunk size (kernel block)
S = 2 * W * C  # 1024


def _data(key, b=1, h=2, d=64, packed=False):
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (b, S, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, S, h, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, S, h, d), jnp.float32)
    if packed:
        # two packed segments of 512 + no padding
        seg = jnp.concatenate([
            jnp.full((b, S // 2), 1, jnp.int32),
            jnp.full((b, S // 2), 2, jnp.int32)], axis=1)
    else:
        seg = jnp.ones((b, S), jnp.int32)
    return q, k, v, seg


def test_zigzag_reorder_roundtrip():
    x = jnp.arange(S)[None, :]
    z = zigzag_reorder(x, W)
    back = zigzag_inverse(z, W)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
    # device 0 shard is chunks (0, 2W-1)
    shard0 = np.asarray(z)[0, :2 * C]
    assert shard0[0] == 0 and shard0[C] == (2 * W - 1) * C


@pytest.mark.parametrize("packed", [False, True])
def test_ring_forward_matches_full(packed):
    mesh = create_mesh(data=2, context=W)
    q, k, v, seg = _data(jax.random.PRNGKey(0), packed=packed)
    ref = mha_reference(q, k, v, causal=True, segment_ids=seg)

    attn = make_context_attention(mesh, "context", batch_axes=())
    scale = q.shape[-1] ** -0.5
    qz = zigzag_reorder(q, W)
    kz = zigzag_reorder(k, W)
    vz = zigzag_reorder(v, W)
    segz = zigzag_reorder(seg, W)
    spec = NamedSharding(mesh, P(None, "context", None, None))
    qz = jax.device_put(qz, spec)
    kz = jax.device_put(kz, spec)
    vz = jax.device_put(vz, spec)
    segz = jax.device_put(segz, NamedSharding(mesh, P(None, "context")))

    out_z = attn(qz, kz, vz, segz, scale)
    out = zigzag_inverse(out_z, W)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_ring_backward_matches_full():
    mesh = create_mesh(data=2, context=W)
    q, k, v, seg = _data(jax.random.PRNGKey(1))
    scale = q.shape[-1] ** -0.5
    attn = make_context_attention(mesh, "context", batch_axes=())
    segz = zigzag_reorder(seg, W)

    def ring_loss(q, k, v):
        out = attn(zigzag_reorder(q, W), zigzag_reorder(k, W),
                   zigzag_reorder(v, W), segz, scale)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def ref_loss(q, k, v):
        out = mha_reference(q, k, v, causal=True, segment_ids=seg)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g_ring = jax.grad(ring_loss, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4,
                                   err_msg=f"d{name}")


def test_ring_cross_attention_matches_full():
    from jax.sharding import PartitionSpec
    from jax import shard_map
    from mantis_tpu.ops.ring_attention import ring_cross_attention

    mesh = create_mesh(data=2, context=W)
    key = jax.random.PRNGKey(2)
    b, h, d = 1, 2, 64
    sq, skv = S, S
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (b, sq, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, skv, h, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, skv, h, d), jnp.float32)
    qseg = jnp.ones((b, sq), jnp.int32)
    kseg = jnp.ones((b, skv), jnp.int32)
    scale = d ** -0.5

    ref = mha_reference(q, k, v, causal=False, segment_ids=qseg,
                        kv_segment_ids=kseg)

    spec = PartitionSpec(None, "context", None, None)
    sspec = PartitionSpec(None, "context")

    def local(qq, kk, vv, qs, ks_):
        return ring_cross_attention(qq, kk, vv, qs, ks_, "context",
                                    scale)

    out = shard_map(
        local, mesh=mesh,
        in_specs=(spec, spec, spec, sspec, sspec),
        out_specs=spec, check_vma=False,
    )(q, k, v, qseg, kseg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)
