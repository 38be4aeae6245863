"""Pipeline parallelism (parallel/pipeline.py): logits + gradient parity
vs the dense decoder on an 8-device virtual mesh.

The reference has no pipeline parallelism (SURVEY §2.5); the contract
here is purely internal: the pipelined schedule must be the SAME math
as ``llama.forward``'s layer scan, and gradients must flow correctly
through the ppermute rotation (the backward pipeline is autodiff'd,
not hand-written).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mantis_tpu.models import llama
from mantis_tpu.models.configs import LlamaConfig
from mantis_tpu.parallel import pipeline


CFG = LlamaConfig(
    vocab_size=512, hidden_size=64, intermediate_size=128,
    num_hidden_layers=8, num_attention_heads=4, num_key_value_heads=2,
    rope_theta=10000.0)


def _setup(b=8, s=32, seed=0):
    params = llama.init_params(CFG, jax.random.PRNGKey(seed))
    rng = np.random.RandomState(seed)
    ids = jnp.asarray(rng.randint(0, CFG.vocab_size, size=(b, s)))
    seg = np.ones((b, s), np.int32)
    seg[:, s - 4:] = 0  # padding tail exercises the segment mask
    labels = jnp.asarray(rng.randint(0, CFG.vocab_size, size=(b, s)))
    return params, ids, jnp.asarray(seg), labels


def _loss(logits, labels, seg):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], -1)[..., 0]
    mask = (seg != 0).astype(jnp.float32)
    return jnp.sum(nll * mask) / jnp.sum(mask)


@pytest.mark.parametrize("data,pipe,micro", [(1, 8, 4), (2, 4, 2)])
def test_pipeline_logits_match_dense(data, pipe, micro):
    params, ids, seg, _ = _setup()
    mesh = pipeline.create_pipeline_mesh(data=data, pipe=pipe)
    fwd = pipeline.make_pipeline_forward(
        mesh, CFG, n_microbatches=micro, attn_impl="xla",
        use_remat=False)
    with mesh:
        got = jax.jit(fwd)(params, ids, None, seg)
    want, _ = llama.forward(params, CFG, input_ids=ids,
                            segment_ids=seg, attn_impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_pipeline_grads_match_dense():
    params, ids, seg, labels = _setup()
    mesh = pipeline.create_pipeline_mesh(data=2, pipe=4)
    fwd = pipeline.make_pipeline_forward(
        mesh, CFG, n_microbatches=4, attn_impl="xla", use_remat=True)

    def pipe_loss(p):
        return _loss(fwd(p, ids, None, seg), labels, seg)

    def dense_loss(p):
        logits, _ = llama.forward(p, CFG, input_ids=ids,
                                  segment_ids=seg, attn_impl="xla")
        return _loss(logits, labels, seg)

    with mesh:
        lp, gp = jax.jit(jax.value_and_grad(pipe_loss))(params)
    ld, gd = jax.value_and_grad(dense_loss)(params)
    np.testing.assert_allclose(float(lp), float(ld), atol=1e-5, rtol=1e-5)
    flat_p = jax.tree_util.tree_leaves_with_path(gp)
    flat_d = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(gd)}
    for k, v in flat_p:
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat_d[jax.tree_util.keystr(k)]),
            atol=3e-5, rtol=3e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(k)}")


def test_pipeline_param_shardings_place_layers_on_pipe():
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    mesh = pipeline.create_pipeline_mesh(data=2, pipe=4)
    sh = pipeline.pipeline_param_shardings(params, mesh)
    assert sh["layers"]["q_proj"].spec == jax.sharding.PartitionSpec(
        "pipe")
    assert sh["embed_tokens"].spec == jax.sharding.PartitionSpec()
    # placing params with these shardings and running the pipeline
    # still reproduces dense logits (device placement is not cosmetic)
    placed = jax.device_put(params, sh)
    _, ids, seg, _ = _setup()
    fwd = pipeline.make_pipeline_forward(
        mesh, CFG, n_microbatches=4, attn_impl="xla", use_remat=False)
    with mesh:
        got = jax.jit(fwd)(placed, ids, None, seg)
    want, _ = llama.forward(params, CFG, input_ids=ids,
                            segment_ids=seg, attn_impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_pipeline_rejects_bad_configs():
    mesh = pipeline.create_pipeline_mesh(data=1, pipe=8)
    bad = LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=6, num_attention_heads=2,
        num_key_value_heads=2, rope_theta=10000.0)
    with pytest.raises(AssertionError):
        pipeline.make_pipeline_forward(mesh, bad, n_microbatches=2)
