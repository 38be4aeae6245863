"""End-to-end context-parallel training parity: a CP train step on a
(data=2, context=4) mesh must match the single-device step (same batch)
— the framework-level version of the reference's debug_ring_attention
check (reference: modeling_internlm2.py:2545-2656)."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mantis_tpu.models.configs import LlamaConfig, LlavaConfig, VisionConfig
from mantis_tpu.models.mllava import model as mllava_model
from mantis_tpu.ops.ring_attention import make_context_attention
from mantis_tpu.parallel.mesh import create_mesh
from mantis_tpu.train import data as D
from mantis_tpu.train import trainer as T

W = 4
S = 1024  # 2 * W * 128


def tiny_cfg():
    return LlavaConfig(
        vision_config=VisionConfig(
            tower_type="clip", hidden_size=32, intermediate_size=64,
            num_hidden_layers=1, num_attention_heads=2, image_size=28,
            patch_size=14),
        text_config=LlamaConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, rope_theta=10000.0),
        image_token_index=127,
    )


def make_examples(n=2, lens=(700, 500)):
    rng = np.random.RandomState(0)
    out = []
    for i in range(n):
        L = lens[i % len(lens)]
        ids = rng.randint(2, 120, size=L)
        labels = ids.copy()
        labels[:L // 3] = -100
        out.append({"input_ids": ids.astype(np.int64),
                    "labels": labels.astype(np.int64)})
    return out


def test_cp_train_step_matches_single_device():
    cfg = tiny_cfg()
    params = mllava_model.init_params(cfg, jax.random.PRNGKey(0))
    tcfg = T.TrainConfig(learning_rate=1e-3, lr_schedule="constant",
                         max_steps=5, compute_dtype="float32",
                         use_remat=False)
    pred = lambda p: T.default_trainable_pred(p)  # noqa: E731
    examples = make_examples()

    base_coll = dict(pad_token_id=0, image_token_id=127,
                     num_image_tokens=4, seq_buckets=(S,),
                     image_buckets=(0,), image_size=28)
    batch_plain = D.Collator(**base_coll)(examples)
    batch_cp = D.Collator(**base_coll, context_parallel_size=W)(examples)

    copy = lambda t: jax.tree.map(  # noqa: E731
        lambda x: jnp.array(x, copy=True), t)

    # single device
    trainable, frozen = T.partition_params(params, pred)
    opt, _ = T.make_optimizer(tcfg)
    step1 = T.make_train_step(mllava_model.forward, cfg, tcfg, opt,
                              copy(frozen))
    s1 = T.create_train_state(copy(trainable), opt)
    s1, m1 = step1(s1, {k: jnp.asarray(v) for k, v in batch_plain.items()})

    # CP mesh
    mesh = create_mesh(data=2, context=W)
    ctx_attn = make_context_attention(mesh, "context")
    sh_train = jax.device_put(
        trainable, NamedSharding(mesh, P()))
    sh_frozen = jax.device_put(frozen, NamedSharding(mesh, P()))
    stepc = T.make_train_step(
        mllava_model.forward, cfg, tcfg, opt, sh_frozen,
        context_attention=ctx_attn, labels_preshifted=True)
    sc = T.create_train_state(sh_train, opt)
    bspec = NamedSharding(mesh, P("data", "context"))
    batch_dev = {k: jax.device_put(jnp.asarray(v), bspec)
                 for k, v in batch_cp.items()}
    sc, mc = stepc(sc, batch_dev)

    assert abs(float(m1["loss"]) - float(mc["loss"])) < 2e-4, (
        float(m1["loss"]), float(mc["loss"]))
    # updated params agree
    for a, b in zip(jax.tree.leaves(s1.params),
                    jax.tree.leaves(sc.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-4)


def make_image_examples():
    """Conversations whose image-token blocks land in LATER zigzag chunks
    (W=4, S=1024 -> 8 chunks of 128): regression for the bug where
    merge_image_features cumsum ran over the reordered sequence and
    paired images with the wrong tokens."""
    rng = np.random.RandomState(1)
    out = []
    specs = [(700, (300, 650)), (500, (450,))]
    for L, img_offsets in specs:
        ids = rng.randint(2, 120, size=L).astype(np.int64)
        for off in img_offsets:
            ids[off:off + 4] = 127  # one pre-expanded image block each
        labels = ids.copy()
        labels[:L // 3] = -100
        labels[ids == 127] = -100
        pix = rng.randn(len(img_offsets), 3, 28, 28).astype(np.float32)
        out.append({"input_ids": ids, "labels": labels.astype(np.int64),
                    "pixel_values": pix})
    return out


def test_cp_train_step_with_images_in_later_chunks():
    cfg = tiny_cfg()
    params = mllava_model.init_params(cfg, jax.random.PRNGKey(3))
    tcfg = T.TrainConfig(learning_rate=1e-3, lr_schedule="constant",
                         max_steps=5, compute_dtype="float32",
                         use_remat=False, freeze_vision=True)
    pred = lambda p: T.default_trainable_pred(p)  # noqa: E731
    examples = make_image_examples()

    base_coll = dict(pad_token_id=0, image_token_id=127,
                     num_image_tokens=4, seq_buckets=(S,),
                     image_buckets=(3,), image_size=28)
    batch_plain = D.Collator(**base_coll)(examples)
    batch_cp = D.Collator(**base_coll, context_parallel_size=W)(examples)
    assert "image_feature_idx" in batch_cp

    copy = lambda t: jax.tree.map(  # noqa: E731
        lambda x: jnp.array(x, copy=True), t)

    trainable, frozen = T.partition_params(params, pred)
    opt, _ = T.make_optimizer(tcfg)
    step1 = T.make_train_step(mllava_model.forward, cfg, tcfg, opt,
                              copy(frozen))
    s1 = T.create_train_state(copy(trainable), opt)
    s1, m1 = step1(s1, {k: jnp.asarray(v) for k, v in batch_plain.items()})

    mesh = create_mesh(data=2, context=W)
    ctx_attn = make_context_attention(mesh, "context")
    sh_train = jax.device_put(trainable, NamedSharding(mesh, P()))
    sh_frozen = jax.device_put(frozen, NamedSharding(mesh, P()))
    stepc = T.make_train_step(
        mllava_model.forward, cfg, tcfg, opt, sh_frozen,
        context_attention=ctx_attn, labels_preshifted=True)
    sc = T.create_train_state(sh_train, opt)
    bspec = NamedSharding(mesh, P("data", "context"))
    rspec = NamedSharding(mesh, P())
    batch_dev = {
        k: jax.device_put(jnp.asarray(v),
                          rspec if k == "pixel_values" else bspec)
        for k, v in batch_cp.items()}
    sc, mc = stepc(sc, batch_dev)

    assert abs(float(m1["loss"]) - float(mc["loss"])) < 2e-4, (
        float(m1["loss"]), float(mc["loss"]))
    for a, b in zip(jax.tree.leaves(s1.params),
                    jax.tree.leaves(sc.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-4)


def test_cp_train_step_with_ring_vision_dp():
    """Vision-encoder DP inside the ring group (reference:
    modeling_internvl_chat.py:200-228 + GatherLayer): sharding the image
    batch over the context axis must not change the train step."""
    cfg = tiny_cfg()
    params = mllava_model.init_params(cfg, jax.random.PRNGKey(5))
    tcfg = T.TrainConfig(learning_rate=1e-3, lr_schedule="constant",
                         max_steps=5, compute_dtype="float32",
                         use_remat=False)
    pred = lambda p: T.default_trainable_pred(p)  # noqa: E731
    examples = make_image_examples()

    base_coll = dict(pad_token_id=0, image_token_id=127,
                     num_image_tokens=4, seq_buckets=(S,),
                     image_buckets=(4,), image_size=28)
    batch_plain = D.Collator(**base_coll)(examples)
    batch_cp = D.Collator(**base_coll, context_parallel_size=W)(examples)
    assert batch_cp["pixel_values"].shape[0] == 4  # divisible by W

    copy = lambda t: jax.tree.map(  # noqa: E731
        lambda x: jnp.array(x, copy=True), t)
    trainable, frozen = T.partition_params(params, pred)
    opt, _ = T.make_optimizer(tcfg)
    step1 = T.make_train_step(mllava_model.forward, cfg, tcfg, opt,
                              copy(frozen))
    s1 = T.create_train_state(copy(trainable), opt)
    s1, m1 = step1(s1, {k: jnp.asarray(v) for k, v in batch_plain.items()})

    mesh = create_mesh(data=2, context=W)
    ctx_attn = make_context_attention(mesh, "context")
    sh_train = jax.device_put(trainable, NamedSharding(mesh, P()))
    sh_frozen = jax.device_put(frozen, NamedSharding(mesh, P()))
    stepc = T.make_train_step(
        mllava_model.forward, cfg, tcfg, opt, sh_frozen,
        context_attention=ctx_attn, labels_preshifted=True,
        vision_dp_mesh=mesh)
    sc = T.create_train_state(sh_train, opt)
    bspec = NamedSharding(mesh, P("data", "context"))
    pspec = NamedSharding(mesh, P("context"))
    batch_dev = {
        k: jax.device_put(jnp.asarray(v),
                          pspec if k == "pixel_values" else bspec)
        for k, v in batch_cp.items()}
    sc, mc = stepc(sc, batch_dev)

    assert abs(float(m1["loss"]) - float(mc["loss"])) < 2e-4, (
        float(m1["loss"]), float(mc["loss"]))
    for a, b in zip(jax.tree.leaves(s1.params),
                    jax.tree.leaves(sc.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-4)
