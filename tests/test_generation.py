"""Generation-loop parity: our jitted bucketed prefill+decode must emit
exactly the same greedy tokens as HF ``generate`` on a tiny Llava."""

import numpy as np
import torch
import transformers

import jax.numpy as jnp

from mantis_tpu.generation.sampler import GenerationConfig, generate
from mantis_tpu.io.hf_loader import TensorSource, llava_params_from_hf
from mantis_tpu.models.configs import LlavaConfig
from mantis_tpu.models.mllava import model as mllava_model


def _tiny_llava():
    vis = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=28, patch_size=14)
    txt = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        bos_token_id=1, eos_token_id=2, pad_token_id=0)
    hf_cfg = transformers.LlavaConfig(
        vision_config=vis, text_config=txt, image_token_index=127,
        vision_feature_layer=-2, vision_feature_select_strategy="default",
        attn_implementation="eager", pad_token_id=0)
    torch.manual_seed(11)
    hf = transformers.LlavaForConditionalGeneration(hf_cfg).eval()
    cfg = LlavaConfig.from_hf_config(hf_cfg)
    params = llava_params_from_hf(
        TensorSource.from_state_dict(hf.state_dict()), cfg)
    return hf, cfg, params


def test_greedy_generation_matches_hf():
    hf, cfg, params = _tiny_llava()
    P = cfg.num_image_tokens
    ids = np.array([[1, 5, 6] + [127] * P + [7, 8] + [127] * P + [9]])
    pix = np.random.RandomState(11).randn(2, 3, 28, 28).astype(np.float32)

    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.tensor(ids), pixel_values=torch.tensor(pix),
            max_new_tokens=12, do_sample=False, num_beams=1,
            pad_token_id=0)
    ref_new = ref[0, ids.shape[1]:].numpy()

    gen_cfg = GenerationConfig(max_new_tokens=12, do_sample=False,
                               eos_token_ids=(2,), pad_token_id=0)
    ours = generate(params, cfg, mllava_model.forward, ids, pix,
                    gen_cfg=gen_cfg, cache_dtype=jnp.float32)[0]

    # Compare up to (and including) the first EOS.
    n = len(ref_new)
    if 2 in ref_new.tolist():
        n = ref_new.tolist().index(2) + 1
    np.testing.assert_array_equal(ours[:n], ref_new[:n])


def test_batched_generation_with_uneven_lengths():
    hf, cfg, params = _tiny_llava()
    ids = np.array([
        [1, 5, 6, 7, 8, 9, 10, 11],
        [1, 5, 6, 7, 0, 0, 0, 0],  # right-padded shorter row
    ])
    mask = (ids != 0).astype(np.int64)
    mask[:, 0] = 1

    gen_cfg = GenerationConfig(max_new_tokens=8, do_sample=False,
                               eos_token_ids=(2,), pad_token_id=0)
    ours = generate(params, cfg, mllava_model.forward, ids, None, mask,
                    gen_cfg=gen_cfg, cache_dtype=jnp.float32)

    # Row-by-row must equal unbatched generation of the same prompt.
    for r, true_len in [(0, 8), (1, 4)]:
        solo = generate(params, cfg, mllava_model.forward,
                        ids[r:r + 1, :true_len], None, None,
                        gen_cfg=gen_cfg, cache_dtype=jnp.float32)[0]
        np.testing.assert_array_equal(ours[r], solo,
                                      err_msg=f"row {r}")


def test_sampling_shapes_and_determinism():
    import jax

    hf, cfg, params = _tiny_llava()
    ids = np.array([[1, 5, 6, 7]])
    gen_cfg = GenerationConfig(max_new_tokens=6, do_sample=True,
                               temperature=0.8, top_p=0.9, top_k=20,
                               eos_token_ids=(2,), pad_token_id=0)
    a = generate(params, cfg, mllava_model.forward, ids, None, None,
                 gen_cfg=gen_cfg, rng=jax.random.PRNGKey(3),
                 cache_dtype=jnp.float32)
    b = generate(params, cfg, mllava_model.forward, ids, None, None,
                 gen_cfg=gen_cfg, rng=jax.random.PRNGKey(3),
                 cache_dtype=jnp.float32)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (1, 6)


def test_streaming_matches_batch_greedy():
    from mantis_tpu.generation.sampler import generate_stream

    hf, cfg, params = _tiny_llava()
    ids = np.array([[1, 5, 6, 7, 8]])
    gen_cfg = GenerationConfig(max_new_tokens=10, do_sample=False,
                               eos_token_ids=(2,), pad_token_id=0)
    batch_out = generate(params, cfg, mllava_model.forward, ids, None,
                         None, gen_cfg, cache_dtype=jnp.float32)[0]
    stream_out = list(generate_stream(
        params, cfg, mllava_model.forward, ids, None, None, gen_cfg,
        cache_dtype=jnp.float32))
    # batch output is pad-filled after EOS; streaming stops at EOS
    n = len(stream_out)
    np.testing.assert_array_equal(np.asarray(stream_out),
                                  batch_out[:n])
    rest = batch_out[n:]
    assert all(t in (0, 2) for t in rest.tolist())


def test_tensor_parallel_generation_matches_single_device():
    """Distributed serving: the whole jitted prefill+decode loop runs
    with TP/DP-sharded params (megatron PartitionSpec rules) on a
    (data=2, tensor=4) mesh and emits exactly the single-device greedy
    tokens — GSPMD propagates the shardings through the KV cache and
    the while_loop, so scale-out serving needs no sampler changes."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mantis_tpu.parallel.mesh import create_mesh
    from mantis_tpu.parallel.sharding import shard_params

    hf, cfg, params = _tiny_llava()
    Pn = cfg.num_image_tokens
    ids = np.array(
        [[1, 5, 6] + [127] * Pn + [7, 8, 9],
         [1, 9, 8] + [127] * Pn + [6, 5, 4]])
    pix = np.random.RandomState(3).randn(2, 3, 28, 28).astype(np.float32)
    gen_cfg = GenerationConfig(max_new_tokens=8, do_sample=False,
                               eos_token_ids=(2,), pad_token_id=0)

    ref = generate(params, cfg, mllava_model.forward, ids, pix,
                   gen_cfg=gen_cfg, cache_dtype=jnp.float32)

    mesh = create_mesh(data=2, tensor=4)
    sharded = shard_params(params, mesh)
    out = generate(sharded, cfg, mllava_model.forward, ids, pix,
                   gen_cfg=gen_cfg, cache_dtype=jnp.float32)
    np.testing.assert_array_equal(out, ref)
