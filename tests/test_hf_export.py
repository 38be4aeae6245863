"""HF export round-trip: our params -> HF checkpoint dir ->
transformers.from_pretrained logits match; our loader also reads it."""

import numpy as np
import torch
import transformers

import jax
import jax.numpy as jnp

from mantis_tpu.io.hf_export import save_llava
from mantis_tpu.io.hf_loader import load_llava
from mantis_tpu.models.configs import LlamaConfig, LlavaConfig, VisionConfig
from mantis_tpu.models.mllava import model as mllava_model


def test_export_roundtrip_via_transformers(tmp_path):
    cfg = LlavaConfig(
        vision_config=VisionConfig(
            tower_type="clip", hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=2, image_size=28,
            patch_size=14, layer_norm_eps=1e-5),
        text_config=LlamaConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, rope_theta=10000.0,
            max_position_embeddings=256),
        image_token_index=127, pad_token_id=0,
    )
    params = mllava_model.init_params(cfg, jax.random.PRNGKey(5))
    out_dir = str(tmp_path / "ckpt")
    save_llava(params, cfg, out_dir)

    hf = transformers.LlavaForConditionalGeneration.from_pretrained(
        out_dir, attn_implementation="eager").eval()
    P = cfg.num_image_tokens
    ids = np.array([[5, 6] + [127] * P + [7, 8, 9]])
    pix = np.random.RandomState(5).randn(1, 3, 28, 28).astype(np.float32)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 pixel_values=torch.tensor(pix)).logits.numpy()
    ours, _, _ = mllava_model.forward(
        params, cfg, input_ids=jnp.asarray(ids),
        pixel_values=jnp.asarray(pix), attn_impl="xla")
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-4, rtol=2e-3)

    # our own loader reads the exported dir
    cfg2, params2 = load_llava(out_dir, dtype=jnp.float32)
    ours2, _, _ = mllava_model.forward(
        params2, cfg2, input_ids=jnp.asarray(ids),
        pixel_values=jnp.asarray(pix), attn_impl="xla")
    np.testing.assert_allclose(np.asarray(ours2), np.asarray(ours),
                               atol=1e-5)


def test_quantized_load_serving_path(tmp_path):
    """On-load int8 quantization (the single-chip serving path): LM
    linears + head come back as QuantTensors, logits track the f32
    load within group-wise int8 error, and the full
    from_pretrained(quantize=) -> adapter -> engine chain generates."""
    from mantis_tpu.models.mllava.chat import MantisLlava
    from mantis_tpu.ops.quant import QuantTensor
    from mantis_tpu.utils.debug_tokenizer import build_tokenizer_from_texts

    tok = build_tokenizer_from_texts(
        ["hello describe the image USER ASSISTANT one two three"])
    cfg = LlavaConfig(
        vision_config=VisionConfig(
            tower_type="clip", hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=2, image_size=28,
            patch_size=14, layer_norm_eps=1e-5),
        text_config=LlamaConfig(
            vocab_size=max(len(tok.get_vocab()) + 4, 64), hidden_size=64,
            intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            rope_theta=10000.0),
        image_token_index=tok.convert_tokens_to_ids("<image>"),
        pad_token_id=0,
    )
    params = mllava_model.init_params(cfg, jax.random.PRNGKey(3))
    out_dir = str(tmp_path / "ckpt")

    class Shim:
        tokenizer = tok

    save_llava(params, cfg, out_dir, processor=Shim())

    cfg_f, p_f = load_llava(out_dir, dtype=jnp.float32)
    cfg_q, p_q = load_llava(out_dir, dtype=jnp.float32, quantize_bits=8)
    lm_q = p_q["language_model"]
    assert isinstance(lm_q["layers"]["q_proj"], QuantTensor)
    assert isinstance(lm_q["layers"]["down_proj"], QuantTensor)
    assert isinstance(lm_q["lm_head"], QuantTensor)
    # embeddings/norms/vision stay dense
    assert not isinstance(lm_q["embed_tokens"], QuantTensor)
    assert not isinstance(
        p_q["vision_tower"]["layers"]["q"], QuantTensor)

    ids = np.array([[5, 6, 7, 8, 9, 10]])
    ref, _, _ = mllava_model.forward(
        p_f, cfg_f, input_ids=jnp.asarray(ids), attn_impl="xla")
    got, _, _ = mllava_model.forward(
        p_q, cfg_q, input_ids=jnp.asarray(ids), attn_impl="xla")
    ref_l = np.asarray(ref[0, -1], np.float64)
    got_l = np.asarray(got[0, -1], np.float64)
    cos = float(np.dot(ref_l, got_l)
                / (np.linalg.norm(ref_l) * np.linalg.norm(got_l)))
    assert cos > 0.995, cos   # group-wise int8 weight error only

    model = MantisLlava.from_pretrained(out_dir, quantize="int8")
    assert model.cache_dtype == jnp.int8
    from mantis_tpu.benchmark.adapters import MantisTPUAdapter
    from mantis_tpu.serving.engine import EngineAdapter

    adapter = MantisTPUAdapter("", max_new_tokens=4, model=model)
    reply = adapter([{"type": "text", "content": "hello"}])
    assert isinstance(reply, str)

    eng = EngineAdapter(model, max_new_tokens=4, max_slots=2,
                        slot_ctx=64, chunk_tokens=2,
                        prefill_buckets=(16, 32))
    reply_eng = eng([{"type": "text", "content": "hello"}])
    assert isinstance(reply_eng, str)
    eng.engine.shutdown()

    # int4: true packed storage (2 weights/byte) through the same path
    _, p4 = load_llava(out_dir, dtype=jnp.float32, quantize_bits=4)
    q4 = p4["language_model"]["layers"]["q_proj"]
    assert isinstance(q4, QuantTensor) and q4.bits == 4
    # packed axis is half the group length
    assert q4.q.shape[-2] * 2 == (
        p_q["language_model"]["layers"]["q_proj"].q.shape[-2])
    got4, _, _ = mllava_model.forward(
        p4, cfg_q, input_ids=jnp.asarray(ids), attn_impl="xla")
    assert np.isfinite(np.asarray(got4)).all()
    got4_l = np.asarray(got4[0, -1], np.float64)
    cos4 = float(np.dot(ref_l, got4_l)
                 / (np.linalg.norm(ref_l) * np.linalg.norm(got4_l)))
    assert cos4 > 0.95, cos4   # 4-bit: looser but still aligned
