"""HF-export round-trips for every exportable architecture
(VERDICT #6): export -> (a) our load_checkpoint reproduces the exact
param tree (every tensor, incl. vision/connector), and (b)
transformers.from_pretrained loads with no missing/unexpected keys and
matches our text-only logits."""

import numpy as np
import pytest
import torch
import transformers

import jax
import jax.numpy as jnp

from mantis_tpu.io.hf_export import save_checkpoint
from mantis_tpu.io.hf_loader import load_checkpoint
from mantis_tpu.train.archs import get_arch
from mantis_tpu.utils.debug_tokenizer import build_tokenizer_from_texts

ARCHS = ["mllava", "idefics2", "idefics3", "qwen2_vl", "mfuyu",
         "internvl", "videollava", "mllava_next"]

HF_CLASSES = {
    "mllava": "LlavaForConditionalGeneration",
    "idefics2": "Idefics2ForConditionalGeneration",
    "idefics3": "Idefics3ForConditionalGeneration",
    "qwen2_vl": "Qwen2VLForConditionalGeneration",
    "mfuyu": "FuyuForCausalLM",
    "internvl": "InternVLForConditionalGeneration",
    "videollava": "VideoLlavaForConditionalGeneration",
    "mllava_next": "LlavaNextForConditionalGeneration",
}


def build_tiny(arch):
    tok = build_tokenizer_from_texts(["hello world test a b c d e f"])
    spec = get_arch(arch)
    cfg = spec.debug_config(tok)
    params = spec.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    return cfg, params, tok, spec


def our_text_logits(arch, params, cfg, ids):
    spec = get_arch(arch)

    class _T:
        use_remat = False

    batch = {"input_ids": jnp.asarray(ids),
             "labels": jnp.asarray(np.full_like(ids, -100))}
    # reuse the arch loss adapters' forward imports via direct calls
    if arch == "mllava":
        from mantis_tpu.models.mllava import model as M
    elif arch == "idefics2":
        from mantis_tpu.models.idefics2 import model as M
    elif arch == "idefics3":
        from mantis_tpu.models.idefics3 import model as M
    elif arch == "qwen2_vl":
        from mantis_tpu.models.qwen2_vl import model as M
    elif arch == "mfuyu":
        from mantis_tpu.models.mfuyu import model as M
    elif arch == "videollava":
        from mantis_tpu.models.videollava import model as M
    elif arch == "mllava_next":
        from mantis_tpu.models.mllava_next import model as M
    else:
        from mantis_tpu.models.intern_vl import model as M
    logits, _, _ = M.forward(params, cfg, input_ids=jnp.asarray(ids))
    del batch, spec, _T
    return np.asarray(logits, np.float32)


@pytest.mark.parametrize("arch", ARCHS)
def test_export_roundtrip(arch, tmp_path):
    cfg, params, tok, spec = build_tiny(arch)
    out = str(tmp_path / arch)

    class _Shim:
        tokenizer = tok

    save_checkpoint(arch, params, cfg, out, processor=_Shim())

    # (a) exact param-tree round trip through our loader
    arch2, cfg2, params2 = load_checkpoint(out, dtype=jnp.float32)
    assert arch2 == arch
    flat1 = jax.tree_util.tree_flatten_with_path(params)[0]
    flat2 = dict(jax.tree_util.tree_flatten_with_path(params2)[0])
    # keys that only exist at runtime (none expected) would show here
    assert len(flat1) == len(flat2)
    for path, a in flat1:
        b = flat2[path]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6,
                                   err_msg=str(path))

    # (b) transformers loads it cleanly and matches text-only logits
    cls = getattr(transformers, HF_CLASSES[arch])
    hf, info = cls.from_pretrained(out, output_loading_info=True,
                                   torch_dtype=torch.float32)
    missing = [k for k in info["missing_keys"]
               if "rotary" not in k and "inv_freq" not in k]
    assert not missing, missing
    assert not info["unexpected_keys"], info["unexpected_keys"]
    hf = hf.eval()

    rng = np.random.RandomState(0)
    vocab = cfg.text_config.vocab_size
    ids = rng.randint(1, min(vocab, 60), size=(1, 24))
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids)).logits.numpy()
    ours = our_text_logits(arch, params, cfg, ids)
    rel = (np.abs(ours - ref).max() / (np.abs(ref).max() + 1e-9))
    assert rel < 2e-3, (arch, rel)


@pytest.mark.parametrize("arch", ARCHS)
def test_quantized_reload(arch, tmp_path):
    """load_checkpoint(quantize_bits=8) — the single-16GB-chip serving
    path for every family: LM linears come back as QuantTensors and
    text-only logits track the dense load within group-wise int8
    error."""
    from mantis_tpu.ops.quant import QuantTensor

    cfg, params, tok, spec = build_tiny(arch)
    out = str(tmp_path / arch)

    class _Shim:
        tokenizer = tok

    save_checkpoint(arch, params, cfg, out, processor=_Shim())
    arch2, cfg2, p_q = load_checkpoint(out, dtype=jnp.float32,
                                       quantize_bits=8)
    assert arch2 == arch
    lm = p_q["language_model"]
    assert isinstance(lm["layers"]["q_proj"], QuantTensor)
    assert not isinstance(lm["embed_tokens"], QuantTensor)

    rng = np.random.RandomState(1)
    ids = rng.randint(1, min(cfg.text_config.vocab_size, 60),
                      size=(1, 16))
    ref = our_text_logits(arch, params, cfg, ids)
    got = our_text_logits(arch, p_q, cfg2, ids)
    a = ref[0, -1].astype(np.float64)
    b = got[0, -1].astype(np.float64)
    cos = float(np.dot(a, b)
                / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    assert cos > 0.99, (arch, cos)
