"""Full-width logit-parity run vs HF torch (BASELINE 'logit parity
<=1e-3 vs HF on Mantis-8B').

Real Mantis-8B checkpoints are NOT available in this offline
environment (zero egress, no HF hub), so per the driver protocol this
substitutes a FULL-WIDTH random-weight parity run: the exact
Mantis-8B-SigLIP-LLaMA3 architecture widths (SigLIP-so400m 1152/4304
x27 layers, LLaMA 4096/14336, vocab 128258) at FULL 32-layer LM depth
(8.35B params; round 2 ran depth 8 on the 1-core host, round 3
verified the 125 GB host fits both fp32 models — same finding as the
idefics2 full-depth run).  Both sides load the SAME numpy weights.

Writes results to PARITY.md (first section; the idefics2 full-depth
entry appended by scripts/parity_idefics2_fullwidth.py is preserved).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    depth_lm = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    import torch
    import transformers

    import jax

    # full-depth fp32 (8.35B = 33 GB) exceeds the 16 GB TPU; run the
    # JAX side on the 125 GB host like the torch reference (the env
    # re-forces JAX_PLATFORMS so it must be overridden after import)
    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from mantis_tpu.io.hf_loader import TensorSource, llava_params_from_hf
    from mantis_tpu.models.configs import LlavaConfig
    from mantis_tpu.models.mllava import model as mllava_model

    depth_vit = 27
    hf_cfg = transformers.LlavaConfig(
        vision_config=dict(
            model_type="siglip_vision_model", hidden_size=1152,
            intermediate_size=4304, num_hidden_layers=depth_vit,
            num_attention_heads=16, image_size=384, patch_size=14,
            layer_norm_eps=1e-6),
        text_config=dict(
            model_type="llama", vocab_size=128258, hidden_size=4096,
            intermediate_size=14336, num_hidden_layers=depth_lm,
            num_attention_heads=32, num_key_value_heads=8,
            rope_theta=500000.0, rms_norm_eps=1e-5,
            max_position_embeddings=8192, tie_word_embeddings=False),
        image_token_index=128256,
        vision_feature_layer=-2,
        vision_feature_select_strategy="full",
        projector_hidden_act="gelu",
    )
    t0 = time.time()
    torch.manual_seed(0)
    hf = transformers.LlavaForConditionalGeneration(hf_cfg).eval()
    nparams = sum(p.numel() for p in hf.parameters()) / 1e9
    print(f"torch model built {time.time() - t0:.0f}s "
          f"({nparams:.2f}B params)", flush=True)

    cfg = LlavaConfig.from_hf_config(hf_cfg.to_dict())
    params = llava_params_from_hf(
        TensorSource.from_state_dict(hf.state_dict()), cfg,
        dtype=jnp.float32)
    print(f"jax params loaded {time.time() - t0:.0f}s", flush=True)

    rng = np.random.RandomState(0)
    P = cfg.num_image_tokens
    ids = rng.randint(0, 120000, size=(1, 24 + 2 * P))
    ids[0, 2:2 + P] = cfg.image_token_index
    ids[0, 4 + P:4 + 2 * P] = cfg.image_token_index
    pix = rng.randn(2, 3, 384, 384).astype(np.float32)

    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 pixel_values=torch.tensor(pix)).logits.numpy()
    print(f"torch forward done {time.time() - t0:.0f}s", flush=True)

    ours, _, _ = mllava_model.forward(
        params, cfg, input_ids=jnp.asarray(ids),
        pixel_values=jnp.asarray(pix), attn_impl=None)
    ours = np.asarray(ours, np.float32)
    print(f"jax forward done {time.time() - t0:.0f}s", flush=True)

    rel = np.abs(ours - ref).max() / (np.abs(ref).max() + 1e-9)
    # argmax agreement over all positions
    agree = float((ours.argmax(-1) == ref.argmax(-1)).mean())
    print(f"rel max err {rel:.2e}; argmax agreement {agree:.4f}")

    first = f"""# Logit parity vs HF (full-width substitute run)

Real Mantis-8B checkpoints are unavailable in this offline environment
(zero egress / no HF hub access), so the BASELINE "logit parity <=1e-3
vs HF on Mantis-8B" check is substituted by a FULL-WIDTH random-weight
run per the driver protocol, with identical weights on both sides:

- architecture: Mantis-8B-SigLIP-LLaMA3 widths — SigLIP-so400m
  (1152/4304, 27 layers, 384px/14) + LLaMA (4096/14336, GQA 32/8,
  vocab 128258) at FULL LM depth {depth_lm} ({nparams:.2f}B params;
  round 2 ran depth 8, round 4 re-ran at full depth on the 125 GB
  host; see scripts/parity_fullwidth.py)
- input: 2 images ({P} patch tokens each) + text, seq {ids.shape[1]}
- HF reference: transformers.LlavaForConditionalGeneration (eager,
  float32, CPU); ours: mantis_tpu mllava forward (float32)

Result: **relative max logit error {rel:.2e}** (target <=1e-3);
argmax agreement over all positions: {agree:.4f}.

Tiny-model logit-parity tests for all other architectures run in CI
(tests/test_hf_parity.py, test_idefics2.py, test_idefics3.py,
test_qwen2_vl.py, test_mfuyu.py, test_internvl.py,
test_hf_export_multiarch.py).
"""
    try:
        with open("PARITY.md") as f:
            old = f.read()
        tail = old[old.index("## Second entry"):]
        first = first + "\n" + tail
    except (FileNotFoundError, ValueError):
        pass
    with open("PARITY.md", "w") as f:
        f.write(first)
    print("wrote PARITY.md")


if __name__ == "__main__":
    main()
