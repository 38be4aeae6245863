"""Idefics2 full-width, FULL-DEPTH logit parity vs HF torch (VERDICT
round-2 item 8).

Same protocol as scripts/parity_fullwidth.py (identical random weights
both sides, fp32, eager HF reference), at real Idefics2-8B widths —
and, unlike the mllava run, at the full 32-layer Mistral depth (the
125 GB host fits both fp32 towers, ~70 GB peak).

The run covers the three riskiest parity surfaces at once:
  - NaViT variable-aspect vision: two images with different true sizes
    padded into one canvas, driven through HF's pixel_attention_mask
    and our patch_mask/patch_position_ids grids;
  - the perceiver resampler (64 latents, depth 3, GQA);
  - Mistral sliding-window attention: the config sets
    sliding_window=512 with an LM sequence > 512, so the window mask is
    ACTIVE over real widths.

Writes a second entry into PARITY.md.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import torch
    import transformers

    import jax

    # fp32 parity at 8B widths runs on the host CPU (the 16 GB chip
    # cannot hold both fp32 towers; the env re-forces JAX_PLATFORMS so
    # it must be overridden after import)
    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from mantis_tpu.io.hf_loader import (
        TensorSource, idefics2_params_from_hf)
    from mantis_tpu.models.idefics2 import (
        Idefics2Config, build_patch_grid, forward)

    depth_lm, depth_vit = 32, 27
    window = 512
    hf_cfg = transformers.Idefics2Config(
        vision_config=dict(
            hidden_size=1152, intermediate_size=4304,
            num_hidden_layers=depth_vit, num_attention_heads=16,
            image_size=980, patch_size=14, layer_norm_eps=1e-6),
        perceiver_config=dict(
            resampler_n_latents=64, resampler_depth=3,
            resampler_n_heads=16, resampler_head_dim=96,
            num_key_value_heads=4),
        text_config=dict(
            model_type="mistral", vocab_size=32003, hidden_size=4096,
            intermediate_size=14336, num_hidden_layers=depth_lm,
            num_attention_heads=32, num_key_value_heads=8,
            rms_norm_eps=1e-5, rope_theta=10000.0,
            sliding_window=window, max_position_embeddings=32768),
        image_token_id=32001,
        attn_implementation="eager",
    )
    t0 = time.time()
    torch.manual_seed(7)
    hf = transformers.Idefics2ForConditionalGeneration(hf_cfg).eval()
    n_params = sum(p.numel() for p in hf.parameters())
    print(f"torch model built {time.time() - t0:.0f}s "
          f"({n_params / 1e9:.2f}B params)", flush=True)

    cfg = Idefics2Config.from_hf_config(hf_cfg)
    params = idefics2_params_from_hf(
        TensorSource.from_state_dict(hf.state_dict()), cfg,
        dtype=jnp.float32)
    print(f"jax params loaded {time.time() - t0:.0f}s", flush=True)

    # NaViT: two images with different TRUE sizes in one padded canvas
    rng = np.random.RandomState(7)
    ch, cw = 448, 448
    sizes = [(448, 336), (280, 448)]
    canvas = np.zeros((1, 2, 3, ch, cw), np.float32)
    pam = np.zeros((1, 2, ch, cw), bool)
    for i, (h, w) in enumerate(sizes):
        canvas[0, i, :, :h, :w] = rng.randn(3, h, w)
        pam[0, i, :h, :w] = True

    L = cfg.num_image_tokens  # 64 latents
    n_text = 560  # LM seq = 560 + 2*64 + misc > window 512 -> SWA active
    ids = np.concatenate([
        rng.randint(5, 31000, size=4),
        np.full(L, 32001), rng.randint(5, 31000, size=n_text // 2),
        np.full(L, 32001), rng.randint(5, 31000, size=n_text // 2),
    ])[None, :]
    print(f"LM seq {ids.shape[1]} (> window {window})", flush=True)

    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 pixel_values=torch.tensor(canvas),
                 pixel_attention_mask=torch.tensor(pam)).logits.numpy()
    print(f"torch forward done {time.time() - t0:.0f}s", flush=True)
    del hf  # free 33 GB before the jax forward

    # position-id buckets from the 980 config size; patch grid over
    # the ACTUAL 448 canvas (HF pads to the batch max, not config max)
    grid_cfg = type("C", (), {"image_size": 980, "patch_size": 14})
    masks, poss = [], []
    for h, w in sizes:
        m, p = build_patch_grid(h, w, grid_cfg, canvas_h=ch,
                                canvas_w=cw)
        masks.append(m)
        poss.append(p)
    ours, _, _ = forward(
        params, cfg, input_ids=jnp.asarray(ids),
        pixel_values=jnp.asarray(canvas.reshape(2, 3, ch, cw)),
        patch_mask=jnp.asarray(np.stack(masks)),
        patch_position_ids=jnp.asarray(np.stack(poss)),
        attn_impl="xla")
    ours = np.asarray(ours, np.float32)
    print(f"jax forward done {time.time() - t0:.0f}s", flush=True)

    rel = np.abs(ours - ref).max() / (np.abs(ref).max() + 1e-9)
    agree = float((ours.argmax(-1) == ref.argmax(-1)).mean())
    print(f"rel max err {rel:.2e}; argmax agreement {agree:.4f}",
          flush=True)

    entry = f"""
## Second entry: Idefics2 full-width, FULL 32-layer depth (round 3)

Same identical-random-weights fp32 protocol at real Idefics2-8B widths
({n_params / 1e9:.2f}B params, scripts/parity_idefics2_fullwidth.py),
covering the riskiest surfaces in one forward:

- NaViT variable-aspect: two images of true sizes {sizes} padded into
  one {ch}x{cw} canvas (HF pixel_attention_mask vs our
  patch_mask/patch_position_ids);
- perceiver resampler 64 latents x depth 3 (GQA 16/4);
- Mistral sliding-window attention ACTIVE: window {window} <
  LM seq {ids.shape[1]}; full 32-layer depth (no reduction).

Result: **relative max logit error {rel:.2e}** (target <=1e-3);
argmax agreement {agree:.4f}.
"""
    with open("PARITY.md", "a") as f:
        f.write(entry)
    print("appended to PARITY.md")


if __name__ == "__main__":
    main()
